"""Optimizers + LR schedule matching the reference's torch semantics.

The reference uses Adam (amsgrad=False) for all models and SGD(momentum=0.9,
nesterov=True) for CLIP, each with MultiStepLR(gamma=0.1)
(ad_trainer.py:380-384). torch's `weight_decay` is L2-added-to-gradient
*before* the moment updates — optax.add_decayed_weights placed before the
scaling transform reproduces that exactly. torch SGD's momentum update also
differs from optax's trace (no (1-m) dampening, lr applied after momentum);
implemented explicitly below.
"""

from typing import Sequence

import optax


def multistep_lr(base_lr: float, milestones: Sequence[int], steps_per_epoch: int,
                 gamma: float = 0.1) -> optax.Schedule:
    """MultiStepLR over epochs, expressed per optimizer step."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}

    def schedule(step):
        return optax.piecewise_constant_schedule(base_lr, boundaries)(step)

    return schedule if milestones else (lambda step: base_lr)


def torch_adam(lr_schedule, weight_decay: float = 0.0,
               b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*parts)


def torch_sgd(lr_schedule, weight_decay: float = 0.0, momentum: float = 0.9,
              nesterov: bool = True) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    # torch: buf = m*buf + grad; update = grad + m*buf (nesterov) — optax trace
    # with accumulator_dtype None and no dampening matches torch exactly
    parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*parts)


def make_optimizer(kind: str, base_lr: float, weight_decay: float,
                   milestones: Sequence[int], steps_per_epoch: int) -> optax.GradientTransformation:
    sched = multistep_lr(base_lr, milestones, steps_per_epoch)
    if kind == "sgd":
        return torch_sgd(sched, weight_decay)
    return torch_adam(sched, weight_decay)
