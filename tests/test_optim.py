"""Optimizer semantics vs torch (reference uses torch Adam / SGD+nesterov +
MultiStepLR, ad_trainer.py:380-384)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from eoe_tpu.training.optim import make_optimizer, multistep_lr, torch_adam, torch_sgd


def run_optax(tx, w0, grads):
    w = jnp.asarray(w0)
    state = tx.init(w)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, w)
        w = w + updates
    return np.asarray(w)


def run_torch(opt_cls, w0, grads, **kw):
    w = torch.tensor(np.asarray(w0), requires_grad=True)
    opt = opt_cls([w], **kw)
    for g in grads:
        opt.zero_grad()
        w.grad = torch.tensor(np.asarray(g))
        opt.step()
    return w.detach().numpy()


@pytest.fixture
def grads(rng):
    return [rng.normal(size=(5,)).astype(np.float32) for _ in range(7)]


def test_adam_matches_torch(grads, rng):
    w0 = rng.normal(size=(5,)).astype(np.float32)
    ours = run_optax(torch_adam(lambda s: 1e-2, weight_decay=0.0), w0, grads)
    ref = run_torch(torch.optim.Adam, w0, grads, lr=1e-2)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_adam_weight_decay_matches_torch(grads, rng):
    # torch Adam weight_decay is L2-added-to-grad BEFORE moments
    w0 = rng.normal(size=(5,)).astype(np.float32)
    ours = run_optax(torch_adam(lambda s: 1e-2, weight_decay=0.1), w0, grads)
    ref = run_torch(torch.optim.Adam, w0, grads, lr=1e-2, weight_decay=0.1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_sgd_nesterov_matches_torch(grads, rng):
    w0 = rng.normal(size=(5,)).astype(np.float32)
    ours = run_optax(torch_sgd(lambda s: 1e-2, weight_decay=1e-3), w0, grads)
    ref = run_torch(torch.optim.SGD, w0, grads, lr=1e-2, weight_decay=1e-3,
                    momentum=0.9, nesterov=True)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_multistep_lr_schedule():
    # milestones in EPOCHS, expressed per step (10 steps/epoch), gamma 0.1
    sched = multistep_lr(1.0, milestones=[2, 4], steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(19)) == pytest.approx(1.0)
    assert float(sched(20)) == pytest.approx(0.1)
    assert float(sched(39)) == pytest.approx(0.1)
    assert float(sched(40)) == pytest.approx(0.01)


def test_multistep_lr_matches_torch_over_training(rng):
    # full parity: optax chain with schedule vs torch Adam+MultiStepLR
    w0 = rng.normal(size=(4,)).astype(np.float32)
    grads = [rng.normal(size=(4,)).astype(np.float32) for _ in range(12)]
    steps_per_epoch = 3
    tx = make_optimizer("adam", 1e-2, 0.0, milestones=[2], steps_per_epoch=steps_per_epoch)
    ours = run_optax(tx, w0, grads)

    w = torch.tensor(np.asarray(w0), requires_grad=True)
    opt = torch.optim.Adam([w], lr=1e-2)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, [2], 0.1)
    for i, g in enumerate(grads):
        opt.zero_grad()
        w.grad = torch.tensor(np.asarray(g))
        opt.step()
        if (i + 1) % steps_per_epoch == 0:
            sched.step()
    np.testing.assert_allclose(ours, w.detach().numpy(), atol=1e-6)
