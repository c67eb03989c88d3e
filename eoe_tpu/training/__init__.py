"""Trainer registry (parity: /root/reference/src/eoe/training/__init__.py:8-11).

The reference maps objective strings to ADTrainer subclasses; here all
feature-space objectives share one :class:`Trainer` parameterized by a pure
loss/score pair (eoe_tpu.ops.losses.OBJECTIVES), and CLIP gets a subclass that
handles the pretrained encoders and prompt-based metric preparation.
"""

from functools import partial

from eoe_tpu.training.trainer import NanGradientsError, Result, Trainer, TrainState  # noqa: F401


def _clip_trainer(*args, **kwargs):
    from eoe_tpu.training.clip import ClipTrainer
    return ClipTrainer(*args, **kwargs)


TRAINER = {
    "hsc": partial(Trainer, objective="hsc"),
    "bce": partial(Trainer, objective="bce"),
    "clip": _clip_trainer,
    "dsvdd": partial(Trainer, objective="dsvdd"),
    "dsad": partial(Trainer, objective="dsad"),
    "focal": partial(Trainer, objective="focal"),
    # the reference ships an AE trainer but leaves it unregistered
    # (training/ae.py); it is functional here, so it is registered
    "ae": partial(Trainer, objective="ae"),
}
