"""Model shape/behavior tests (reference: src/eoe/models/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eoe_tpu.models.ae import AE32
from eoe_tpu.models.cbam import CBAM
from eoe_tpu.models.cnn import CNN28, CNN32
from eoe_tpu.models.resnet import WideResNet


def init_and_apply(model, x, train=False):
    variables = model.init(jax.random.key(0), x, train=False)
    if train:
        return model.apply(variables, x, train=True, mutable=["batch_stats"])
    return model.apply(variables, x, train=False)


def test_cnn28_shapes():
    x = jnp.zeros((4, 28, 28, 1))
    out = init_and_apply(CNN28(), x)
    assert out.shape == (4, 32)
    out = init_and_apply(CNN28(clf=True), x)
    assert out.shape == (4, 1)


def test_cnn32_shapes():
    x = jnp.zeros((4, 32, 32, 3))
    out = init_and_apply(CNN32(), x)
    assert out.shape == (4, 256)
    out = init_and_apply(CNN32(clf=True), x)
    assert out.shape == (4, 1)


def test_cnn32_param_count_matches_reference():
    """Parameter count must match the torch CNN32 (models/cnn.py:44-86):
    convs 5x5 (3->32->64->128) + fc 2048->512 -> rep 256 (+BN affine)."""
    model = CNN32(bias=True)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    ref = ((5 * 5 * 3 * 32 + 32) + (5 * 5 * 32 * 64 + 64) + (5 * 5 * 64 * 128 + 128)
           + (2048 * 512 + 512) + (512 * 256 + 256)
           + 2 * (32 + 64 + 128 + 512))  # BN scale+bias
    assert n == ref


def test_batchnorm_updates_running_stats():
    model = CNN32()
    x = jnp.ones((8, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(after, before))


def test_wideresnet_shapes():
    x = jnp.zeros((2, 224, 224, 3))
    out = init_and_apply(WideResNet(rep_dim=256), x)
    assert out.shape == (2, 256)
    out = init_and_apply(WideResNet(clf=True), x)
    assert out.shape == (2, 1)


def test_cbam_preserves_shape():
    x = jnp.ones((2, 8, 8, 32))
    model = CBAM(32, 16)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == x.shape


def test_cbam_spatial_bn_zero_init():
    # zero-initialized SpatialGate BN scale -> sigmoid(0)=0.5 gate at init
    # (reference resnet.py:60-62)
    x = jnp.ones((2, 8, 8, 32))
    model = CBAM(32, 16)
    variables = model.init(jax.random.key(0), x, train=False)
    scale = variables["params"]["spatial_gate"]["spatial_bn"]["scale"]
    np.testing.assert_array_equal(np.asarray(scale), 0.0)


def test_ae32_reconstruction_shape():
    x = jnp.zeros((4, 32, 32, 3))
    out = init_and_apply(AE32(), x)
    assert out.shape == (4, 32, 32, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_models_jit_and_grad():
    model = CNN32(clf=False)
    x = jnp.ones((4, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=False)

    @jax.jit
    def loss_fn(params):
        feats, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                               x, train=True, mutable=["batch_stats"])
        return (feats ** 2).sum()

    g = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(p)).all() for p in jax.tree_util.tree_leaves(g))
