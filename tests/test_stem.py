"""Fused WRN stem (ops/stem.py): parity with the unfused flax path.

The grid-stats fused backward must be a drop-in: identical forward and
batch_stats, matching gradients, identical param tree, and an untouched
eval path. Reference stem being accelerated:
/root/reference/src/eoe/models/resnet.py:68-79.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eoe_tpu.models.resnet import WideResNet
from eoe_tpu.ops.stem import fused_stem_train


def _small_models():
    kw = dict(rep_dim=8, layers=(1, 1, 1, 1))
    return WideResNet(fused_stem=True, **kw), WideResNet(fused_stem=False, **kw)


def _grads(model, variables, x):
    def loss(params):
        vv = {"params": params, "batch_stats": variables["batch_stats"]}
        out, st = model.apply(vv, x, train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2), st

    (_, st), g = jax.value_and_grad(loss, has_aux=True)(variables["params"])
    return g, st


def test_fused_stem_param_tree_and_forward_identical():
    m_f, m_u = _small_models()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    v_f = m_f.init(jax.random.key(0), x, train=True)
    v_u = m_u.init(jax.random.key(0), x, train=True)
    assert (jax.tree_util.tree_structure(v_f)
            == jax.tree_util.tree_structure(v_u))
    for a, b in zip(jax.tree_util.tree_leaves(v_f),
                    jax.tree_util.tree_leaves(v_u)):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b)

    out_f, st_f = m_f.apply(v_f, x, train=True, mutable=["batch_stats"])
    out_u, st_u = m_u.apply(v_f, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_u))
    for a, b in zip(jax.tree_util.tree_leaves(st_f),
                    jax.tree_util.tree_leaves(st_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_stem_grads_match_autodiff():
    m_f, m_u = _small_models()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    v = m_f.init(jax.random.key(1), x, train=True)
    g_f, _ = _grads(m_f, v, x)
    g_u, _ = _grads(m_u, v, x)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g_f),
                               jax.tree_util.tree_leaves_with_path(g_u)):
        scale = max(float(jnp.abs(b).max()), 1e-8)
        err = float(jnp.abs(a - b).max()) / scale
        assert err < 1e-4, (jax.tree_util.keystr(pa), err)


def test_fused_stem_eval_path_unchanged():
    m_f, m_u = _small_models()
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    v = m_f.init(jax.random.key(2), x, train=True)
    np.testing.assert_array_equal(
        np.asarray(m_f.apply(v, x, train=False)),
        np.asarray(m_u.apply(v, x, train=False)))


def test_fused_stem_env_kill_switch(monkeypatch):
    monkeypatch.setenv("EOE_TPU_FUSED_STEM", "0")
    m_f, m_u = _small_models()
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    v = m_f.init(jax.random.key(3), x, train=True)
    out_f, _ = m_f.apply(v, x, train=True, mutable=["batch_stats"])
    out_u, _ = m_u.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_u))


def test_fused_stem_vmap_batching():
    """The seed-vmapped grid maps model.apply over stacked params."""
    m_f, m_u = _small_models()
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    vs = [m_f.init(jax.random.key(k), x, train=True) for k in (10, 11, 12)]
    stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *vs)

    def one(variables, model):
        g, st = _grads(model, variables, x)
        return g

    g_f = jax.vmap(lambda v: one(v, m_f))(stacked)
    g_u = jax.vmap(lambda v: one(v, m_u))(stacked)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g_f),
                               jax.tree_util.tree_leaves_with_path(g_u)):
        scale = max(float(jnp.abs(b).max()), 1e-8)
        err = float(jnp.abs(a - b).max()) / scale
        assert err < 1e-4, (jax.tree_util.keystr(pa), err)


def test_fused_stem_input_gradients_match_autodiff():
    """The dx contract: exact input cotangents (round-5 fix — the zero-dx
    formulation broke input-gradient parity vs the torch reference for any
    consumer differentiating through the stem)."""
    m_f, m_u = _small_models()
    x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    v = m_f.init(jax.random.key(7), x, train=True)

    def loss(model, xin):
        out, _ = model.apply(v, xin, train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    dx_f = jax.grad(lambda xin: loss(m_f, xin))(x)
    dx_u = jax.grad(lambda xin: loss(m_u, xin))(x)
    scale = max(float(jnp.abs(dx_u).max()), 1e-8)
    err = float(jnp.abs(dx_f - dx_u).max()) / scale
    assert err < 1e-4, err
    # the fused path must not silently zero elements autodiff keeps
    nz_u = np.asarray(dx_u) != 0
    assert np.count_nonzero(np.asarray(dx_f)[nz_u] == 0) == 0


def test_fused_stem_op_degenerate_all_negative():
    """All-dead stem (every pooled max <= 0): zero grads, like autodiff."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(scale=0.1, size=(7, 7, 3, 64)), jnp.float32)
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.full((64,), -100.0, jnp.float32)  # ReLU kills everything

    def loss(w, gamma, beta):
        out, mu, var = fused_stem_train(w, gamma, beta, x)
        return jnp.sum(out ** 2)

    dw, dg, db = jax.grad(loss, argnums=(0, 1, 2))(w, gamma, beta)
    assert float(jnp.abs(dw).max()) == 0.0
    assert float(jnp.abs(dg).max()) == 0.0
    assert float(jnp.abs(db).max()) == 0.0


def test_fused_stem_op_bf16():
    """bf16 compute path (the bench config) stays close to f32 autodiff."""
    rng = np.random.default_rng(6)
    x32 = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    w32 = rng.normal(scale=0.1, size=(7, 7, 3, 64)).astype(np.float32)
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)

    def loss_fused(w, gamma, beta, x):
        out, _, _ = fused_stem_train(w, gamma, beta, x)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(w, gamma, beta, x):
        from eoe_tpu.ops.stem import _conv7s2, _stats_bn_relu, _maxpool3s2
        y, _, _ = _stats_bn_relu(_conv7s2(x, w.astype(x.dtype)), gamma, beta)
        return jnp.sum(_maxpool3s2(y).astype(jnp.float32) ** 2)

    # both sides run the bf16 compute path: the check isolates the fused
    # algebra from bf16 quantization itself
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(w32), gamma, beta, jnp.asarray(x32, jnp.bfloat16))
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(
        jnp.asarray(w32), gamma, beta,
        jnp.asarray(x32, jnp.bfloat16))
    for a, b, tol in zip(g_fus, g_ref, (5e-2, 5e-2, 5e-2)):
        scale = max(float(jnp.abs(b).max()), 1e-8)
        err = float(jnp.abs(a.astype(jnp.float32) - b).max()) / scale
        assert err < tol, err
