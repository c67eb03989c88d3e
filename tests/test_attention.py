"""Pallas flash-attention kernel vs the jnp reference (interpret mode on CPU;
the same kernel compiles on TPU — verified on a real v5e chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eoe_tpu.models.clip.model import default_attention
from eoe_tpu.ops.attention import flash_attention


@pytest.mark.parametrize("shape", [(2, 4, 50, 64), (2, 2, 77, 32), (1, 1, 128, 64)])
def test_flash_matches_reference(rng, shape):
    q, k, v = (jnp.asarray(rng.normal(0, 1, shape), jnp.float32) for _ in range(3))
    ref = default_attention(q, k, v, None)
    out = flash_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_with_causal_mask(rng):
    n, h, s, d = 2, 2, 77, 32
    q, k, v = (jnp.asarray(rng.normal(0, 1, (n, h, s, d)), jnp.float32) for _ in range(3))
    mask = jnp.triu(jnp.full((s, s), -jnp.inf), k=1)
    ref = default_attention(q, k, v, mask)
    out = flash_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_gradients_match(rng):
    n, h, s, d = 1, 2, 50, 32
    q, k, v = (jnp.asarray(rng.normal(0, 1, (n, h, s, d)), jnp.float32) for _ in range(3))

    def loss(fn):
        return lambda q, k, v: (fn(q, k, v, None) ** 2).sum()

    g_ref = jax.grad(loss(default_attention), argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_clip_with_flash_attention(rng):
    """The CLIP model runs with the kernel plugged in and matches the default."""
    from eoe_tpu.models.clip import CLIP, ClipConfig
    cfg = ClipConfig(embed_dim=16, image_resolution=16, vision_layers=1, vision_width=32,
                     vision_patch_size=8, context_length=16, vocab_size=64,
                     transformer_width=32, transformer_heads=2, transformer_layers=1,
                     vision_heads_override=2)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3)), jnp.float32)
    m_ref = CLIP(cfg)
    variables = m_ref.init(jax.random.key(0), x)
    m_flash = CLIP(cfg, attention_fn=flash_attention)
    a = m_ref.apply(variables, x)
    b = m_flash.apply(variables, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


# ---------------------------------------------------------------- fused QKV


def _ref_from_qkv(qkv, n, s, h, d, mask):
    q, k, v = jnp.split(qkv, 3, axis=-1)
    f = lambda t: t.reshape(n, s, h, d).transpose(0, 2, 1, 3)
    out = default_attention(f(q), f(k), f(v), mask)
    return out.transpose(0, 2, 1, 3).reshape(n, s, h * d)


@pytest.mark.parametrize("cfg", [
    (2, 18, 2, 64, False),   # head-pair path (d=64)
    (3, 50, 4, 64, False),   # ViT-B/32-like shapes
    (2, 21, 2, 64, True),    # causal (text encoder)
    (2, 10, 2, 128, True),   # aligned single-head path (d=128)
])
def test_fused_qkv_matches_reference(rng, cfg):
    from eoe_tpu.ops.attention import fused_qkv_attention
    n, s, h, d, causal = cfg
    D = h * d
    qkv = jnp.asarray(rng.normal(0, 1, (n, s, 3 * D)), jnp.float32)
    mask = jnp.triu(jnp.full((s, s), -jnp.inf), k=1) if causal else None
    ref = _ref_from_qkv(qkv, n, s, h, d, mask)
    out = fused_qkv_attention(qkv, h, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_qkv_gradients_match(rng):
    from eoe_tpu.ops.attention import fused_qkv_attention
    n, s, h, d, causal = 2, 21, 2, 64, True
    D = h * d
    qkv = jnp.asarray(rng.normal(0, 1, (n, s, 3 * D)), jnp.float32)
    mask = jnp.triu(jnp.full((s, s), -jnp.inf), k=1)
    g = jnp.asarray(rng.normal(0, 1, (n, s, D)), jnp.float32)
    g_fused = jax.grad(lambda x: (fused_qkv_attention(x, h, causal) * g).sum())(qkv)
    g_ref = jax.grad(lambda x: (_ref_from_qkv(x, n, s, h, d, mask) * g).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-4)


def test_fused_qkv_gate():
    """The fused kernel must not engage off-TPU, under a CPU default-device
    context, on unaligned head dims, or when explicitly disabled — those
    paths fall back to the GSPMD-partitionable einsum attention."""
    from eoe_tpu.ops.attention import fused_qkv_ok
    assert not fused_qkv_ok(4, 50, 12, 64)  # tests run on the CPU backend


def test_fused_qkv_rejects_small_head_dims(rng):
    """The pair-packing compute path covers per-group head counts 1 and 2
    only (d in {64, 128}); d=32/16 used to pass the shape check but return
    silently wrong outputs (advisor finding, round 3) — they must raise."""
    from eoe_tpu.ops.attention import _check_fused_shape, fused_qkv_attention

    for heads, d in [(4, 32), (8, 16), (12, 48)]:
        with pytest.raises(ValueError):
            _check_fused_shape(heads, d, 50)
        qkv = jnp.asarray(rng.normal(0, 1, (2, 50, 3 * heads * d)), jnp.float32)
        with pytest.raises(ValueError):
            fused_qkv_attention(qkv, heads, False)
    _check_fused_shape(12, 64, 50)  # the CLIP ViT-B/32 config stays valid
    _check_fused_shape(4, 128, 50)


def test_fused_qkv_vmapped_forward_matches(rng):
    """Vmapped programs (seed-vmapped grids, vmapped evolution candidates)
    keep the fused kernel: the custom_vmap rule collapses the vmap axis into
    the kernel batch dim, exactly (block-diagonal cells isolate images)."""
    from eoe_tpu.ops.attention import fused_qkv_attention
    K, n, s, h, d = 3, 2, 18, 2, 64
    D = h * d
    qkv = jnp.asarray(rng.normal(0, 1, (K, n, s, 3 * D)), jnp.float32)
    out = jax.vmap(lambda x: fused_qkv_attention(x, h, False))(qkv)
    for k in range(K):
        ref = _ref_from_qkv(qkv[k], n, s, h, d, None)
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref), atol=1e-5)


def test_fused_qkv_vmapped_gradients_match(rng):
    from eoe_tpu.ops.attention import fused_qkv_attention
    K, n, s, h, d, causal = 2, 2, 21, 2, 64, True
    D = h * d
    qkv = jnp.asarray(rng.normal(0, 1, (K, n, s, 3 * D)), jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (K, n, s, D)), jnp.float32)
    mask = jnp.triu(jnp.full((s, s), -jnp.inf), k=1)

    def loss_fused(x, gk):
        return (fused_qkv_attention(x, h, causal) * gk).sum()

    g_fused = jax.vmap(jax.grad(loss_fused))(qkv, g)
    for k in range(K):
        g_ref = jax.grad(lambda x: (_ref_from_qkv(x, n, s, h, d, mask) * g[k]).sum())(qkv[k])
        np.testing.assert_allclose(np.asarray(g_fused[k]), np.asarray(g_ref), atol=1e-4)


def test_fused_qkv_nested_vmap(rng):
    """Nested vmaps peel one level per custom_vmap rule application."""
    from eoe_tpu.ops.attention import fused_qkv_attention
    K2, K1, n, s, h, d = 2, 2, 1, 10, 2, 64
    D = h * d
    qkv = jnp.asarray(rng.normal(0, 1, (K2, K1, n, s, 3 * D)), jnp.float32)
    out = jax.vmap(jax.vmap(lambda x: fused_qkv_attention(x, h, False)))(qkv)
    ref = _ref_from_qkv(qkv[1, 0], n, s, h, d, None)
    np.testing.assert_allclose(np.asarray(out[1, 0]), np.asarray(ref), atol=1e-5)


def test_fused_qkv_production_blocks(rng):
    """Exercise the per-direction block sizing at shapes where fwd (MAX_R=128)
    and bwd (MAX_R_BWD=256) genuinely pick different cell sizes (s_pad=64:
    fwd 2 images/cell, bwd 4), including batches that straddle cells."""
    from eoe_tpu.ops import attention as A
    n, s, h, d = 8, 50, 4, 64
    D = h * d
    s_pad = A._round_up(s, 16)
    assert A._pick_block(n, s_pad, A.MAX_R) == 2
    assert A._pick_block(n, s_pad, A.MAX_R_BWD) == 4
    qkv = jnp.asarray(rng.normal(0, 1, (n, s, 3 * D)), jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (n, s, D)), jnp.float32)
    out = A.fused_qkv_attention(qkv, h, False)
    ref = _ref_from_qkv(qkv, n, s, h, d, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    g_fused = jax.grad(lambda x: (A.fused_qkv_attention(x, h, False) * g).sum())(qkv)
    g_ref = jax.grad(lambda x: (_ref_from_qkv(x, n, s, h, d, None) * g).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-4)
