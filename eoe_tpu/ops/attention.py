"""Fused (flash-style) attention kernel for the CLIP encoders, in Pallas.

The reference's attention is torch ``nn.MultiheadAttention`` inside the
vendored CLIP (model.py:167-199) — cuDNN kernels on GPU. Here the forward is
one Pallas TPU kernel per (batch, head): QK^T, numerically-stable softmax, and
PV fused in VMEM, so the (S, S) probability matrix never leaves the chip.
CLIP's sequences are short (50 image / 77 text tokens), so a single KV block
covers the whole sequence; the kernel pads S and the head dim up to the TPU
tile lanes and masks the padding inside.

Gradients: a custom VJP recomputes the standard jnp attention for the
backward (S<=77 makes recompute cheap); the forward kernel is used in both
the train and eval paths.

Measured on one v5e chip (bf16): at CLIP's S=50/77 with head dim 64 the
Mosaic tiling pads S and D up to 128 lanes (2.6x wasted MXU work) and XLA's
batched attention is ~2x faster; from S>=512 the kernel matches XLA while
keeping the (S, S) matrix out of HBM. The CLIP default therefore stays on
the XLA path; pass ``attention_fn=flash_attention`` to
eoe_tpu.models.clip.CLIP to opt in (e.g. for long-sequence variants).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eoe_tpu.models.clip.model import default_attention

LANE = 128
MAX_SINGLE_BLOCK = 1024  # (S, S) f32 logits must fit VMEM comfortably


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float, s_real: int):
    q = q_ref[0].astype(jnp.float32)  # (S_pad, D_pad)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    # mask out padded key columns, add the (optional) additive mask
    s_pad = logits.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < s_real, logits, -jnp.inf)
    logits = logits + mask_ref[...]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        (p / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_forward(q: jax.Array, k: jax.Array, v: jax.Array,
                   mask: Optional[jax.Array]) -> jax.Array:
    n, h, s, d = q.shape
    s_pad = _round_up(s, LANE)
    d_pad = _round_up(d, LANE)
    bh = n * h

    def pad(x):
        x = x.reshape(bh, s, d)
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, d_pad - d)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    if mask is None:
        maskp = jnp.zeros((s_pad, s_pad), jnp.float32)
    else:
        maskp = jnp.pad(mask.astype(jnp.float32), ((0, s_pad - s), (0, s_pad - s)))
    # padded QUERY rows attend nowhere through the causal mask's -inf rows;
    # give them a valid (zero) row so exp/softmax stays finite — their outputs
    # are sliced away below
    if s_pad > s:
        maskp = maskp.at[s:, :].set(0.0)

    kernel = functools.partial(_kernel, scale=d ** -0.5, s_real=s)
    interpret = jax.default_backend() == "cpu"  # pallas TPU kernels interpret on CPU
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d_pad), q.dtype),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, s_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_pad, d_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(qp, kp, vp, maskp)
    return out[:, :s, :d].reshape(n, h, s, d)


# ---------------------------------------------------------------------------
# Fused QKV attention: the production kernel for the CLIP encoders.
#
# Motivation (measured on v5e, CLIP ViT-B/32 HSC train step, batch 256): the
# XLA path batches the per-head dots over (n, heads), and layout assignment
# materializes the (n,s,h,d)->(n,h,s,d) transposes as ~24 standalone copies
# per step plus an f32 (n,h,s,s) probability tensor in HBM — ~21ms of a 74ms
# step for ~1% of the FLOPs. This kernel instead consumes the UN-transposed
# (n, s, 3*heads*d) projection output directly: one grid cell loads a block
# of images into VMEM, loops the heads with 64-lane slices, and fuses
# QK^T -> bias -> softmax -> PV entirely on-chip. Cross-image pairs inside a
# cell are masked with a block-diagonal additive bias, so the per-head matmul
# is one well-shaped (R, d) x (d, R) MXU op with R = block*s_pad rows instead
# of n*h tiny (s, d) ones. The backward kernel recomputes the probabilities
# (S <= 77 makes recompute ~free) and emits d(qkv) in the same layout.
# ---------------------------------------------------------------------------

import os as _os

# rows (block*s_pad) per grid cell. Larger cells amortize MXU issue overhead
# but grow the block-diagonal masking waste linearly; on v5e at CLIP ViT-B/32
# shapes R=128 (2 images/cell) measured best: 4225 img/s vs 4143 (R=384),
# 3855 (R=512), 3852 (R=64, grid-overhead-bound).
MAX_R = int(_os.environ.get("EOE_TPU_ATTN_MAX_R", "128"))


def _pick_block(n: int, s_pad: int) -> int:
    best = 1
    for b in range(1, n + 1):
        if n % b == 0 and b * s_pad <= MAX_R:
            best = b
    return best


def _cell_bias(R: int, s_pad: int, s_real: int, causal: bool) -> jax.Array:
    """(R, R) additive f32 bias: -1e30 where attention is not allowed —
    across images of the block, onto padded key columns, and (optionally)
    onto future positions."""
    row = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    row_img, row_pos = row // s_pad, row % s_pad
    col_img, col_pos = col // s_pad, col % s_pad
    allowed = (row_img == col_img) & (col_pos < s_real)
    if causal:
        allowed = allowed & (col_pos <= row_pos)
    return jnp.where(allowed, 0.0, -1e30).astype(jnp.float32)


LANE = 128


def _head_groups(heads: int, d: int):
    """Iterate 128-lane-aligned groups. Yields (group_index, [head lane-masks]).

    TPU vregs are 128 lanes wide; slicing a (R, 3D) activation at a 64-lane
    offset forces lane-shuffle relayouts that dominated the first kernel
    version (~0.13ms fwd / ~0.2ms bwd per ViT-B layer of pure shuffle).
    With d=64 two heads share one aligned 128-lane group instead; per head a
    0/1 lane mask zeroes the sibling's lanes, and the pair matmul then
    computes that head's logits EXACTLY (the zeroed lanes contribute 0 to the
    contraction). All loads, matmuls, and stores stay 128-aligned."""
    per = LANE // d  # heads per group: 2 for d=64, 1 for d=128
    for gi in range(heads // per):
        yield gi, per


def _lane_mask(R: int, half: int, per: int, dtype) -> jax.Array:
    if per == 1:
        return None
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    return ((lane // (LANE // per)) == half).astype(dtype)


def _softmax_f32(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fused_fwd_kernel(qkv_ref, o_ref, *, heads: int, d: int, s_pad: int,
                      s_real: int, causal: bool):
    bn = qkv_ref.shape[0]
    R = bn * s_pad
    D = heads * d
    x = qkv_ref[...].reshape(R, 3 * D)
    bias = _cell_bias(R, s_pad, s_real, causal)
    scale = d ** -0.5
    for gi, per in _head_groups(heads, d):
        base = gi * LANE
        q2 = x[:, base:base + LANE]
        k2 = x[:, D + base:D + base + LANE]
        v2 = x[:, 2 * D + base:2 * D + base + LANE]
        out = None
        for half in range(per):
            mask = _lane_mask(R, half, per, x.dtype)
            km = k2 if mask is None else k2 * mask
            logits = jax.lax.dot_general(
                q2, km, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            p = _softmax_f32(logits).astype(x.dtype)
            o = jax.lax.dot_general(p, v2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o = o if mask is None else o * mask
            out = o if out is None else out + o
        o_ref[:, :, base:base + LANE] = (
            out.reshape(bn, s_pad, LANE).astype(o_ref.dtype))


def _fused_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, heads: int, d: int,
                      s_pad: int, s_real: int, causal: bool):
    bn = qkv_ref.shape[0]
    R = bn * s_pad
    D = heads * d
    x = qkv_ref[...].reshape(R, 3 * D)
    g_all = g_ref[...].reshape(R, D)
    bias = _cell_bias(R, s_pad, s_real, causal)
    scale = d ** -0.5
    for gi, per in _head_groups(heads, d):
        base = gi * LANE
        q2 = x[:, base:base + LANE]
        k2 = x[:, D + base:D + base + LANE]
        v2 = x[:, 2 * D + base:2 * D + base + LANE]
        g2 = g_all[:, base:base + LANE]
        dq = dk = dv = None
        for half in range(per):
            mask = _lane_mask(R, half, per, x.dtype)
            km = k2 if mask is None else k2 * mask
            qm = q2 if mask is None else q2 * mask
            gm = g2 if mask is None else g2 * mask
            logits = jax.lax.dot_general(
                q2, km, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            p = _softmax_f32(logits)  # f32 (R, R)
            pc = p.astype(x.dtype)
            # dv += p^T g_h (g masked to this head's lanes)
            dvh = jax.lax.dot_general(pc, gm, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            # dp = g_h v^T — masked g zeroes the sibling's contraction lanes
            dp = jax.lax.dot_general(gm, v2, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * p * scale
            dsc = ds.astype(x.dtype)
            dqh = jax.lax.dot_general(dsc, km, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dkh = jax.lax.dot_general(dsc, qm, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dq = dqh if dq is None else dq + dqh
            dk = dkh if dk is None else dk + dkh
            dv = dvh if dv is None else dv + dvh
        dqkv_ref[:, :, base:base + LANE] = (
            dq.reshape(bn, s_pad, LANE).astype(dqkv_ref.dtype))
        dqkv_ref[:, :, D + base:D + base + LANE] = (
            dk.reshape(bn, s_pad, LANE).astype(dqkv_ref.dtype))
        dqkv_ref[:, :, 2 * D + base:2 * D + base + LANE] = (
            dv.reshape(bn, s_pad, LANE).astype(dqkv_ref.dtype))


def _fused_call(kernel, out_feats: int, inputs, n, s_pad, D, heads, d,
                s_real, causal, dtype):
    bn = _pick_block(n, s_pad)
    interpret = jax.default_backend() == "cpu"
    specs = [pl.BlockSpec((bn, s_pad, a.shape[-1]), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM) for a in inputs]
    return pl.pallas_call(
        functools.partial(kernel, heads=heads, d=d, s_pad=s_pad,
                          s_real=s_real, causal=causal),
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((n, s_pad, out_feats), dtype),
        grid=(n // bn,),
        in_specs=specs,
        out_specs=pl.BlockSpec((bn, s_pad, out_feats), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(*inputs)


def _qkv_pad(x: jax.Array, s_pad: int) -> jax.Array:
    s = x.shape[1]
    if s == s_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))


# ---------------------------------------------------------------- SPMD rules
#
# pallas_call is an opaque custom call GSPMD cannot partition — without rules
# a data-parallel mesh would gather the global batch onto every chip. The
# kernel is embarrassingly parallel over images (cells never mix images from
# different shards: the block-diagonal bias only spans a cell), so
# custom_partitioning shards the leading batch dim and runs the kernel
# per-shard; feature/sequence dims are forced replicated.


def _batch_axis(arg_shapes):
    sh = getattr(arg_shapes[0], "sharding", None)
    spec = getattr(sh, "spec", None)
    if spec is None or len(spec) == 0:
        return None
    return spec[0]


@functools.lru_cache(maxsize=None)
def _partitioned_call(kind: str, out_feats: int, heads: int, d: int,
                      s_pad: int, s_real: int, causal: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    kernel = _fused_fwd_kernel if kind == "fwd" else _fused_bwd_kernel

    def impl(*args):
        n = args[0].shape[0]
        D = heads * d
        return _fused_call(kernel, out_feats, list(args), n, s_pad, D, heads,
                           d, s_real, causal, args[0].dtype)

    f = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, PartitionSpec(_batch_axis(arg_shapes), None, None))

    def partition(mesh, arg_shapes, result_shape):
        batch = _batch_axis(arg_shapes)
        arg_sh = tuple(NamedSharding(mesh, PartitionSpec(batch, None, None))
                       for _ in arg_shapes)
        res_sh = NamedSharding(mesh, PartitionSpec(batch, None, None))
        return mesh, impl, res_sh, arg_sh

    def propagate(mesh, user_shape):
        spec = getattr(user_shape.sharding, "spec", None)
        batch = spec[0] if spec else None
        return NamedSharding(mesh, PartitionSpec(batch, None, None))

    # batch dim shards; sequence/feature dims must stay whole on each chip
    # (einsum-like rule for the Shardy partitioner; the callbacks serve the
    # classic GSPMD path)
    rule = ("b s f -> b s g" if kind == "fwd" else "b s f, b s g -> b s f")
    f.def_partition(partition=partition, propagate_user_sharding=propagate,
                    infer_sharding_from_operands=infer,
                    sharding_rule=rule,
                    need_replication_factors=("s", "f", "g"))
    return f


@functools.lru_cache(maxsize=None)
def _vmappable_call(kind: str, out_feats: int, heads: int, d: int,
                    s_pad: int, s_real: int, causal: bool):
    """custom_vmap wrapper over the partitioned kernel call: a vmapped axis
    (seed-vmapped grids, vmapped evolution candidates) collapses into the
    kernel's leading batch dim instead of forcing the einsum fallback — the
    block-diagonal cell masking already isolates images, so (K, n, s, F) ->
    (K*n, s, F) is exact. Rules recurse through the wrapper so nested vmaps
    peel one level each."""
    from jax.custom_batching import custom_vmap

    inner = _partitioned_call(kind, out_feats, heads, d, s_pad, s_real, causal)

    if kind == "fwd":
        @custom_vmap
        def op(qkv):
            return inner(qkv)

        @op.def_vmap
        def _rule(axis_size, in_batched, qkv):
            if not in_batched[0]:
                return op(qkv), False
            K, n, s, F = qkv.shape
            out = op(qkv.reshape(K * n, s, F))
            return out.reshape(K, n, s, out_feats), True

        return op

    @custom_vmap
    def op2(qkv, g):
        return inner(qkv, g)

    @op2.def_vmap
    def _rule2(axis_size, in_batched, qkv, g):
        if not any(in_batched):
            return op2(qkv, g), False
        if not in_batched[0]:
            qkv = jnp.broadcast_to(qkv[None], (axis_size,) + qkv.shape)
        if not in_batched[1]:
            g = jnp.broadcast_to(g[None], (axis_size,) + g.shape)
        K, n, s, F = qkv.shape
        out = op2(qkv.reshape(K * n, s, F), g.reshape(K * n, s, g.shape[-1]))
        return out.reshape(K, n, s, out_feats), True

    return op2


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_qkv_attention_padded(qkv_p: jax.Array, heads: int, s_real: int,
                               causal: bool = False) -> jax.Array:
    """Like :func:`fused_qkv_attention`, but consumes an ALREADY sequence-
    padded projection (n, round_up(s_real, 16), 3*D) and returns the
    unpadded (n, s_real, D) attention output.

    Split out so producers that already hold a padded sequence can skip the
    wrapper's pad/slice pair. Pad rows may hold arbitrary FINITE values: as
    keys they are masked via ``s_real``, as queries their outputs are sliced
    away, and the backward's pad-row cotangents are exactly zero, so the
    returned padded ``dqkv`` keeps upstream gradients exact."""
    out, _ = _fused_fwd_padded(qkv_p, heads, s_real, causal)
    return out


def _fused_fwd_padded(qkv_p, heads, s_real, causal):
    n, s_pad, F = qkv_p.shape
    D = F // 3
    d = D // heads
    _check_fused_shape(heads, d, s_real)
    if s_pad != _round_up(s_real, 16):
        raise ValueError(f"qkv_p sequence dim {s_pad} != round_up({s_real}, 16)")
    out = _vmappable_call("fwd", D, heads, d, s_pad, s_real, causal)(qkv_p)
    return out[:, :s_real, :], (qkv_p,)


def _fused_bwd_padded(heads, s_real, causal, residuals, g):
    (qkv_p,) = residuals
    _, s_pad, F = qkv_p.shape
    D = F // 3
    d = D // heads
    g_p = _qkv_pad(g, s_pad)
    dqkv = _vmappable_call("bwd", F, heads, d, s_pad, s_real, causal)(qkv_p, g_p)
    return (dqkv,)  # padded cotangent: pad rows are exactly zero (masked keys,
    #                 zero pad-row g), so the producer's pad op needs no slice


fused_qkv_attention_padded.defvjp(_fused_fwd_padded, _fused_bwd_padded)


def fused_qkv_attention(qkv: jax.Array, heads: int, causal: bool = False) -> jax.Array:
    """Multi-head self-attention fused over the concatenated projection.

    ``qkv``: (n, s, 3*D) — the joint in-projection output, features ordered
    [q | k | v] with heads laid out contiguously inside each (torch
    nn.MultiheadAttention convention). Returns (n, s, D) — the pre-out-
    projection attention output with heads concatenated, un-transposed.
    ``causal`` applies the standard upper-triangular mask (the only mask the
    CLIP text encoder uses, reference model.py:324-330).

    Thin wrapper over :func:`fused_qkv_attention_padded`: pads the sequence
    to the bf16 sublane tile here; autodiff of the pad slices the padded
    cotangent (whose pad rows are exactly zero) back down."""
    n, s, F = qkv.shape
    return fused_qkv_attention_padded(_qkv_pad(qkv, _round_up(s, 16)), heads, s, causal)


def _check_fused_shape(heads: int, d: int, s: int):
    # the lane-group trick only computes exact results when heads tile the
    # 128-lane groups evenly; reject misaligned configs loudly instead of
    # silently dropping heads / producing misaligned slices
    per = LANE // d if d and LANE % d == 0 else 0
    if per == 0 or heads % per != 0:
        raise ValueError(
            f"fused_qkv_attention requires LANE%d==0 and heads%(LANE//d)==0; "
            f"got heads={heads}, d={d} (use fused_qkv_ok() to gate)")
    if _round_up(s, 16) > MAX_R:
        raise ValueError(f"sequence {s} exceeds the single-cell budget MAX_R={MAX_R}")


def fused_qkv_ok(n: int, s: int, heads: int, d: int, sample=None) -> bool:
    """Whether the fused kernel applies: real TPU backend, head dim on a
    64-lane boundary, sequence within the single-block budget. Vmapped
    programs (seed-vmapped grids, vmapped evolution) are eligible too: the
    custom_vmap rules collapse the vmap axis into the kernel's batch dim
    (``sample`` is accepted for API compatibility, no longer consulted).
    Returns False under a CPU ``jax.default_device`` context (e.g. the
    trainer's CPU-side model init) — the einsum path used there builds
    identical params."""
    import os
    if os.environ.get("EOE_TPU_FUSED_ATTN", "1") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    dd = getattr(jax.config, "jax_default_device", None)
    if dd is not None and getattr(dd, "platform", None) == "cpu":
        return False
    aligned = (d == 64 and heads % 2 == 0) or d == 128
    return aligned and _round_up(s, 16) <= MAX_R and n >= 1


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    mask: Optional[jax.Array] = None) -> jax.Array:
    """Drop-in for :func:`eoe_tpu.models.clip.model.default_attention`:
    (n, heads, S, hd) scaled-dot-product attention, fused in VMEM."""
    if q.shape[2] > MAX_SINGLE_BLOCK:
        return default_attention(q, k, v, mask)
    return _flash_forward(q, k, v, mask)


def _fwd(q, k, v, mask):
    if q.shape[2] > MAX_SINGLE_BLOCK:
        return default_attention(q, k, v, mask), (q, k, v, mask)
    return _flash_forward(q, k, v, mask), (q, k, v, mask)


def _bwd(residuals, g):
    q, k, v, mask = residuals
    _, vjp = jax.vjp(lambda q, k, v: default_attention(q, k, v, mask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
