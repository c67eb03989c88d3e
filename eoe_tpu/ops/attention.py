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

# target rows (images*s_pad) per grid cell, per direction. Larger cells
# amortize MXU issue overhead but grow the block-diagonal masking waste
# linearly. Measured on v5e at CLIP ViT-B/32 shapes (per-layer kernel time):
# forward is best at R=128 (0.19ms; 0.25 at R=256) while the backward — whose
# five matmuls amortize issue overhead over more work — is best at R=256
# (0.44ms; 0.51 at R=128).
MAX_R = int(_os.environ.get("EOE_TPU_ATTN_MAX_R", "128"))
MAX_R_BWD = int(_os.environ.get("EOE_TPU_ATTN_MAX_R_BWD", "256"))


def _pick_block(n: int, s: int, max_r: int) -> int:
    best = 1
    for b in range(1, n + 1):
        if n % b == 0 and b * s <= max_r:
            best = b
    return best


def _cell_bias(R: int, s_pad: int, s_real: int, causal: bool) -> jax.Array:
    """(R, R) additive f32 bias: -1e30 where attention is not allowed —
    across images of the block (stacked at pitch ``s_pad``), onto padded key
    columns, and (optionally) onto future positions."""
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
    """Iterate 128-lane-aligned groups. Yields (group_index, heads_per_group).

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


def _fwd_group_math(q2, k2, v2, bias, scale, per):
    """One lane group's attention: (R, LANE) q/k/v slices -> (R, LANE) out."""
    if per == 1:
        logits = jax.lax.dot_general(
            q2, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        p = _softmax_f32(logits).astype(q2.dtype)
        return jax.lax.dot_general(p, v2, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    R = q2.shape[0]
    # scale q up front: for d=64 the scale is 2^-3, exact in bf16
    q2 = q2 * jnp.asarray(scale, q2.dtype)
    # pair packing (d=64): stack both heads' lane-masked K/V along the
    # row dim so the group runs ONE (R,LANE)x(LANE,2R) logits matmul
    # and ONE (R,2R)x(2R,LANE) PV matmul instead of two of each —
    # half the MXU issues at double the tile size, identical math
    # (masked V confines each head to its own lanes, and the PV
    # contraction sums the two heads' outputs in its epilogue).
    mA = _lane_mask(R, 0, per, q2.dtype)
    mB = _lane_mask(R, 1, per, q2.dtype)
    km = jnp.concatenate([k2 * mA, k2 * mB], axis=0)  # (2R, LANE)
    vm = jnp.concatenate([v2 * mA, v2 * mB], axis=0)
    logits = jax.lax.dot_general(
        q2, km, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (R, 2R)
    pA = _softmax_f32(logits[:, :R] + bias)
    pB = _softmax_f32(logits[:, R:] + bias)
    p = jnp.concatenate([pA, pB], axis=1).astype(q2.dtype)
    return jax.lax.dot_general(p, vm, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_compute(qkv_ref, o_ref, *, heads: int, d: int, s_pad: int,
                 s_real: int, causal: bool):
    bn = qkv_ref.shape[0]
    R = bn * s_pad  # images stacked at pitch s_pad rows
    D = heads * d
    x = qkv_ref[...].reshape(R, 3 * D)
    bias = _cell_bias(R, s_pad, s_real, causal)
    scale = d ** -0.5
    for gi, per in _head_groups(heads, d):
        base = gi * LANE
        out = _fwd_group_math(x[:, base:base + LANE],
                              x[:, D + base:D + base + LANE],
                              x[:, 2 * D + base:2 * D + base + LANE],
                              bias, scale, per)
        o_ref[:, :, base:base + LANE] = (
            out.reshape(bn, s_pad, LANE).astype(o_ref.dtype))


def _bwd_group_math(q2, k2, v2, g2, bias, scale, per):
    """One lane group's attention backward: (R, LANE) slices -> dq, dk, dv."""
    R = q2.shape[0]
    if per == 1:
        logits = jax.lax.dot_general(
            q2, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        p = _softmax_f32(logits)  # f32 (R, R)
        pc = p.astype(q2.dtype)
        dv = jax.lax.dot_general(pc, g2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(g2, v2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * p * scale
        dsc = ds.astype(q2.dtype)
        dq = jax.lax.dot_general(dsc, k2, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(dsc, q2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return dq, dk, dv
    # pair packing (d=64, see _fwd_group_math): the five per-head matmuls of
    # the pair collapse into five double-size ones. Lane masks move freely
    # across each contraction's free index (the 0/1 masks square to
    # themselves), so masking K/V rows up front and the dk/dv outputs
    # afterwards reproduces the per-head math.
    mA = _lane_mask(R, 0, per, q2.dtype)
    mB = _lane_mask(R, 1, per, q2.dtype)
    q2s = q2 * jnp.asarray(scale, q2.dtype)  # 2^-3: exact in bf16
    km = jnp.concatenate([k2 * mA, k2 * mB], axis=0)  # (2R, LANE)
    vm = jnp.concatenate([v2 * mA, v2 * mB], axis=0)
    logits = jax.lax.dot_general(
        q2s, km, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (R, 2R)
    pA = _softmax_f32(logits[:, :R] + bias)
    pB = _softmax_f32(logits[:, R:] + bias)
    pc = jnp.concatenate([pA, pB], axis=1).astype(q2.dtype)
    # dv_pair[c, l] = sum_r p[r, c] g[r, l]; head h's slice masked after
    dv_pair = jax.lax.dot_general(pc, g2, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # (2R, LANE)
    dv = dv_pair[:R] * mA + dv_pair[R:] * mB
    # dp_pair[r, c] = sum_l g[r, l] vm[c, l] (mask carried by vm)
    dp_pair = jax.lax.dot_general(g2, vm, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # (R, 2R)
    dpA, dpB = dp_pair[:, :R], dp_pair[:, R:]
    dsA = (dpA - jnp.sum(dpA * pA, axis=-1, keepdims=True)) * pA
    dsB = (dpB - jnp.sum(dpB * pB, axis=-1, keepdims=True)) * pB
    dsc = jnp.concatenate([dsA, dsB], axis=1).astype(q2.dtype)  # (R, 2R)
    # dq = ds_A km_A + ds_B km_B in one contraction (km rows stacked);
    # ds was built unscaled, so the logits' scale re-enters here and
    # folds into dk's output mask multiplies
    dq = jax.lax.dot_general(dsc, km, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk_pair = jax.lax.dot_general(dsc, q2, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # (2R, LANE)
    mAf = mA.astype(jnp.float32) * scale
    mBf = mB.astype(jnp.float32) * scale
    dk = dk_pair[:R] * mAf + dk_pair[R:] * mBf
    return dq, dk, dv


def _bwd_compute(qkv_ref, g_ref, dqkv_ref, *, heads: int, d: int,
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
        dq, dk, dv = _bwd_group_math(x[:, base:base + LANE],
                                     x[:, D + base:D + base + LANE],
                                     x[:, 2 * D + base:2 * D + base + LANE],
                                     g_all[:, base:base + LANE],
                                     bias, scale, per)
        dqkv_ref[:, :, base:base + LANE] = (
            dq.reshape(bn, s_pad, LANE).astype(dqkv_ref.dtype))
        dqkv_ref[:, :, D + base:D + base + LANE] = (
            dk.reshape(bn, s_pad, LANE).astype(dqkv_ref.dtype))
        dqkv_ref[:, :, 2 * D + base:2 * D + base + LANE] = (
            dv.reshape(bn, s_pad, LANE).astype(dqkv_ref.dtype))


# ----------------------------------------------- per-group grid variant
#
# EOE_TPU_ATTN_GROUP_GRID=1 restructures the kernels so the lane-group loop
# becomes the innermost GRID dimension instead of a Python loop over column
# slices of one resident block: each grid step's BlockSpecs fetch only that
# group's q/k/v (and dout) 128-lane column windows, so pallas's automatic
# pipelining double-buffers the NEXT group's DMA against the current group's
# compute. Same total HBM traffic, finer interleaving. The backward emits
# dq/dk/dv as three separate outputs (one BlockSpec cannot write the three
# disjoint column windows of a packed dqkv) which the wrapper re-concatenates.


def _fwd_group_compute(q_ref, k_ref, v_ref, o_ref, *, heads: int, d: int,
                       s_pad: int, s_real: int, causal: bool):
    bn = q_ref.shape[0]
    R = bn * s_pad
    per = LANE // d
    bias = _cell_bias(R, s_pad, s_real, causal)
    out = _fwd_group_math(q_ref[...].reshape(R, LANE),
                          k_ref[...].reshape(R, LANE),
                          v_ref[...].reshape(R, LANE),
                          bias, d ** -0.5, per)
    o_ref[...] = out.reshape(bn, s_pad, LANE).astype(o_ref.dtype)


def _bwd_group_compute(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                       *, heads: int, d: int, s_pad: int, s_real: int,
                       causal: bool):
    bn = q_ref.shape[0]
    R = bn * s_pad
    per = LANE // d
    bias = _cell_bias(R, s_pad, s_real, causal)
    dq, dk, dv = _bwd_group_math(q_ref[...].reshape(R, LANE),
                                 k_ref[...].reshape(R, LANE),
                                 v_ref[...].reshape(R, LANE),
                                 g_ref[...].reshape(R, LANE),
                                 bias, d ** -0.5, per)
    dq_ref[...] = dq.reshape(bn, s_pad, LANE).astype(dq_ref.dtype)
    dk_ref[...] = dk.reshape(bn, s_pad, LANE).astype(dk_ref.dtype)
    dv_ref[...] = dv.reshape(bn, s_pad, LANE).astype(dv_ref.dtype)


def _group_grid_call(kind: str, inputs, n, heads, d, s_real, causal, dtype):
    qkv = inputs[0]
    s_pad = qkv.shape[1]
    D = heads * d
    ng = D // LANE  # lane groups per tensor
    bn = _pick_block(n, s_pad, MAX_R if kind == "fwd" else MAX_R_BWD)
    interpret = jax.default_backend() == "cpu"
    blk = (bn, s_pad, LANE)

    def col(off):  # group g's 128-lane window at tensor offset off (blocks)
        return pl.BlockSpec(blk, lambda i, g, o=off: (i, 0, g + o),
                            memory_space=pltpu.VMEM)

    if kind == "fwd":
        out = pl.pallas_call(
            functools.partial(_fwd_group_compute, heads=heads, d=d,
                              s_pad=s_pad, s_real=s_real, causal=causal),
            interpret=interpret,
            out_shape=jax.ShapeDtypeStruct((n, s_pad, D), dtype),
            grid=(n // bn, ng),
            in_specs=[col(0), col(ng), col(2 * ng)],
            out_specs=col(0),
        )(qkv, qkv, qkv)
        return out
    g = inputs[1]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_group_compute, heads=heads, d=d,
                          s_pad=s_pad, s_real=s_real, causal=causal),
        interpret=interpret,
        out_shape=tuple(jax.ShapeDtypeStruct((n, s_pad, D), dtype)
                        for _ in range(3)),
        grid=(n // bn, ng),
        in_specs=[col(0), col(ng), col(2 * ng), col(0)],
        out_specs=(col(0), col(0), col(0)),
    )(qkv, qkv, qkv, g)
    return jnp.concatenate([dq, dk, dv], axis=-1)


# ------------------------------------------------------------- kernel call
#
# Automatic pallas block pipelining (BlockSpec + grid). A hand-rolled
# double-buffered DMA pipeline (memory_space=ANY + make_async_copy, measured
# on v5e) was NOT faster: per-cell time is DMA + compute under both schemes,
# because the per-group VMEM loads of fresh q/k/v tile-columns do not overlap
# with the in-flight block DMA (a probe kernel whose loads LICM out of the
# group loop hides its entire compute behind the same DMA; one that reads
# fresh columns per group pays the full serial sum). Ingesting the unpadded
# (n, s, F) activations directly is also impossible: DMA moves whole memref
# tiles, so the 6 phantom rows of an s=50 array can't be addressed — hence
# the XLA-level pad to the sublane tile around every call.


GROUP_GRID = _os.environ.get("EOE_TPU_ATTN_GROUP_GRID", "0") == "1"


def _fused_call(kind: str, out_feats: int, inputs, n, heads, d,
                s_real, causal, dtype):
    if GROUP_GRID and (heads * d) % LANE == 0:
        return _group_grid_call(kind, inputs, n, heads, d, s_real, causal,
                                dtype)
    s_pad = inputs[0].shape[1]
    bn = _pick_block(n, s_pad, MAX_R if kind == "fwd" else MAX_R_BWD)
    interpret = jax.default_backend() == "cpu"
    kernel = _fwd_compute if kind == "fwd" else _bwd_compute
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
                      s_real: int, causal: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def impl(*args):
        n = args[0].shape[0]
        return _fused_call(kind, out_feats, list(args), n, heads, d,
                           s_real, causal, args[0].dtype)

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
                    s_real: int, causal: bool):
    """custom_vmap wrapper over the partitioned kernel call: a vmapped axis
    (seed-vmapped grids, vmapped evolution candidates) collapses into the
    kernel's leading batch dim instead of forcing the einsum fallback — the
    block-diagonal cell masking already isolates images, so (K, n, s, F) ->
    (K*n, s, F) is exact. Rules recurse through the wrapper so nested vmaps
    peel one level each."""
    from jax.custom_batching import custom_vmap

    inner = _partitioned_call(kind, out_feats, heads, d, s_real, causal)

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_qkv_attention(qkv: jax.Array, heads: int, causal: bool = False) -> jax.Array:
    """Multi-head self-attention fused over the concatenated projection.

    ``qkv``: (n, s, 3*D) — the joint in-projection output, features ordered
    [q | k | v] with heads laid out contiguously inside each (torch
    nn.MultiheadAttention convention). Returns (n, s, D) — the pre-out-
    projection attention output with heads concatenated, un-transposed.
    ``causal`` applies the standard upper-triangular mask (the only mask the
    CLIP text encoder uses, reference model.py:324-330).

    The wrapper pads the sequence to the 16-row sublane tile around the
    kernel call and slices the outputs back (DMA moves whole memref tiles,
    so unpadded s cannot be ingested directly — see the pipeline notes
    above); sequences up to MAX_R rows per image are supported."""
    out, _ = _fused_fwd(qkv, heads, causal)
    return out


def _qkv_pad(x: jax.Array, s_pad: int) -> jax.Array:
    s = x.shape[1]
    if s == s_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))


def _fused_fwd(qkv, heads, causal):
    n, s, F = qkv.shape
    D = F // 3
    d = D // heads
    _check_fused_shape(heads, d, s)
    qkv_p = _qkv_pad(qkv, _round_up(s, 16))
    out = _vmappable_call("fwd", D, heads, d, s, causal)(qkv_p)
    return out[:, :s, :], (qkv_p,)


def _fused_bwd(heads, causal, residuals, g):
    (qkv_p,) = residuals
    n, s_pad, F = qkv_p.shape
    D = F // 3
    d = D // heads
    s = g.shape[1]
    g_p = _qkv_pad(g, s_pad)
    dqkv = _vmappable_call("bwd", F, heads, d, s, causal)(qkv_p, g_p)
    return (dqkv[:, :s, :],)


fused_qkv_attention.defvjp(_fused_fwd, _fused_bwd)


def _check_fused_shape(heads: int, d: int, s: int):
    # the lane-group trick only computes exact results when heads tile the
    # 128-lane groups evenly AND the pair-packing compute path covers the
    # group (it handles per==1 and per==2 only: d in {64,128}; per>2 would
    # silently zero heads beyond the first two lane quarters). d=64 also
    # relies on the bf16 q-prescale 2^-3 being exact. Reject everything else
    # loudly instead of returning wrong outputs.
    per = LANE // d if d in (64, 128) else 0
    if per == 0 or heads % per != 0:
        raise ValueError(
            f"fused_qkv_attention requires d in (64, 128) and "
            f"heads%(LANE//d)==0; got heads={heads}, d={d} "
            f"(use fused_qkv_ok() to gate)")
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
