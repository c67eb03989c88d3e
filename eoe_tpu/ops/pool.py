"""Max pooling with an explicit per-tap backward — a MEASURED NEGATIVE RESULT
kept as documentation (not wired into any model).

Hypothesis: ``nn.max_pool``'s gradient lowers to XLA ``select-and-scatter``,
suspected slow on TPU (1.73ms of a 37ms WideResNet@224 train step,
select-and-scatter.10 in the bench trace). This module computes the same
pooling with an explicit backward: for each of the k*k window taps the
gradient cell routes to the tap position iff that position held the window max
and no earlier (row-major) tap did — torch's first-argmax semantics
(reference models pool via torch.nn.MaxPool2d, e.g.
/root/reference/src/eoe/models/resnet.py:33,97) — as k*k strided masked adds
into a padded buffer, all static shapes, no scatter.

Measured on one v5e (stem pool shape, (256,112,112,64) bf16, 3x3 s2 p1):
select-and-scatter 4.95ms vs these tap-adds 17.37ms isolated fwd+grad —
the stride-2 interleaved `.at[].add` updates relayout sublanes and lose 3.5x,
and the in-context select-and-scatter is only ~1.4x over its bandwidth
speed-of-light (x read + dx write + y/g ≈ 1GB ≈ 1.25ms at 819GB/s). End to
end the WRN bench regressed 6383 -> 5043 img/s with this wired in. XLA wins;
the op stays available for experiments and as the record of why.

Forward is the ordinary ``lax.reduce_window`` max (identical to nn.max_pool).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _reduce_max(x, window: Tuple[int, int], strides: Tuple[int, int],
                padding: Tuple[Tuple[int, int], Tuple[int, int]]):
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max, (1,) + window + (1,), (1,) + strides + (1,),
        ((0, 0),) + padding + ((0, 0),))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool(x: jax.Array, window: Tuple[int, int], strides: Tuple[int, int],
             padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
             ) -> jax.Array:
    """NHWC max pooling, same results as ``flax.linen.max_pool``; the custom
    backward avoids select-and-scatter. Ties route the full gradient to the
    first (row-major) maximal tap, matching torch.nn.MaxPool2d."""
    return _reduce_max(x, window, strides, padding)


def _fwd(x, window, strides, padding):
    y = _reduce_max(x, window, strides, padding)
    return y, (x, y)


def _bwd(window, strides, padding, res, g):
    x, y = res
    n, h, w, c = x.shape
    kh, kw = window
    sh, sw = strides
    (pt, pb), (pl, pr) = padding
    oh, ow = y.shape[1], y.shape[2]
    # pad x with -inf so padded taps never match the (finite) window max
    neg = jnp.asarray(-jnp.inf, x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)), constant_values=neg)
    hp, wp = xp.shape[1], xp.shape[2]
    # tap slices must cover oh/ow strided cells: extend so di + sh*(oh-1) < hp'
    eh = max(0, (kh - 1) + sh * (oh - 1) + 1 - hp)
    ew = max(0, (kw - 1) + sw * (ow - 1) + 1 - wp)
    if eh or ew:
        xp = jnp.pad(xp, ((0, 0), (0, eh), (0, ew), (0, 0)), constant_values=neg)
        hp, wp = xp.shape[1], xp.shape[2]
    buf = jnp.zeros((n, hp, wp, c), g.dtype)
    seen = jnp.zeros(y.shape, bool)
    for di in range(kh):
        for dj in range(kw):
            tap = jax.lax.slice(xp, (0, di, dj, 0),
                                (n, di + sh * (oh - 1) + 1, dj + sw * (ow - 1) + 1, c),
                                (1, sh, sw, 1))
            hit = (tap == y) & ~seen
            seen = seen | hit
            contrib = jnp.where(hit, g, jnp.zeros((), g.dtype))
            buf = buf.at[:, di:di + sh * (oh - 1) + 1:sh,
                         dj:dj + sw * (ow - 1) + 1:sw, :].add(contrib)
    dx = buf[:, pt:pt + h, pl:pl + w, :]
    return (dx.astype(x.dtype),)


max_pool.defvjp(_fwd, _bwd)


def max_pool_3x3_s2_p1(x: jax.Array) -> jax.Array:
    """The ResNet stem pool (torch MaxPool2d(3, 2, 1))."""
    return max_pool(x, (3, 3), (2, 2), ((1, 1), (1, 1)))


def max_pool_2x2_s2(x: jax.Array) -> jax.Array:
    """The CNN28/32 pool (torch MaxPool2d(2, 2))."""
    return max_pool(x, (2, 2), (2, 2))
