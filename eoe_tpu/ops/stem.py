"""Fused-backward WRN stem: conv7x7 s2 -> BN -> ReLU -> maxpool3x3 s2.

The stem backward is the WideResNet@224 train step's single largest
bandwidth sink (PARITY.md WRN roofline: stem dW 1.74ms + select-and-scatter
maxpool backward 1.73ms + BN-backward chain ~2.3ms of a 37.1ms step), all
bounded by re-reading the dense 112^2 activation gradient. This module ships
the winning formulation from ``experiments/stem_study.py`` ("gridstats"):

the BN-backward reductions collapse onto the POOLED 56^2 grid. The pooled
gradient ``g`` routes to argmax positions only, so with ``M = maxpool(y)``
(``y = relu(gamma*xhat + beta)``) and at every argmax ``y = M``:

    sum(dy)        = sum(g * [M > 0])
    sum(dy * xhat) = sum(g * [M > 0] * (M - beta) / gamma)

which removes BOTH dense 112^2 reduction passes of the standard BN backward;
the remaining elementwise dx chain fuses into the dW conv's input. The
select-and-scatter pool backward itself stays (the gather reformulation
measured 30% SLOWER on-chip — see the study's paritygather negative), as
does XLA's dW conv.

Semantics match ``flax.linen.BatchNorm(momentum=0.9, epsilon=1e-5)`` in
train mode: statistics are computed in f32 as ``mean`` / ``mean(x^2)-mean^2``
(flax ``_compute_stats``), the normalized output is cast to the compute
dtype, and the returned (mu, var) feed the caller's running-stats update.
The backward ignores the (mu, var) cotangents — exactly like flax, where
running-statistic updates are not differentiated.

The input cotangent is the exact transpose-conv of the fused dxc chain. In
the training path the image batch is a non-differentiated leaf, so that
cotangent is unused and XLA dead-code-eliminates the transpose conv — it
costs nothing there — while consumers that DO differentiate the input
(saliency maps, adversarial perturbation, grad-through-augmentation) get
the true gradient. Reference behavior being accelerated:
/root/reference/src/eoe/models/resnet.py:68-79 (conv1/bn1/maxpool of the
hendrycks ss-ood WideResNet).
"""

import jax
import jax.numpy as jnp
from jax import lax

try:  # the primitive behind reduce_window_max's transpose rule
    from jax._src.lax.windowed_reductions import (
        _select_and_scatter_add as _sas_add)
except ImportError:  # pragma: no cover - private-API drift
    _sas_add = None

# models/resnet.py checks this before routing through the fused stem: the
# jax.vjp(_maxpool3s2, ...) fallback fails to linearize under the trainer's
# jitted epoch scan, so a JAX upgrade that moves the private symbol must
# degrade to the unfused stem, not crash at train time.
FUSED_STEM_AVAILABLE = _sas_add is not None

EPS = 1e-5
_MOMENTUM = 0.9


def _conv7s2(x, w):
    return lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _maxpool3s2(y):
    return lax.reduce_window(y, jnp.asarray(-jnp.inf, y.dtype), lax.max,
                             (1, 3, 3, 1), (1, 2, 2, 1),
                             ((0, 0), (1, 1), (1, 1), (0, 0)))


def _stats_bn_relu(xc, gamma, beta):
    """Flax-equivalent train-mode BN (+ReLU) returning (y, mu, var)."""
    xf = xc.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mu)
    inv = lax.rsqrt(var + EPS)
    y = (xf - mu) * (gamma * inv) + beta
    return jnp.maximum(y, 0.0).astype(xc.dtype), mu, var


@jax.custom_vjp
def fused_stem_train(w, gamma, beta, x):
    """Train-mode stem with the grid-stats fused backward.

    Returns ``(pooled, mu, var)``; mu/var are the f32 batch statistics for
    the caller's running-average update (their cotangents are dropped).
    """
    xc = _conv7s2(x, w.astype(x.dtype))
    y, mu, var = _stats_bn_relu(xc, gamma, beta)
    return _maxpool3s2(y), mu, var


def _fwd(w, gamma, beta, x):
    xc = _conv7s2(x, w.astype(x.dtype))
    y, mu, var = _stats_bn_relu(xc, gamma, beta)
    out = _maxpool3s2(y)
    return (out, mu, var), (w, gamma, beta, x, xc, y, mu, var, out)


def _bwd(res, cts):
    g = cts[0]  # cotangents of (mu, var) are the running-stats path: dropped
    w, gamma, beta, x, xc, y, mu, var, M = res
    n_count = y.shape[0] * y.shape[1] * y.shape[2]

    # BN-backward reductions on the pooled grid (see module docstring).
    # gamma crossing exactly 0 would make (M-beta)/gamma inf; nudge it off
    # zero, preserving its sign so the quotient doesn't flip for tiny
    # negative gamma. When |gamma| underflows the threshold, dgamma is an
    # APPROXIMATION (xhat at the argmax is unrecoverable from M alone) —
    # unreachable in practice with the scale init of 1.0.
    gamma_safe = jnp.where(jnp.abs(gamma) < 1e-12,
                           jnp.where(gamma < 0, jnp.float32(-1e-12),
                                     jnp.float32(1e-12)), gamma)
    gm = g.astype(jnp.float32) * (M > 0)
    sum_dy = gm.sum(axis=(0, 1, 2))
    xhat_max = (M.astype(jnp.float32) - beta) / gamma_safe
    sum_dyx = (gm * xhat_max).sum(axis=(0, 1, 2))

    # dense pooled gradient (select-and-scatter) + ReLU mask. The primitive
    # is called directly: jax.vjp(_maxpool3s2, ...) inside a custom_vjp bwd
    # fails to linearize under the trainer's jitted scan ("Linearization
    # failed to produce known values for all output primals").
    if _sas_add is not None:
        dyp = _sas_add(g.astype(y.dtype), y, lax.ge_p,
                       (1, 3, 3, 1), (1, 2, 2, 1),
                       ((0, 0), (1, 1), (1, 1), (0, 0)))
    else:  # pragma: no cover - private-API drift
        dyp = jax.vjp(_maxpool3s2, y)[1](g.astype(y.dtype))[0]
    dy = jnp.where(y > 0, dyp, 0)

    # dx of BN using the grid scalars; fuses into the dW conv's input
    inv = lax.rsqrt(var + EPS)
    xhat = (xc.astype(jnp.float32) - mu) * inv
    dxc = (gamma * inv) * (dy.astype(jnp.float32) - sum_dy / n_count
                           - xhat * (sum_dyx / n_count))
    dxc = dxc.astype(xc.dtype)

    # dW of the 7x7 s2 conv via the conv vjp (the reduction-shaped GEMM)
    _, conv_vjp = jax.vjp(lambda wc: _conv7s2(x, wc),
                          jnp.zeros(w.shape, x.dtype))
    dw = conv_vjp(dxc)[0].astype(w.dtype)

    # dx: exact transpose-conv of dxc through the 7x7 s2 kernel. When the
    # caller never differentiates the image batch (the training path —
    # reference resnet.py:68-79 likewise treats images as leaves) this
    # cotangent is unused and XLA DCEs the conv; when input gradients DO
    # flow (saliency, adversarial perturbation) they are correct.
    _, conv_x_vjp = jax.vjp(lambda xi: _conv7s2(xi, w.astype(x.dtype)), x)
    dx = conv_x_vjp(dxc)[0].astype(x.dtype)

    # dgamma = sum(dy*xhat), dbeta = sum(dy): the same grid scalars
    return dw, sum_dyx.astype(gamma.dtype), sum_dy.astype(beta.dtype), dx


fused_stem_train.defvjp(_fwd, _bwd)
