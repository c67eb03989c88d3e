"""WRN stem backward study (VERDICT r3 item 1).

The WideResNet@224 stem — conv7x7 s2 (3->64) -> BN -> ReLU -> maxpool3x3 s2
— costs ~5.7ms of the 37.1ms train step in backward (PARITY.md: stem dW
1.74ms, select-and-scatter maxpool backward 1.73ms, BN chain ~2.3ms), all
bandwidth-bound on the 411MB dense 112^2 gradient. This script measures a
ladder of fused-backward formulations on the real chip:

  baseline   — jax.grad through the plain stem (XLA's pieces: the current
               production path).
  gridstats  — custom_vjp exploiting pool sparsity: dy = pool_bwd(g) is
               nonzero only at argmax positions, so every BN-backward
               reduction collapses onto the 56^2 grid:
                 sum(dy)      = sum(g * [M > 0])
                 sum(dy*x_hat) = sum(g * [M > 0] * (M - beta)/gamma)
               (M = pooled output; at the argmax, y = M = gamma*x_hat + beta).
               The dense dy still comes from select-and-scatter, but the
               411MB reduction passes over it disappear and the remaining
               elementwise chain fuses into the dW conv's input.
  paritygather — gridstats + the select-and-scatter replaced by a GATHER
               formulation: a (value << 14 | reverse-linear-index) s32 key
               makes reduce_window_max return the FIRST argmax exactly
               (torch tie semantics); each 112^2 pixel then collects from
               its <=4 covering windows, built as four dense parity planes
               interleaved by reshape — no scatter, no interleaved updates
               (ops/pool.py's negative used scatter-style tap adds).

Each variant is verified against autodiff gradients before timing (atol
checks on the actual bench shapes). Timing: chained fori_loop on device,
median of repeats — per-call wall timings through the tunnel are unreliable.

Usage: python experiments/stem_study.py [--n 256] [--iters 20]
"""

import argparse
import functools
import os.path as pt
import sys
import time

import numpy as np

sys.path.insert(0, pt.dirname(pt.dirname(pt.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

EPS = 1e-5


# ------------------------------------------------------------------ pieces


def conv7s2(x, w):
    # same-dtype conv like flax.nn.Conv(dtype=bf16); the TPU MXU accumulates
    # in f32 internally regardless
    return lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bn_relu(xc, gamma, beta):
    mu = jnp.mean(xc.astype(jnp.float32), axis=(0, 1, 2))
    var = jnp.var(xc.astype(jnp.float32), axis=(0, 1, 2))
    inv = lax.rsqrt(var + EPS)
    xhat = (xc.astype(jnp.float32) - mu) * inv
    y = gamma * xhat + beta
    return jnp.maximum(y, 0.0).astype(xc.dtype), mu, var


def maxpool3s2(y):
    return lax.reduce_window(y, np.array(-np.inf, y.dtype),
                             lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                             ((0, 0), (1, 1), (1, 1), (0, 0)))


def stem(params, x):
    w, gamma, beta = params
    xc = conv7s2(x, w)
    y, _, _ = bn_relu(xc, gamma, beta)
    return maxpool3s2(y)


def pool_bwd_sas(y, g):
    """XLA select-and-scatter via the vjp of reduce_window max."""
    _, vjp = jax.vjp(maxpool3s2, y)
    return vjp(g)[0]


# --------------------------------------------------------- fused backwards


def _bn_grid_scalars(g, M, gamma, beta, n_count):
    """BN-backward reductions on the 56^2 grid (see module docstring)."""
    gm = g.astype(jnp.float32) * (M > 0)
    sum_dy = gm.sum(axis=(0, 1, 2))
    xhat_max = (M.astype(jnp.float32) - beta) / gamma
    sum_dyx = (gm * xhat_max).sum(axis=(0, 1, 2))
    return sum_dy, sum_dyx


def _dx_from_dy(dy, xc, mu, var, gamma, sum_dy, sum_dyx, n_count):
    inv = lax.rsqrt(var + EPS)
    xhat = (xc.astype(jnp.float32) - mu) * inv
    dxc = (gamma * inv) * (dy.astype(jnp.float32) - sum_dy / n_count
                           - xhat * (sum_dyx / n_count))
    return dxc.astype(xc.dtype)


def _dw_from_dx(x, dxc):
    """dW of conv7s2 via the conv vjp (the reduction-shaped dW GEMM)."""
    w_shape = (7, 7, x.shape[-1], dxc.shape[-1])
    _, vjp = jax.vjp(lambda w: conv7s2(x, w),
                     jnp.zeros(w_shape, x.dtype))
    return vjp(dxc)[0]


def make_stem_gridstats():
    @jax.custom_vjp
    def stem_g(params, x):
        return stem(params, x)

    def fwd(params, x):
        w, gamma, beta = params
        xc = conv7s2(x, w)
        y, mu, var = bn_relu(xc, gamma, beta)
        out = maxpool3s2(y)
        return out, (params, x, xc, y, mu, var, out)

    def bwd(res, g):
        (w, gamma, beta), x, xc, y, mu, var, M = res
        n_count = y.shape[0] * y.shape[1] * y.shape[2]
        sum_dy, sum_dyx = _bn_grid_scalars(g, M, gamma, beta, n_count)
        dy = pool_bwd_sas(y, g)  # relu mask folds in: y==0 windows get M<=0
        dy = jnp.where(y > 0, dy, 0)
        dxc = _dx_from_dy(dy, xc, mu, var, gamma, sum_dy, sum_dyx, n_count)
        dw = _dw_from_dx(x, dxc)
        # dgamma = sum(dy * xhat), dbeta = sum(dy) — both grid scalars
        return (dw, sum_dyx, sum_dy), jnp.zeros_like(x)

    stem_g.defvjp(fwd, bwd)
    return stem_g


def _pool_key(y):
    """s32 key whose reduce_window max == (max value, FIRST index) — exact
    torch tie semantics. Post-ReLU y >= 0, so bf16/f16 bit patterns order
    monotonically as unsigned ints."""
    n, h, w, c = y.shape
    if y.dtype == jnp.bfloat16:
        bits = lax.bitcast_convert_type(y, jnp.uint16).astype(jnp.int32)
    else:  # f32: use the top 16 mantissa+exponent bits (monotone for >= 0)
        bits = lax.shift_right_logical(
            lax.bitcast_convert_type(y, jnp.uint32),
            jnp.uint32(16)).astype(jnp.int32)
    lin = (jnp.arange(h)[:, None] * w + jnp.arange(w)[None, :]).astype(jnp.int32)
    return (bits << 14) | (16383 - lin)[None, :, :, None]


def pool_bwd_gather(y, g):
    """First-argmax maxpool backward, gather-formulated: four dense parity
    planes (even/odd input rows x cols) interleaved by reshape."""
    n, h, w, c = y.shape
    oh, ow = g.shape[1], g.shape[2]
    key = _pool_key(y)
    W = lax.reduce_window(key, jnp.int32(-1), lax.max,
                          (1, 3, 3, 1), (1, 2, 2, 1),
                          ((0, 0), (1, 1), (1, 1), (0, 0)))
    gf = g.astype(jnp.float32)
    # pad window grids by 1 so odd rows/cols can reference oy in {-1..oh}
    Wp = jnp.pad(W, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-1)
    gp = jnp.pad(gf, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # per-axis contributing window rows (padded coords: window r -> r+1):
    #   even input row i=2r   -> window row r        (one term)
    #   odd  input row i=2r+1 -> window rows r, r+1  (two terms)
    def row_slabs(parity):
        if parity == 0:  # rows 0,2,..,110 -> r = 0..55 -> padded 1..56
            return [(1, 57)]
        return [(1, 57), (2, 58)]  # rows 1,3,..,111 -> r and r+1

    def plane(pi, pj):
        k = key[:, pi::2, pj::2, :]  # (n, 56, 56, c)
        acc = 0.0
        for (r0, r1) in row_slabs(pi):
            for (c0, c1) in row_slabs(pj):
                hit = Wp[:, r0:r1, c0:c1, :] == k
                acc = acc + jnp.where(hit, gp[:, r0:r1, c0:c1, :], 0.0)
        return acc

    planes = [[plane(pi, pj) for pj in (0, 1)] for pi in (0, 1)]
    rows = [jnp.stack([planes[pi][0], planes[pi][1]], axis=3)  # (n,56,56,2,c)
            for pi in (0, 1)]
    dy = jnp.stack(rows, axis=2)  # (n, 56, 2, 56, 2, c)
    return dy.reshape(n, h, w, c).astype(g.dtype)


def make_stem_paritygather():
    base = make_stem_gridstats()

    @jax.custom_vjp
    def stem_pg(params, x):
        return stem(params, x)

    def fwd(params, x):
        w, gamma, beta = params
        xc = conv7s2(x, w)
        y, mu, var = bn_relu(xc, gamma, beta)
        out = maxpool3s2(y)
        return out, (params, x, xc, y, mu, var, out)

    def bwd(res, g):
        (w, gamma, beta), x, xc, y, mu, var, M = res
        n_count = y.shape[0] * y.shape[1] * y.shape[2]
        sum_dy, sum_dyx = _bn_grid_scalars(g, M, gamma, beta, n_count)
        dy = pool_bwd_gather(y, g)
        dy = jnp.where(y > 0, dy, 0)
        dxc = _dx_from_dy(dy, xc, mu, var, gamma, sum_dy, sum_dyx, n_count)
        dw = _dw_from_dx(x, dxc)
        return (dw, sum_dyx, sum_dy), jnp.zeros_like(x)

    stem_pg.defvjp(fwd, bwd)
    return stem_pg


# ------------------------------------------------------------------ timing


def chained_time(fn, args, iters, repeats=3):
    """Median per-iteration device time of fn under a chained fori_loop."""
    def body(_, carry):
        out = fn(*carry)
        dep = jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0
        last = carry[-1] + dep.astype(carry[-1].dtype)
        return carry[:-1] + (last,)

    @jax.jit
    def loop(*args):
        return lax.fori_loop(0, iters, body, args)

    out = loop(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(*args))
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times)) * 1000.0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args(argv)

    import os
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # a sitecustomize may have re-forced the TPU platform; honor the env
        jax.config.update("jax_platforms", "cpu")
    from eoe_tpu.main import _enable_compile_cache
    _enable_compile_cache()

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.n, 224, 224, 3)), dtype)
    w = jnp.asarray(rng.normal(scale=0.1, size=(7, 7, 3, 64)), dtype)
    gamma = jnp.ones(64, jnp.float32)
    beta = jnp.zeros(64, jnp.float32)
    params = (w, gamma, beta)
    g = jnp.asarray(rng.normal(size=(args.n, 56, 56, 64)), dtype)

    variants = {
        "baseline": stem,
        "gridstats": make_stem_gridstats(),
        "paritygather": make_stem_paritygather(),
    }

    def make_grad(f):
        return jax.jit(lambda p, x, g: jax.vjp(lambda p: f(p, x), p)[1](g)[0])

    # ---- correctness vs autodiff at the real shape
    ref = make_grad(stem)(params, x, g)
    print("verifying fused backwards vs autodiff...", flush=True)
    for name in ("gridstats", "paritygather"):
        got = make_grad(variants[name])(params, x, g)
        for a, b, tag in zip(got, ref, ("dw", "dgamma", "dbeta")):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            scale = max(np.abs(b).max(), 1e-6)
            err = np.abs(a - b).max() / scale
            status = "OK" if err < 2e-2 else "MISMATCH"
            print(f"  {name:>13} {tag}: rel-max-err {err:.2e} {status}", flush=True)

    # ---- piece timings for context
    print("\npieces (ms / call):", flush=True)
    y, mu, var = jax.jit(lambda xc: bn_relu(xc, gamma, beta))(conv7s2(x, w))
    gg = jnp.asarray(rng.normal(size=(args.n, 56, 56, 64)), dtype)
    print(f"  select-and-scatter pool bwd: "
          f"{chained_time(jax.jit(pool_bwd_sas), (y, gg), args.iters):7.3f}")
    print(f"  parity-gather pool bwd:      "
          f"{chained_time(jax.jit(pool_bwd_gather), (y, gg), args.iters):7.3f}")
    dxc = jnp.asarray(rng.normal(size=(args.n, 112, 112, 64)), dtype)
    print(f"  stem dW conv:                "
          f"{chained_time(jax.jit(_dw_from_dx), (x, dxc), args.iters):7.3f}")

    # ---- full fwd+bwd ladder
    print("\nstem fwd+bwd (ms / call):", flush=True)
    results = {}
    for name, f in variants.items():
        fn = make_grad(f)
        ms = chained_time(fn, (params, x, g), args.iters)
        results[name] = ms
        print(f"  {name:>13}: {ms:7.3f}", flush=True)
    base = results["baseline"]
    for name, ms in results.items():
        if name != "baseline":
            print(f"  {name:>13}: {base - ms:+7.3f} ms vs baseline "
                  f"({(base / ms - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
