"""A/B microbench: monolithic-block vs per-group-grid fused attention.

Times the fused QKV attention kernel (forward, and forward+backward) at the
CLIP ViT-B/32 bench shape on the real chip, with EOE_TPU_ATTN_GROUP_GRID
toggled in-process (the flag is a module global read at trace time, so two
separately-jitted closures pick up the two variants). 12 layers' worth of
calls are chained per timed iteration to amortize dispatch, mirroring how the
encoder invokes the kernel.

Usage: python experiments/attn_group_bench.py [--n 256] [--s 50] [--reps 30]
"""

import argparse
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from eoe_tpu.ops import attention as A


def _timed(fn, *args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--s", type=int, default=50)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    D = args.heads * args.d
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((args.n, args.s, 3 * D)) * 0.1,
                      jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((args.n, args.s, D)) * 0.1,
                    jnp.bfloat16)

    results = {}
    for variant in (False, True):
        A.GROUP_GRID = variant
        name = "group-grid" if variant else "monolithic"

        @jax.jit
        def fwd(x):
            o = x
            for _ in range(args.layers):
                o = A.fused_qkv_attention(
                    jnp.concatenate([o, o, o], -1)[:, :, :3 * D]
                    if o.shape[-1] != 3 * D else o, args.heads)
                o = jnp.concatenate([o, o, o], -1)
            return o

        @jax.jit
        def step(x):
            def loss(x):
                o = x
                for _ in range(args.layers):
                    a = A.fused_qkv_attention(o, args.heads)
                    o = jnp.concatenate([a, a, a], -1).astype(x.dtype)
                return (o.astype(jnp.float32) * g.repeat(3, -1)
                        [:, :, :3 * D]).sum()
            return jax.grad(loss)(x)

        t_fwd = _timed(
            jax.jit(lambda x: A.fused_qkv_attention(x, args.heads)), qkv,
            reps=args.reps)
        t_step = _timed(step, qkv, reps=args.reps)
        per_layer_bwd = (t_step / args.layers) * 1e3
        results[name] = (t_fwd * 1e3, per_layer_bwd)
        print(f"{name:11s}: fwd {t_fwd*1e3:7.3f} ms/call | "
              f"fwd+bwd chain {t_step*1e3:8.3f} ms "
              f"({per_layer_bwd:6.3f} ms/layer)")

    mono, grp = results["monolithic"], results["group-grid"]
    print(f"speedup: fwd x{mono[0]/grp[0]:.3f}, chain x{mono[1]/grp[1]:.3f}")


if __name__ == "__main__":
    main()
