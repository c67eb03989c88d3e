"""Measure seed-vmapped grid training vs the sequential seed loop.

PARITY.md's round-2 number (1.30x for 8 CNN32 seeds) eroded from 1.52x when
the sequential path gained transfer packing. This script times both paths
end-to-end (train + eval, the user-visible grid cost) with phase timestamps
so the gap is attributable, and prints one JSON line.

Usage: python experiments/profile_vmap_seeds.py [--seeds 8] [--epochs 5]
"""

import argparse
import json
import os.path as pt
import sys
import time

import numpy as np

sys.path.insert(0, pt.dirname(pt.dirname(pt.abspath(__file__))))


def run(n_seeds: int, epochs: int, vmap: bool) -> dict:
    import jax.random as jrandom  # noqa: F401  (jax init)

    import bench
    from eoe_tpu.utils.logger import Logger

    trainer, ds = bench.build_trainer("cnn32", Logger("/tmp/eoe_vmap_prof", active=False))
    trainer.epochs = epochs
    trainer.ds = ds
    t0 = time.time()
    _, res = trainer.run(run_classes=[0], run_seeds=n_seeds, vmap_seeds=vmap)
    wall = time.time() - t0
    return {"wall_s": round(wall, 2), "mean_auc": res.get("mean_auc")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=5)
    args = ap.parse_args()

    from eoe_tpu.main import _enable_compile_cache
    _enable_compile_cache()

    # order: vmapped first so both paths pay their own compile; report the
    # second run of each (warm caches) as the steady-state figure
    results = {}
    for name, vmap in (("vmapped", True), ("sequential", False)):
        cold = run(args.seeds, args.epochs, vmap)
        warm = run(args.seeds, args.epochs, vmap)
        results[name] = {"cold": cold, "warm": warm}
        print(f"{name}: cold {cold['wall_s']}s warm {warm['wall_s']}s", flush=True)

    speedup = results["sequential"]["warm"]["wall_s"] / results["vmapped"]["warm"]["wall_s"]
    print(json.dumps({"metric": f"seed-vmap speedup ({args.seeds} CNN32 seeds, "
                                f"{args.epochs} epochs, train+eval)",
                      "value": round(speedup, 2), "unit": "x",
                      "detail": results}))


if __name__ == "__main__":
    main()
