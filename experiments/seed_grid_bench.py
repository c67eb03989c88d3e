"""End-to-end seed-grid benchmark: vmapped vs sequential (VERDICT r3 item 5 /
r4 item 6). Runs the FULL ``Trainer.run`` grid — training, eval, snapshots,
plots — for one class x N seeds both ways and reports wall-clock, so the
quoted speedup includes every fixed cost the vmapped path amortizes (packed
init/plan uploads, vmapped eval, packed snapshot download).

Usage: python experiments/seed_grid_bench.py [--seeds 8] [--epochs 50]
"""

import argparse
import os
import os.path as pt
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, pt.dirname(pt.dirname(pt.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n", type=int, default=2048, help="train images per split")
    args = ap.parse_args()

    from eoe_tpu.main import _enable_compile_cache
    _enable_compile_cache()
    import bench
    from eoe_tpu.utils.logger import Logger

    os.environ.setdefault("EOE_TPU_BENCH_N", str(args.n))
    os.environ["EOE_TPU_BENCH_EPOCHS"] = str(args.epochs)
    os.environ["EOE_TPU_BENCH_B"] = str(args.batch)

    results = {}
    for mode, vmap in (("vmapped", True), ("sequential", False)):
        root = f"/tmp/eoe_seed_grid_{mode}"
        shutil.rmtree(root, ignore_errors=True)
        trainer, ds = bench.build_trainer("cnn32", Logger(root, noname=True,
                                                          archive_source=False))
        trainer.epochs = args.epochs
        # warmup run compiles everything (1 seed vmapped still traces the
        # K-seed program? no — shapes differ; time the cold+warm pair and
        # report the warm second run)
        for rep in range(2):
            t0 = time.time()
            _, res = trainer.run(run_classes=[0], run_seeds=args.seeds,
                                 vmap_seeds=vmap)
            dt = time.time() - t0
            results[(mode, rep)] = (dt, res["mean_auc"])
            print(f"{mode} rep{rep}: {dt:.1f}s wall, mean AUC {res['mean_auc']:.4f}",
                  flush=True)
    warm_v = results[("vmapped", 1)][0]
    warm_s = results[("sequential", 1)][0]
    print(f"\nend-to-end {args.seeds}-seed {args.epochs}-epoch grid (warm): "
          f"vmapped {warm_v:.1f}s vs sequential {warm_s:.1f}s = "
          f"{warm_s / warm_v:.2f}x")
    print(f"cold (incl. compile): vmapped {results[('vmapped', 0)][0]:.1f}s vs "
          f"sequential {results[('sequential', 0)][0]:.1f}s")


if __name__ == "__main__":
    main()
