"""Benchmark the vmapped evolutionary fitness evaluation against the
reference-style sequential per-individual loop.

The reference trains ONE candidate per full run inside the GA hot loop
(reference evolve/__init__.py:55-78: population x generations sequential
trainings). This framework's `--ev-vmap` path trains a whole chunk of
candidates as one vmapped program (eoe_tpu/evolve/vmapped.py). This script
measures both on the same synthetic CIFAR-scale setup and prints the
steady-state speedup — the number PARITY.md quotes for the BASELINE.json
north star ("evolutionary single-OE-sample search vectorized via vmap").

Usage:  EOE_TPU_FAKE_DATA=1 python experiments/evolve_bench.py
        [--pop 8] [--epochs 5] [--iterations 2] [--rounds 2]

`--rounds 2` (default) times two rounds and reports the second (the first
pays one-time compiles; the GA reuses the compiled programs for all
generations, so steady state is what the search actually experiences).
"""

import argparse
import os
import os.path as pt
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, pt.dirname(pt.dirname(pt.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--iterations", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--oesize", type=int, default=1)
    args = ap.parse_args(argv)
    assert args.rounds >= 1 and args.pop >= 1 and args.oesize >= 1
    os.environ.setdefault("EOE_TPU_FAKE_DATA", "1")
    workdir = tempfile.mkdtemp(prefix="eoe_evolve_bench_")

    from eoe_tpu.evolve import ensure_valid_indices, evaluate_individual
    from eoe_tpu.evolve.vmapped import VmappedEvaluator
    from eoe_tpu.main import evolve_trainer
    from eoe_tpu.models.cnn import CNN32

    rng = np.random.default_rng(0)

    def build(tag):
        trainer, oeds, _ = evolve_trainer(
            "hsc", "", "cifar10", "cifar100", args.epochs, 1e-3, 0.0, [], 128,
            "one_vs_rest", None, CNN32(rep_dim=256), [{"op": "random_hflip"},
                                                      "normalize"], ["normalize"],
            classes=[0], dataset_path=pt.join(workdir, "data"),
            superdir=pt.join(workdir, tag))
        trainer.logger.active = False
        return trainer, oeds

    ev_args = argparse.Namespace(classes=[0], iterations=args.iterations)

    # ---- vmapped: the whole population as one chunk
    trainer, oeds = build("vmapped")
    ensure_valid_indices(oeds)
    n_oe = len(oeds.valid_indices)
    pops = [[[int(rng.integers(0, n_oe)) for _ in range(args.oesize)]
             for _ in range(args.pop)] for _ in range(args.rounds)]
    ev = VmappedEvaluator(trainer, ev_args, chunk=args.pop)
    t_vmap = []
    for pop in pops:
        t0 = time.perf_counter()
        fits = ev.evaluate_population(pop)
        t_vmap.append(time.perf_counter() - t0)
        assert len(fits) == args.pop and all(np.isfinite(f) for f in fits)
    print(f"vmapped rounds: {[f'{t:.1f}s' for t in t_vmap]}")

    # ---- sequential: one full trainer.run per individual (reference shape)
    trainer, oeds = build("sequential")
    ensure_valid_indices(oeds)
    t_seq = []
    for pop in pops:
        t0 = time.perf_counter()
        for ind in pop:
            evaluate_individual(list(ind), trainer, ev_args, None)
        t_seq.append(time.perf_counter() - t0)
    print(f"sequential rounds: {[f'{t:.1f}s' for t in t_seq]}")

    v, s = t_vmap[-1], t_seq[-1]
    print(f"steady-state: vmapped {v:.1f}s vs sequential {s:.1f}s for "
          f"{args.pop} candidates x {args.iterations} seeds x {args.epochs} "
          f"epochs -> {s / v:.1f}x")


if __name__ == "__main__":
    main()
