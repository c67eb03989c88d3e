"""Opt-in real-data smoke test: evolutionary single-OE-sample search.

Completes the acceptance-config coverage (BASELINE.md config 5, reference
evolve_oe_cifar.py:19-41 defaults: pop 64, 50 generations, 30 epochs,
2 seeds): runs the REAL GA driver (eoe_tpu.main.evolve_oe_{cifar,imagenet})
for a couple of generations at smoke scale on real data, and prints the
per-generation fitness history plus the best individual as one JSON line
for PARITY.md. evolve_bench.py measures the vmapped-fitness speedup on
synthetic data; this script proves the end-to-end search runs on the actual
datasets.

    python experiments/evolve_smoke.py --dataset cifar10 \
        --datapath /path/to/data [--generations 2] [--pop 4] [--epochs 2]

Skips cleanly (exit 0, message) when the dataset or OE archives are absent —
the session this framework is built in has zero network egress.
"""

import argparse
import json
import os
import os.path as pt
import sys
import tempfile

sys.path.insert(0, pt.dirname(pt.dirname(pt.abspath(__file__))))

# on-disk markers mirror the loaders' layouts (datasets/cifar.py,
# datasets/tinyimages.py, datasets/imagenet.py)
CONFIGS = {
    "cifar10": dict(
        runner="evolve_oe_cifar",
        markers=(pt.join("cifar10", "cifar-10-batches-py"),
                 pt.join("cifar10", "cifar-10-python.tar.gz")),
        oe_markers={"tinyimages": (pt.join("tinyimages", "tiny_images.bin"),),
                    "cifar100": (pt.join("cifar100", "cifar-100-python"),
                                 pt.join("cifar100", "cifar-100-python.tar.gz"))}),
    "imagenet30": dict(
        runner="evolve_oe_imagenet",
        markers=(pt.join("imagenet_ad", "train"),),
        oe_markers={"imagenet21ksubset": (pt.join("imagenet21k_subset",),),
                    "imagenet21k": (pt.join("imagenet22k",
                                            "fall11_whole_extracted"),)}),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--datapath", default=pt.join(pt.dirname(pt.dirname(
        pt.abspath(__file__))), "eoe_tpu", "data", "datasets"))
    ap.add_argument("--dataset", default="cifar10", choices=sorted(CONFIGS))
    ap.add_argument("--oe-dataset", default=None,
                    help="override the runner's default OE dataset "
                         "(cifar10: tinyimages|cifar100; imagenet30: "
                         "imagenet21ksubset|imagenet21k)")
    ap.add_argument("--generations", type=int, default=2)
    ap.add_argument("--pop", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--iterations", type=int, default=1)
    ap.add_argument("--classes", type=int, nargs="+", default=[0])
    ap.add_argument("--no-vmap", action="store_true",
                    help="use the sequential per-individual fitness path")
    ap.add_argument("--logpath", default=None)
    args = ap.parse_args(argv)
    cfg = CONFIGS[args.dataset]

    fake = os.environ.get("EOE_TPU_FAKE_DATA") == "1"
    raw = args.datapath
    if not fake and not any(pt.exists(pt.join(raw, m)) for m in cfg["markers"]):
        print(f"SKIP: no {args.dataset} data under {raw} (expected one of "
              f"{cfg['markers']}; see eoe_tpu.main.prepare_data)")
        return 0
    oe = args.oe_dataset or next(iter(cfg["oe_markers"]))
    oe_markers = cfg["oe_markers"].get(oe)
    if not fake and oe_markers is not None and not any(
            pt.exists(pt.join(raw, m)) for m in oe_markers):
        print(f"SKIP: no {oe} OE data under {raw} (expected one of "
              f"{oe_markers}; see eoe_tpu.main.prepare_data)")
        return 0

    import importlib
    runner = importlib.import_module(f"eoe_tpu.main.{cfg['runner']}")
    logpath = args.logpath or tempfile.mkdtemp(prefix="eoe_evolve_smoke_")
    argv = ["--datapath", raw, "--superdir", logpath,
            "--classes", *[str(c) for c in args.classes],
            "-e", str(args.epochs), "-it", str(args.iterations),
            "--oe-dataset", oe,
            "--ev-generations", str(args.generations),
            "--ev-generation-pool", str(args.pop),
            "--ev-mutation-pool", "100", "--ev-mutation-oneofkbest", "3"]
    if not args.no_vmap:
        argv.append("--ev-vmap")
    history, tree = runner.main(argv)

    best = tree.topk(1, best=True)
    print(json.dumps({
        "smoke": f"evolutionary OE search {args.dataset} (+{oe})",
        "generations": args.generations, "pop": args.pop,
        "epochs": args.epochs, "vmap": not args.no_vmap,
        "mean_fitness_per_gen": [round(f, 4) for f in history["mean_fit"]],
        "max_fitness_per_gen": [round(f, 4) for f in history["max_fit"]],
        "best": {"indices": list(best[0].content.values),
                 "fitness": best[0].content.fitness} if best else None,
        "logdir": logpath,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
