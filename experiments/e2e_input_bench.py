"""End-to-end input-pipeline benchmark: JPEG folder vs preprocessed blob vs
synthetic-resident, feeding the REAL training step.

VERDICT r3 item 3: the raw-JPEG input path measured ~3.5k img/s and could
not feed the CLIP chip rate (~4.6k). This script quantifies the whole
ladder on one chip, using the actual ImageNet-30-shaped loaders:

  folder     — imagenet_ad tree of real JPEG files, FolderSource decode
               (native C++ batch decoder), RAM-cache/resident promotion
  blob       — same tree after `prepare_data --blob-resolution` (memmap
               array shards; loaders prefer them automatically)
  synthetic  — ArraySource of in-RAM arrays (the bench.py upper bound)

For each it reports epoch-1 (pays decode/page-in) and steady-state img/s
plus total wall time. Without --datapath it synthesizes a JPEG tree in a
temp dir, so it runs in the egress-less build environment too.

Usage:  python experiments/e2e_input_bench.py [--model clip|wrn|cnn32]
            [--n 2048] [--epochs 4] [--datapath DIR] [--variants a,b,...]
"""

import argparse
import json
import os
import os.path as pt
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, pt.dirname(pt.dirname(pt.abspath(__file__))))


def synth_tree(root: str, n_normal: int, n_oe: int, hw: int, seed: int = 0):
    """An imagenet_ad-shaped JPEG tree + a 21k-subset OE folder: class 0
    carries the train split (n_normal images), every class has val images."""
    from PIL import Image

    from eoe_tpu.datasets.imagenet import AD_CLASSES

    rng = np.random.default_rng(seed)

    def write(path, arr):
        os.makedirs(pt.dirname(path), exist_ok=True)
        Image.fromarray(arr).save(path, quality=90)

    for i in range(n_normal):
        write(pt.join(root, "imagenet_ad", "train", AD_CLASSES[0], f"{i:06d}.jpg"),
              rng.integers(0, 256, (hw, hw, 3), np.uint8))
    for cls in AD_CLASSES[1:]:
        for i in range(2):
            write(pt.join(root, "imagenet_ad", "train", cls, f"{i}.jpg"),
                  rng.integers(0, 256, (hw, hw, 3), np.uint8))
    for cls in AD_CLASSES:
        for i in range(4):
            write(pt.join(root, "imagenet_ad", "val", cls, f"{i}.jpg"),
                  rng.integers(0, 256, (hw, hw, 3), np.uint8))
    for w in ("n90000001", "n90000002"):
        for i in range(n_oe // 2):
            write(pt.join(root, "imagenet21k_subset", w, f"{i:06d}.jpg"),
                  rng.integers(0, 256, (hw, hw, 3), np.uint8))


def build_trainer(model_kind: str, train_specs, test_specs, epochs: int):
    import jax.numpy as jnp

    from eoe_tpu.training import Trainer
    from eoe_tpu.utils.logger import Logger

    if model_kind == "clip":
        from eoe_tpu.models.clip import CLIP, VIT_B32
        model, dtype = CLIP(VIT_B32, dtype=jnp.bfloat16), jnp.bfloat16
    elif model_kind == "wrn":
        from eoe_tpu.models.resnet import WideResNet
        model, dtype = WideResNet(), jnp.bfloat16
    else:
        from eoe_tpu.models.cnn import CNN32
        model, dtype = CNN32(), jnp.float32
    return Trainer(
        model=model, objective="hsc", train_specs=train_specs,
        test_specs=test_specs, dataset="imagenet",
        oe_dataset="imagenet21ksubset", datapath="",  # ds is pinned below
        logger=Logger("/tmp/eoe_tpu_e2e", active=False), epochs=epochs,
        lr=1e-4, wdk=1e-3, milestones=[], batch_size=128, compute_dtype=dtype)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="clip", choices=["clip", "wrn", "cnn32"])
    ap.add_argument("--n", type=int, default=2048, help="train/OE images")
    ap.add_argument("--hw", type=int, default=256, help="raw JPEG resolution")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--datapath", default=None,
                    help="existing data root (default: synthesize a JPEG tree)")
    ap.add_argument("--variants", default="folder,blob,synthetic")
    args = ap.parse_args(argv)

    from eoe_tpu.main import _enable_compile_cache
    _enable_compile_cache()

    import jax.random as jrandom

    from eoe_tpu.datasets import load_dataset
    from eoe_tpu.datasets.folder import blob_path, build_blob

    root = args.datapath
    tmp = None
    if root is None:
        tmp = tempfile.mkdtemp(prefix="eoe_e2e_")
        print(f"synthesizing {args.n}+{args.n} JPEGs at {args.hw}^2 under {tmp}...",
              flush=True)
        synth_tree(tmp, args.n, args.n, args.hw)
        root = tmp

    hw = args.hw
    if args.model == "clip":
        train_specs = [
            {"op": "resize", "size": hw},
            {"op": "color_jitter", "brightness": 0.01, "contrast": 0.01,
             "saturation": 0.01, "hue": 0.01},
            {"op": "random_crop", "size": 224},
            {"op": "random_hflip", "p": 0.5},
            {"op": "clip_pil_preprocessing"},
            {"op": "gaussian_noise", "std": 0.001},
            {"op": "clip_tensor_preprocessing"}]
        test_specs = [{"op": "clip_pil_preprocessing"},
                      {"op": "clip_tensor_preprocessing"}]
    elif args.model == "wrn":
        train_specs = [{"op": "resize", "size": hw}, {"op": "random_hflip", "p": 0.5},
                       {"op": "random_crop", "size": 224}, "normalize"]
        test_specs = [{"op": "resize", "size": hw},
                      {"op": "center_crop", "size": 224}, "normalize"]
    else:  # cnn32: CPU-friendly plumbing variant (fixed 32^2 input)
        train_specs = [{"op": "resize", "size": 32}, {"op": "random_hflip", "p": 0.5},
                       "normalize"]
        test_specs = [{"op": "resize", "size": 32}, "normalize"]

    # the loaders' raw shape = the first resize in the train specs; blobs
    # must be built at exactly that resolution to be picked up
    raw = 32 if args.model == "cnn32" else hw
    folders = [pt.join(root, "imagenet_ad", "train"),
               pt.join(root, "imagenet_ad", "val"),
               pt.join(root, "imagenet21k_subset")]

    def clear_blobs():
        for f in folders:
            for suffix in ("", ".json"):
                p = blob_path(f, (raw, raw)) + suffix
                if pt.exists(p):
                    os.remove(p)

    results = {}
    for variant in args.variants.split(","):
        if variant == "blob":
            t0 = time.time()
            for f in folders:
                if not pt.exists(blob_path(f, (raw, raw))):
                    build_blob(f, (raw, raw))
            print(f"blob build: {time.time() - t0:.1f}s", flush=True)
        elif variant == "folder":
            clear_blobs()

        trainer = build_trainer(args.model, train_specs, test_specs, args.epochs)
        if variant == "synthetic":
            from eoe_tpu.datasets.bases import (ArraySource, CombinedDataset,
                                                GenericADDataset)
            rng = np.random.default_rng(0)
            xtr = rng.integers(0, 256, (args.n, raw, raw, 3), np.uint8)
            xoe = rng.integers(0, 256, (args.n, raw, raw, 3), np.uint8)
            kw = dict(root="", train_specs=train_specs, test_specs=test_specs,
                      n_classes=2, raw_shape=(raw, raw, 3))
            nt = min(128, args.n)
            normal = GenericADDataset(
                ArraySource(xtr, np.zeros(args.n, np.int64)),
                ArraySource(xtr[:nt], np.zeros(nt, np.int64)),
                normal_classes=(0,), nominal_label=0, **kw)
            oe = GenericADDataset(ArraySource(xoe, np.ones(args.n, np.int64)), None,
                                  normal_classes=(1,), nominal_label=1, **kw)
            ds = CombinedDataset(normal, oe)
        else:
            from eoe_tpu.datasets.folder import _SCAN_CACHE
            _SCAN_CACHE.clear()  # variants change what's on disk
            ds = load_dataset("imagenet", root, [0], 0, train_specs, test_specs,
                              None, "imagenet21ksubset",
                              rng=np.random.default_rng(0))
            src = ds.normal.train_set.source
            print(f"{variant}: train source = {type(src).__name__}", flush=True)

        t0 = time.time()
        trainer.train_cls(ds, 0, "e2e", 0, jrandom.key(0))
        wall = time.time() - t0
        rates = trainer.epoch_rates
        steady = float(np.median(rates[2:] or rates[-1:]))
        results[variant] = {"epoch1": round(rates[0], 1),
                            "steady": round(steady, 1),
                            "wall_s": round(wall, 1)}
        print(f"{variant:>10}: epoch1 {rates[0]:7.1f} img/s, steady "
              f"{steady:7.1f} img/s, wall {wall:.1f}s", flush=True)
        del ds, trainer

    if "synthetic" in results:
        ref = results["synthetic"]["steady"]
        for v, r in results.items():
            if v != "synthetic" and ref:
                print(f"{v:>10}: steady = {r['steady'] / ref * 100:.1f}% of "
                      f"synthetic-resident", flush=True)
    print(json.dumps({"model": args.model, "n": args.n, "hw": args.hw,
                      "epochs": args.epochs, "results": results}))
    if tmp is not None:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
