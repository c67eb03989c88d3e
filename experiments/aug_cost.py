"""Attribute the device cost of each acceptance-pipeline augmentation op.

Round 4: switching bench.py from the light stack (hflip only) to the
reference acceptance stack (train_clip_imagenet.py:28-37) cost 18%
(4608 -> 3757 img/s/chip on CLIP ViT-B/32). This script isolates which op
pays: it trains the bench model on synthetic data once per pipeline variant
(full stack, then one op removed at a time) and prints the steady-state
img/s ladder for PARITY.md's augmentation appendix.

Usage:  python experiments/aug_cost.py [--model clip|wrn] [--epochs 4]
                                       [--variants full,light,...]
"""

import argparse
import json
import os
import os.path as pt
import sys

import numpy as np

sys.path.insert(0, pt.dirname(pt.dirname(pt.abspath(__file__))))

JITTER = {"op": "color_jitter", "brightness": 0.01, "contrast": 0.01,
          "saturation": 0.01, "hue": 0.01}
CROP = {"op": "random_crop", "size": 224, "resample_degenerate": True}
CROP_NOGUARD = {"op": "random_crop", "size": 224}
NOISE = {"op": "gaussian_noise", "std": 0.001}


def variants(model: str):
    if model == "clip":
        pre, post = [{"op": "clip_pil_preprocessing"}], [{"op": "clip_tensor_preprocessing"}]
        full = ([{"op": "resize", "size": 256}, JITTER, CROP,
                 {"op": "random_hflip", "p": 0.5}] + pre + [NOISE] + post)
        return {
            "full": (256, full),
            "no_jitter": (256, [s for s in full if s is not JITTER]),
            "no_noise": (256, [s for s in full if s is not NOISE]),
            "no_crop_guard": (256, [CROP_NOGUARD if s is CROP else s for s in full]),
            "no_crop": (224, [s for s in full if s is not CROP
                              and s.get("op") != "resize"]),
            "light": (224, [{"op": "random_hflip"}] + pre + post),
        }
    # wrn: reference train_imagenet.py:30-38 (jitter/noise commented out there)
    full = [{"op": "resize", "size": 256}, {"op": "random_hflip", "p": 0.5},
            CROP, "normalize"]
    return {
        "full": (256, full),
        "no_crop_guard": (256, [CROP_NOGUARD if s is CROP else s for s in full]),
        "no_crop": (224, [s for s in full if s is not CROP
                          and (isinstance(s, str) or s.get("op") != "resize")]),
        "light": (224, [{"op": "random_hflip"}, "normalize"]),
    }


def measure(model_kind: str, hw: int, train_specs, epochs: int) -> float:
    import jax.numpy as jnp
    import jax.random as jrandom

    from eoe_tpu.datasets.bases import ArraySource, CombinedDataset, GenericADDataset
    from eoe_tpu.training import Trainer
    from eoe_tpu.utils.logger import Logger

    rng = np.random.default_rng(0)
    if model_kind == "clip":
        from eoe_tpu.models.clip import CLIP, VIT_B32
        model = CLIP(VIT_B32, dtype=jnp.bfloat16)
        test_specs = [{"op": "clip_pil_preprocessing"},
                      {"op": "clip_tensor_preprocessing"}]
    else:
        from eoe_tpu.models.resnet import WideResNet
        model = WideResNet()
        test_specs = [{"op": "resize", "size": 256},
                      {"op": "center_crop", "size": 224}, "normalize"]
    N, B = 2048, 128
    xtr = rng.integers(0, 256, (N, hw, hw, 3), np.uint8)
    xoe = rng.integers(0, 256, (N, hw, hw, 3), np.uint8)
    kw = dict(root="", train_specs=train_specs, test_specs=test_specs,
              n_classes=2, raw_shape=(hw, hw, 3))
    normal = GenericADDataset(ArraySource(xtr, np.zeros(N, np.int64)),
                              ArraySource(xtr[:256], np.zeros(256, np.int64)),
                              normal_classes=(0,), nominal_label=0, **kw)
    oe = GenericADDataset(ArraySource(xoe, np.ones(N, np.int64)), None,
                          normal_classes=(1,), nominal_label=1, **kw)
    ds = CombinedDataset(normal, oe)
    trainer = Trainer(
        model=model, objective="hsc", train_specs=train_specs,
        test_specs=test_specs, dataset="cifar10", oe_dataset="cifar100",
        datapath="/tmp", logger=Logger("/tmp/eoe_tpu_augcost", active=False),
        epochs=epochs, lr=1e-4, wdk=1e-3, milestones=[], batch_size=B,
        compute_dtype=jnp.bfloat16)
    trainer.ds = ds
    trainer.train_cls(ds, 0, "augcost", 0, jrandom.key(0))
    steady = trainer.epoch_rates[2:] or trainer.epoch_rates[-1:]
    return float(np.median(steady))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=os.environ.get("EOE_TPU_BENCH_MODEL", "clip"),
                    choices=["clip", "wrn"])
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset (default: all)")
    args = ap.parse_args(argv)

    from eoe_tpu.main import _enable_compile_cache
    _enable_compile_cache()

    table = variants(args.model)
    keys = args.variants.split(",") if args.variants else list(table)
    out = {}
    for name in keys:
        hw, specs = table[name]
        rate = measure(args.model, hw, specs, args.epochs)
        out[name] = round(rate, 1)
        print(f"{name:>14}: {rate:8.1f} img/s", flush=True)
    full = out.get("full")
    if full:
        for name, rate in out.items():
            if name != "full":
                print(f"{name:>14} vs full: {rate - full:+8.1f} img/s "
                      f"({(rate / full - 1) * 100:+.1f}%)")
    print(json.dumps({"model": args.model, "epochs": args.epochs, "rates": out}))


if __name__ == "__main__":
    main()
