"""Opt-in real-weight smoke test: CLIP ViT-B/32 FINE-TUNE anomaly detection.

Completes the acceptance-config coverage that zero_shot_smoke.py started
(BASELINE.md: "CLIP fine-tune ImageNet-30 — 80 ep, lr 1e-4, wd 1e-3,
SGD+nesterov"; reference train_clip_imagenet.py:8-21 /
train_clip_cifar.py:8-21): loads the real OpenAI checkpoint, fine-tunes a
few epochs on one (or more) classes with the reference's transform pipeline
and optimizer settings, and prints the loss + train-AUC trajectory and the
final eval AUROC as one JSON line for PARITY.md §6.

    EOE_TPU_CLIP_CHECKPOINT=/path/to/ViT-B-32.pt \
        python experiments/finetune_smoke.py --dataset imagenet30 \
            --datapath /path/to/data [--epochs 5] [--classes 0]

Skips cleanly (exit 0, message) when the checkpoint or the dataset/OE
archives are absent — the session this framework is built in has zero
network egress.
"""

import argparse
import json
import os
import os.path as pt
import sys

sys.path.insert(0, pt.dirname(pt.dirname(pt.abspath(__file__))))

# per-dataset acceptance defaults (reference runner set_defaults blocks)
CONFIGS = {
    "imagenet30": dict(
        ds_key="imagenet", oe="imagenet21ksubset", lr=1e-4,
        train_specs=[{"op": "resize", "size": 256},
                     {"op": "color_jitter", "brightness": 0.01, "contrast": 0.01,
                      "saturation": 0.01, "hue": 0.01},
                     {"op": "random_crop", "size": 224},
                     {"op": "random_hflip", "p": 0.5},
                     {"op": "clip_pil_preprocessing"},
                     {"op": "gaussian_noise", "std": 0.001},
                     {"op": "clip_tensor_preprocessing"}],
        markers=(pt.join("imagenet_ad", "train"),),
        oe_markers=(pt.join("imagenet21k_subset",),
                    pt.join("imagenet22k", "fall11_whole_extracted"))),
    "cifar10": dict(
        ds_key="cifar10", oe="cifar100", lr=2e-5,
        train_specs=[{"op": "resize", "size": 32},
                     {"op": "color_jitter", "brightness": 0.01, "contrast": 0.01,
                      "saturation": 0.01, "hue": 0.01},
                     {"op": "random_crop", "size": 32, "padding": 4},
                     {"op": "random_hflip", "p": 0.5},
                     {"op": "clip_pil_preprocessing"},
                     {"op": "gaussian_noise", "std": 0.001},
                     {"op": "clip_tensor_preprocessing"}],
        markers=(pt.join("cifar10", "cifar-10-batches-py"),
                 pt.join("cifar10", "cifar-10-python.tar.gz")),
        oe_markers=(pt.join("cifar100", "cifar-100-python"),
                    pt.join("cifar100", "cifar-100-python.tar.gz"))),
}


def main(argv=None, clip_parts=None):
    """``clip_parts``: optional (ClipConfig, variables) injection so CI can
    exercise the full plumbing with a tiny random CLIP instead of the real
    checkpoint (tests/test_clip.py::test_finetune_smoke_plumbing)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--datapath", default=pt.join(pt.dirname(pt.dirname(
        pt.abspath(__file__))), "eoe_tpu", "data", "datasets"))
    ap.add_argument("--dataset", default="imagenet30", choices=sorted(CONFIGS))
    ap.add_argument("--oe-dataset", default=None,
                    help="override the config's OE dataset (e.g. imagenet21k)")
    ap.add_argument("--classes", type=int, nargs="+", default=[0])
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--ad-mode", default="one_vs_rest",
                    choices=["one_vs_rest", "leave_one_out"])
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--logpath", default="/tmp/eoe_tpu_finetune")
    args = ap.parse_args(argv)
    cfg = CONFIGS[args.dataset]

    from eoe_tpu.training.clip import _resolve_checkpoint

    ckpt = None
    if clip_parts is None:
        ckpt = _resolve_checkpoint(None)
        if ckpt is None:
            print("SKIP: no CLIP checkpoint (set EOE_TPU_CLIP_CHECKPOINT or place "
                  "the OpenAI ViT-B/32 weights at ~/.cache/clip/ViT-B-32.pt)")
            return 0
    raw = args.datapath
    fake = os.environ.get("EOE_TPU_FAKE_DATA") == "1"
    if not fake and not any(pt.exists(pt.join(raw, m)) for m in cfg["markers"]):
        print(f"SKIP: no {args.dataset} data under {raw} (expected one of "
              f"{cfg['markers']}; see eoe_tpu.main.prepare_data)")
        return 0
    oe = args.oe_dataset or cfg["oe"]
    if not fake and oe == cfg["oe"] and not any(
            pt.exists(pt.join(raw, m)) for m in cfg["oe_markers"]):
        print(f"SKIP: no {oe} OE data under {raw} (expected one of "
              f"{cfg['oe_markers']}; see eoe_tpu.main.prepare_data)")
        return 0

    from eoe_tpu.training.clip import ClipTrainer
    from eoe_tpu.utils.logger import Logger

    logger = Logger(args.logpath, comment=f"finetune_{args.dataset}")
    kw = (dict(checkpoint_path=ckpt) if clip_parts is None
          else dict(clip_config=clip_parts[0], clip_variables=clip_parts[1]))
    trainer = ClipTrainer(
        model=None, train_specs=cfg["train_specs"], test_specs=[],
        dataset=cfg["ds_key"], oe_dataset=oe, datapath=raw, logger=logger,
        epochs=args.epochs, lr=cfg["lr"], wdk=1e-3, milestones=[],
        batch_size=args.batch_size, ad_mode=args.ad_mode, **kw)
    _, results = trainer.run(args.classes, run_seeds=1)

    # the per-epoch loss / train-AUC trajectory lands in the logger's scalar
    # store (and scalars.json / tensorboard on disk)
    loss_traj = {k: [v for _, v in vals] for k, vals in logger._scalars.items()
                 if k.startswith("training_cls") and k.endswith("_loss")}
    auc_traj = {k: [round(v, 2) for _, v in vals]
                for k, vals in logger._scalars.items() if "AUC" in k}
    print(json.dumps({
        "smoke": f"CLIP ViT-B/32 fine-tune {args.dataset} {args.ad_mode}",
        "checkpoint": ckpt, "epochs": args.epochs, "oe_dataset": oe,
        "loss_trajectory": loss_traj, "train_auc_trajectory": auc_traj,
        "mean_auc": results["mean_auc"], "cls_aucs": results["cls_aucs"],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
