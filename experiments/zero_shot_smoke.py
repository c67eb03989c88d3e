"""Opt-in real-weight smoke test: zero-shot CLIP anomaly detection on CIFAR-10.

The environment this framework is built in has zero network egress, so neither
the OpenAI ViT-B/32 checkpoint nor the CIFAR-10 archive can be fetched here.
The day weights/data are present, this script makes the ±0.5 pt AUROC-parity
claim checkable against the paper's zero-shot CLIP CIFAR-10 table
(reference: /root/reference/src/eoe/training/clip.py:50-79, zero-shot =
epochs=0):

    EOE_TPU_CLIP_CHECKPOINT=/path/to/ViT-B-32.pt \
        python experiments/zero_shot_smoke.py --datapath /path/to/data

Skips cleanly (exit 0, message) when the checkpoint or the dataset archives
are absent. Record the printed per-class + mean AUROC in PARITY.md §6.
"""

import argparse
import json
import os
import os.path as pt
import sys

sys.path.insert(0, pt.dirname(pt.dirname(pt.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    # default matches what eoe_tpu.main.prepare_data emits and what the CLI
    # runners resolve (default_datapath()/datasets); the path is handed to
    # ClipTrainer directly, whose loaders expect <datapath>/<ds-subdir>/...
    ap.add_argument("--datapath", default=pt.join(pt.dirname(pt.dirname(
        pt.abspath(__file__))), "eoe_tpu", "data", "datasets"))
    ap.add_argument("--dataset", default="cifar10", choices=["cifar10", "imagenet30"])
    ap.add_argument("--classes", type=int, nargs="+", default=None)
    ap.add_argument("--logpath", default="/tmp/eoe_tpu_zeroshot")
    args = ap.parse_args(argv)

    from eoe_tpu.training.clip import _resolve_checkpoint

    ckpt = _resolve_checkpoint(None)
    if ckpt is None:
        print("SKIP: no CLIP checkpoint (set EOE_TPU_CLIP_CHECKPOINT or place "
              "the OpenAI ViT-B/32 weights at ~/.cache/clip/ViT-B-32.pt)")
        return 0
    raw = args.datapath
    # markers mirror the loaders' on-disk layouts (datasets/cifar.py:
    # <root>/cifar10/cifar-10-batches-py or the tar.gz; datasets/imagenet.py:
    # <root>/imagenet_ad/train)
    markers = {
        "cifar10": (pt.join("cifar10", "cifar-10-batches-py"),
                    pt.join("cifar10", "cifar-10-python.tar.gz")),
        "imagenet30": (pt.join("imagenet_ad", "train"),),
    }[args.dataset]
    if os.environ.get("EOE_TPU_FAKE_DATA") != "1" and not any(
            pt.exists(pt.join(raw, m)) for m in markers):
        print(f"SKIP: no {args.dataset} data under {raw} (expected one of {markers}; "
              "see eoe_tpu.main.prepare_data for offline acquisition)")
        return 0

    from eoe_tpu.datasets import no_classes
    from eoe_tpu.training.clip import ClipTrainer
    from eoe_tpu.utils.logger import Logger

    # user-facing "imagenet30" = registry key "imagenet" (the 30-class AD set)
    args.dataset = {"imagenet30": "imagenet"}.get(args.dataset, args.dataset)
    trainer = ClipTrainer(
        model=None, train_specs=[], test_specs=[], dataset=args.dataset,
        oe_dataset=None, datapath=raw, logger=Logger(args.logpath, comment="zeroshot"),
        epochs=0, lr=1e-4, wdk=0.0, milestones=[], batch_size=128,
        checkpoint_path=ckpt)
    classes = args.classes if args.classes is not None else list(range(no_classes(args.dataset)))
    _, results = trainer.run(classes, run_seeds=1)
    print(json.dumps({
        "smoke": f"zero-shot CLIP ViT-B/32 {args.dataset} one-vs-rest",
        "checkpoint": ckpt,
        "mean_auc": results["mean_auc"],
        "cls_aucs": results["cls_aucs"],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
