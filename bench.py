"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: images/sec/chip for HSC training with the device-resident epoch path
(the reference publishes no throughput numbers — BASELINE.md — so the baseline
is self-measured; vs_baseline compares against the first recorded run stored
in .bench_baseline.json, 1.0 on the first run).

Flagship model progression: CNN32 now; CLIP ViT-B/32 once the CLIP stack lands
(the BASELINE.json north-star metric). Runs on whatever jax.devices() offers
(one TPU chip under the driver).
"""

import json
import os
import os.path as pt
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from eoe_tpu.datasets.bases import ArraySource, CombinedDataset, GenericADDataset
    from eoe_tpu.models.cnn import CNN32
    from eoe_tpu.training import Trainer
    from eoe_tpu.utils.logger import Logger

    n_chips = jax.device_count()
    rng = np.random.default_rng(0)

    # CIFAR-shaped synthetic data (bench measures compute, not disk IO)
    HW, N_TRAIN, N_OE, B = 32, 8192, 8192, 128
    xtr = rng.integers(0, 256, (N_TRAIN, HW, HW, 3), np.uint8)
    xoe = rng.integers(0, 256, (N_OE, HW, HW, 3), np.uint8)
    kw = dict(root="", train_specs=[{"op": "random_hflip"}, "normalize"],
              test_specs=["normalize"], n_classes=2, raw_shape=(HW, HW, 3))
    normal = GenericADDataset(ArraySource(xtr, np.zeros(N_TRAIN, np.int64)),
                              ArraySource(xtr[:512], np.zeros(512, np.int64)),
                              normal_classes=(0,), nominal_label=0, **kw)
    oe = GenericADDataset(ArraySource(xoe, np.ones(N_OE, np.int64)), None,
                          normal_classes=(1,), nominal_label=1, **kw)
    ds = CombinedDataset(normal, oe)

    logger = Logger("/tmp/eoe_tpu_bench", active=False)
    trainer = Trainer(
        model=CNN32(), objective="hsc", train_specs=kw["train_specs"],
        test_specs=kw["test_specs"], dataset="cifar10", oe_dataset="cifar100",
        datapath="/tmp", logger=logger, epochs=4, lr=1e-3, wdk=0.0,
        milestones=[], batch_size=B)
    trainer.ds = ds

    # epoch 1 compiles + pays the resident-array device_put; steady state =
    # median of the remaining per-epoch rates
    import jax.random as jrandom
    trainer.epochs = 6
    state, _ = trainer.train_cls(ds, 0, "bench", 0, jrandom.key(0))
    ips_chip = float(np.median(trainer.epoch_rates[2:])) / max(n_chips, 1)

    baseline_file = pt.join(pt.dirname(pt.abspath(__file__)), ".bench_baseline.json")
    if pt.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)["value"]
    else:
        base = ips_chip
        with open(baseline_file, "w") as f:
            json.dump({"value": ips_chip, "metric": "images/sec/chip"}, f)

    print(json.dumps({
        "metric": "images/sec/chip (HSC CNN32 train, device-resident epoch)",
        "value": round(ips_chip, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(ips_chip / base, 3),
    }))


if __name__ == "__main__":
    main()
