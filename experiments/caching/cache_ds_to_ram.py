"""Long-running RAM cache server: decodes + resizes a dataset once and
publishes every image as a POSIX shared-memory block '{ds}_{split}_{idx}'.

Parity target: /root/reference/experiments/caching/cache_ds_to_ram.py —
training processes (FolderSource with shm_prefix set) attach read-only; the
server enforces a GB limit and an optional timed auto-release.

Usage: python experiments/caching/cache_ds_to_ram.py -ds imagenet --split train \
       --datapath ./data [--size 256] [--gb-limit 64] [--hours 24]
"""

import argparse
import os.path as pt
import sys
import time

sys.path.insert(0, pt.abspath(pt.join(pt.dirname(__file__), "..", "..")))

import numpy as np

from eoe_tpu.datasets.folder import decode_image, scan_image_folder
from eoe_tpu.utils.caching import unlink_shm_image, write_shm_image

ROOTS = {
    ("imagenet", "train"): pt.join("imagenet_ad", "train"),
    ("imagenet", "val"): pt.join("imagenet_ad", "val"),
    ("imagenet21ksubset", "train"): "imagenet21k_subset",
    ("cub", "train"): pt.join("cub", "CUB_200_2011", "CUB_200_2011", "images"),
    ("dtd", "train"): pt.join("dtd", "dtd", "images"),
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-ds", "--dataset", required=True,
                   choices=sorted({k for k, _ in ROOTS}))
    p.add_argument("--split", default="train")
    p.add_argument("--datapath", default="./data")
    p.add_argument("--size", type=int, default=256, help="square resize target")
    p.add_argument("--gb-limit", type=float, default=64.0)
    p.add_argument("--hours", type=float, default=None,
                   help="auto-release after this many hours (default: run forever)")
    args = p.parse_args()

    root = pt.join(args.datapath, "datasets", ROOTS[(args.dataset, args.split)])
    paths, _, _ = scan_image_folder(root)
    written, used = [], 0
    limit = int(args.gb_limit * (1 << 30))
    t0 = time.time()
    for i, path in enumerate(paths):
        if used >= limit:
            print(f"GB limit reached after {i} images")
            break
        try:
            img = decode_image(path, (args.size, args.size))
        except Exception as e:
            print(f"skip {path}: {e}")
            continue
        name = f"{args.dataset}_{args.split}_{i}"
        used += write_shm_image(name, img)
        written.append(name)
        if i % 1000 == 0:
            print(f"cached {i}/{len(paths)} images ({used / (1 << 30):.2f} GB)")
    print(f"serving {len(written)} blocks ({used / (1 << 30):.2f} GB); Ctrl-C to release")
    try:
        while args.hours is None or time.time() - t0 < args.hours * 3600:
            time.sleep(60)
    except KeyboardInterrupt:
        pass
    finally:
        for name in written:
            unlink_shm_image(name)
        print("released all blocks")


if __name__ == "__main__":
    main()
