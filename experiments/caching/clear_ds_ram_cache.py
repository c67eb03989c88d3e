"""Unlink all shared-memory cache blocks of a dataset.

Parity target: /root/reference/experiments/caching/clear_ds_ram_cache.py.
Usage: python experiments/caching/clear_ds_ram_cache.py -ds imagenet --split train
"""

import argparse
import os.path as pt
import sys

sys.path.insert(0, pt.abspath(pt.join(pt.dirname(__file__), "..", "..")))

from eoe_tpu.utils.caching import unlink_shm_image


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-ds", "--dataset", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--max-idx", type=int, default=20_000_000)
    args = p.parse_args()
    n, misses = 0, 0
    for i in range(args.max_idx):
        if unlink_shm_image(f"{args.dataset}_{args.split}_{i}"):
            n += 1
            misses = 0
        else:
            misses += 1
            if misses > 10000:  # long gap -> no more blocks
                break
    print(f"unlinked {n} blocks")


if __name__ == "__main__":
    main()
