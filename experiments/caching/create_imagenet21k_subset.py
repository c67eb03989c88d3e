"""Build a resized on-disk subset of ImageNet-21k for the 'imagenet21ksubset'
dataset (<= N images per class).

Parity target: /root/reference/experiments/caching/create_imagenet21k_subset.py.
Usage: python experiments/caching/create_imagenet21k_subset.py \
       --datapath ./data [--per-class 50] [--size 256]
(Thin CLI over eoe_tpu.datasets.imagenet.build_imagenet21k_subset, which
``prepare_data imagenet21ksubset --build-subset`` also uses.)
"""

import argparse
import os.path as pt
import sys

sys.path.insert(0, pt.abspath(pt.join(pt.dirname(__file__), "..", "..")))

from eoe_tpu.datasets.imagenet import build_imagenet21k_subset


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--datapath", default="./data")
    p.add_argument("--per-class", type=int, default=50)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    build_imagenet21k_subset(args.datapath, args.per_class, args.size, args.seed)


if __name__ == "__main__":
    main()
