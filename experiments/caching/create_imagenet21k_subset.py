"""Build a resized on-disk subset of ImageNet-21k for the 'imagenet21ksubset'
dataset (<= N images per class).

Parity target: /root/reference/experiments/caching/create_imagenet21k_subset.py.
Usage: python experiments/caching/create_imagenet21k_subset.py \
       --datapath ./data [--per-class 50] [--size 256]
"""

import argparse
import os
import os.path as pt
import sys

sys.path.insert(0, pt.abspath(pt.join(pt.dirname(__file__), "..", "..")))

import numpy as np
from PIL import Image

from eoe_tpu.datasets.folder import decode_image


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--datapath", default="./data")
    p.add_argument("--per-class", type=int, default=50)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    src = pt.join(args.datapath, "datasets", "imagenet22k", "fall11_whole_extracted")
    dst = pt.join(args.datapath, "datasets", "imagenet21k_subset")
    rng = np.random.default_rng(args.seed)
    classes = sorted(d for d in os.listdir(src) if pt.isdir(pt.join(src, d)))
    for ci, cls in enumerate(classes):
        files = sorted(os.listdir(pt.join(src, cls)))
        pick = rng.choice(len(files), min(args.per_class, len(files)), replace=False)
        os.makedirs(pt.join(dst, cls), exist_ok=True)
        for i in sorted(pick):
            try:
                img = decode_image(pt.join(src, cls, files[i]), (args.size, args.size))
            except Exception as e:
                print(f"skip {files[i]}: {e}")
                continue
            Image.fromarray(img).save(pt.join(dst, cls, pt.splitext(files[i])[0] + ".jpg"))
        if ci % 100 == 0:
            print(f"{ci}/{len(classes)} classes done")
    print("subset complete at", dst)


if __name__ == "__main__":
    main()
