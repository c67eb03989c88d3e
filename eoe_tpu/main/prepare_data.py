"""CLI: offline dataset/checkpoint preparation with integrity verification.

The reference self-bootstraps its data online (torchvision downloads with md5
checks; MVTec tar.xz download + preprocessing, mvtec.py:194-256; CUB download
+ per-file integrity, cub.py:191-210; CLIP checkpoints with sha256
verification, clip_official/clip/clip.py:18-53). This environment has zero
egress, so this command is the offline half of that contract: the user
supplies the archives, we

  1. VERIFY them against the published digests (CLIP sha256 from the OpenAI
     URLs; torchvision md5 for CIFAR/DTD; idx-file md5 for MNIST/Fashion),
  2. UNPACK/place them into the raw layout the loaders expect
     (``<datapath>/datasets/<ds>/...``),
  3. CONVERT where a preprocessed form is used (the MVTec resized npz blob),
  4. CHECK the resulting layout (e.g. CUB's images.txt file-presence sweep).

Run:  python -m eoe_tpu.main.prepare_data <dataset> <archive...>
          [--datapath DP] [--skip-hash] [--blob-resolution 224]
e.g.  python -m eoe_tpu.main.prepare_data cifar10 ~/cifar-10-python.tar.gz
      python -m eoe_tpu.main.prepare_data mvtec mvtec_anomaly_detection.tar.xz \
          --blob-resolution 224
      python -m eoe_tpu.main.prepare_data clip ~/ViT-B-32.pt
"""

import argparse
import hashlib
import os
import os.path as pt
import shutil
import tarfile
import zipfile
from typing import Dict, Optional, Tuple

# ------------------------------------------------------- published digests

# sha256 prefixes from the OpenAI checkpoint URLs (reference clip.py:18-23)
CLIP_SHA256 = {
    "RN50.pt": "afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762",
    "RN101.pt": "8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599",
    "RN50x4.pt": "7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd",
    "ViT-B-32.pt": "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af",
}

# md5 digests published by torchvision (the reference's download path)
ARCHIVE_MD5: Dict[str, str] = {
    "cifar-10-python.tar.gz": "c58f30108f718f92721af3b95e74349a",
    "cifar-100-python.tar.gz": "eb9058c3a382ffc7106e4002c42a8d85",
    "dtd-r1.0.1.tar.gz": "fff73e5086ae6bdbea199a49dfb8a4c1",
    # MNIST idx gzips (yann.lecun.com / torchvision mirrors)
    "train-images-idx3-ubyte.gz": "f68b3c2dcbeaaa9fbdd348bbdeb94873",
    "train-labels-idx1-ubyte.gz": "d53e105ee54ea40749a09fcbcd1e9432",
    "t10k-images-idx3-ubyte.gz": "9fb629c4189551a2d022fa330f9573f3",
    "t10k-labels-idx1-ubyte.gz": "ec29112dd5afa0611ce80d1b7f02629c",
}
# FashionMNIST reuses the MNIST file names with different contents: keyed by
# (dataset, filename) where the plain filename would collide
DS_ARCHIVE_MD5: Dict[Tuple[str, str], str] = {
    ("fmnist", "train-images-idx3-ubyte.gz"): "8d4fb7e6c68d591d4c3dfef9ec88bf0d",
    ("fmnist", "train-labels-idx1-ubyte.gz"): "25c81989df183df01b3e8a0aad5dffbe",
    ("fmnist", "t10k-images-idx3-ubyte.gz"): "bef4ecab320f06d8554ea6380940ec79",
    ("fmnist", "t10k-labels-idx1-ubyte.gz"): "bb300cfdad3c16e7a12a480ee83cd310",
}

TINYIMAGES_BYTES = 79_302_017 * 3072  # tiny_images.bin record count x 3072B


def file_digest(path: str, algo: str = "md5", chunk: int = 1 << 20) -> str:
    h = hashlib.new(algo)
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def verify_file(path: str, algo: str, expected: Optional[str], skip: bool = False):
    """Raises on digest mismatch; silently passes when no digest is known."""
    if expected is None or skip:
        return
    got = file_digest(path, algo)
    if got != expected:
        raise ValueError(
            f"{algo} mismatch for {path}:\n  expected {expected}\n  got      {got}\n"
            f"The archive is corrupt or not the published one "
            f"(pass --skip-hash to force).")
    print(f"verified {pt.basename(path)} ({algo}={expected[:12]}...)")


def _known_digest(dataset: str, filename: str) -> Optional[Tuple[str, str]]:
    if (dataset, filename) in DS_ARCHIVE_MD5:
        return "md5", DS_ARCHIVE_MD5[(dataset, filename)]
    if filename in CLIP_SHA256:
        return "sha256", CLIP_SHA256[filename]
    if filename in ARCHIVE_MD5:
        return "md5", ARCHIVE_MD5[filename]
    return None


def _extract(archive: str, dest: str):
    os.makedirs(dest, exist_ok=True)
    if archive.endswith(".zip"):
        with zipfile.ZipFile(archive) as z:
            z.extractall(dest)
    else:
        with tarfile.open(archive) as t:
            t.extractall(dest, filter="data")  # refuse path-escaping members
    print(f"extracted {pt.basename(archive)} -> {dest}")


def _place(archive: str, dest_dir: str) -> str:
    os.makedirs(dest_dir, exist_ok=True)
    dest = pt.join(dest_dir, pt.basename(archive))
    if pt.abspath(archive) != pt.abspath(dest):
        shutil.copy2(archive, dest)
    return dest


# ------------------------------------------------------------- handlers


def prepare_cifar(ds: str, archives, root: str, args) -> str:
    sub, member = (("cifar10", "cifar-10-batches-py") if ds == "cifar10"
                   else ("cifar100", "cifar-100-python"))
    dest = pt.join(root, sub)
    for a in archives:
        algo, dig = _known_digest(ds, pt.basename(a)) or ("md5", None)
        verify_file(a, algo, dig, args.skip_hash)
        _extract(a, dest)
    out = pt.join(dest, member)
    if not pt.isdir(out):
        raise FileNotFoundError(f"archive did not contain {member}/")
    return out


def prepare_idx(ds: str, archives, root: str, args) -> str:
    """MNIST/FashionMNIST: verify + place the idx gzips (the loaders read .gz
    directly). EMNIST: extract gzip.zip and lift the letters-split files."""
    sub = {"mnist": "mnist", "fmnist": "fmnist", "emnist": "emnist"}[ds]
    dest = pt.join(root, sub)
    os.makedirs(dest, exist_ok=True)
    for a in archives:
        if a.endswith(".zip"):
            tmp = pt.join(dest, "_tmp_zip")
            _extract(a, tmp)
            moved = 0
            for dirpath, _, files in os.walk(tmp):
                for f in files:
                    if "-ubyte" in f:
                        shutil.move(pt.join(dirpath, f), pt.join(dest, f))
                        moved += 1
            shutil.rmtree(tmp)
            print(f"placed {moved} idx files into {dest}")
        else:
            algo, dig = _known_digest(ds, pt.basename(a)) or ("md5", None)
            verify_file(a, algo, dig, args.skip_hash)
            _place(a, dest)
    return dest


def prepare_mvtec(ds: str, archives, root: str, args) -> str:
    dest = pt.join(root, "mvtec")
    for a in archives:
        verify_file(a, "sha256", None, args.skip_hash)  # no published digest
        _extract(a, dest)
    if args.blob_resolution:
        from eoe_tpu.datasets.mvtec import build_blob
        hw = (args.blob_resolution, args.blob_resolution)
        print(f"building resized blob at {hw}...")
        build_blob(dest, hw)
    return dest


def prepare_cub(ds: str, archives, root: str, args) -> str:
    dest = pt.join(root, "cub")
    for a in archives:
        algo, dig = _known_digest(ds, pt.basename(a)) or ("md5", None)
        verify_file(a, algo, dig, args.skip_hash)
        _extract(a, dest)
    # per-file integrity sweep (reference cub.py:193-203)
    meta = pt.join(dest, "CUB_200_2011")
    images_txt = pt.join(meta, "images.txt")
    if not pt.exists(images_txt):
        raise FileNotFoundError(f"{images_txt} missing after extraction")
    missing = []
    with open(images_txt) as f:
        for line in f:
            if line.strip():
                rel = line.split(None, 1)[1].strip()
                if not pt.isfile(pt.join(meta, "images", rel)):
                    missing.append(rel)
    if missing:
        raise FileNotFoundError(
            f"CUB is corrupted: {len(missing)} files from images.txt are missing "
            f"(first: {missing[:3]}). Please re-obtain the archive "
            f"(cub.py:203-210 semantics).")
    print(f"CUB integrity OK ({sum(1 for _ in open(images_txt))} files verified)")
    return meta


def prepare_dtd(ds: str, archives, root: str, args) -> str:
    dest = pt.join(root, "dtd")
    for a in archives:
        algo, dig = _known_digest(ds, pt.basename(a)) or ("md5", None)
        verify_file(a, algo, dig, args.skip_hash)
        _extract(a, dest)
    out = pt.join(dest, "dtd")
    for req in ("images", "labels"):
        if not pt.isdir(pt.join(out, req)):
            raise FileNotFoundError(f"dtd archive did not contain dtd/{req}/")
    return out


def prepare_tinyimages(ds: str, archives, root: str, args) -> str:
    dest = pt.join(root, "tinyimages")
    os.makedirs(dest, exist_ok=True)
    out = None
    for a in archives:
        size = pt.getsize(a)
        if size != TINYIMAGES_BYTES and not args.skip_hash:
            raise ValueError(
                f"{a} is {size} bytes; the 80M TinyImages bin must be exactly "
                f"79302017*3072 = {TINYIMAGES_BYTES} (pass --skip-hash to force)")
        out = _place(a, dest)
        print(f"verified tiny_images.bin size ({size} bytes)")
    return out or dest


def prepare_clip(ds: str, archives, root: str, args) -> str:
    """Verify OpenAI CLIP checkpoints against the sha256 embedded in their
    publication URLs (clip.py:36-53) and place them for the loader."""
    dest = pt.join(pt.dirname(root), "clip_checkpoints") if root.endswith("datasets") \
        else pt.join(root, "clip_checkpoints")
    out = None
    for a in archives:
        algo_dig = _known_digest(ds, pt.basename(a))
        if algo_dig is None and not args.skip_hash:
            raise ValueError(
                f"unknown CLIP checkpoint name {pt.basename(a)}; expected one of "
                f"{sorted(CLIP_SHA256)} (pass --skip-hash to place it unverified)")
        if algo_dig is not None:
            verify_file(a, algo_dig[0], algo_dig[1], args.skip_hash)
        out = _place(a, dest)
        print(f"set EOE_TPU_CLIP_CHECKPOINT={out} to use it")
    return out or dest


HANDLERS = {
    "cifar10": prepare_cifar, "cifar100": prepare_cifar,
    "mnist": prepare_idx, "fmnist": prepare_idx, "emnist": prepare_idx,
    "mvtec": prepare_mvtec, "cub": prepare_cub, "dtd": prepare_dtd,
    "tinyimages": prepare_tinyimages, "clip": prepare_clip,
}


def default_datapath() -> str:
    from eoe_tpu.main import default_datapath as dp
    return dp()


def main(argv=None) -> str:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("dataset", choices=sorted(HANDLERS))
    p.add_argument("archives", nargs="+", help="user-provided archive file(s)")
    p.add_argument("--datapath", type=str, default=None,
                   help="data root (default: the runners' default datapath); "
                        "raw layouts land in <datapath>/datasets/<ds>/")
    p.add_argument("--skip-hash", action="store_true",
                   help="skip digest/size verification (use for self-built or "
                        "re-packaged archives)")
    p.add_argument("--blob-resolution", type=int, default=None,
                   help="mvtec only: also build the admvtec_{r}x{r}.npz blob")
    args = p.parse_args(argv)

    for a in args.archives:
        if not pt.isfile(a):
            raise FileNotFoundError(a)
    datapath = args.datapath or default_datapath()
    root = pt.join(datapath, "datasets")
    out = HANDLERS[args.dataset](args.dataset, args.archives, root, args)
    print(f"{args.dataset} ready at {out}")
    return out


if __name__ == "__main__":
    main()
