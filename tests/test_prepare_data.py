"""Offline data-prep + integrity CLI (eoe_tpu.main.prepare_data): the offline
half of the reference's download/verify bootstrap (mvtec.py:194-256,
cub.py:191-210, clip.py:18-53 sha256)."""

import hashlib
import io
import os
import os.path as pt
import pickle
import tarfile

import numpy as np
import pytest
from PIL import Image

from eoe_tpu.main.prepare_data import (CLIP_SHA256, file_digest, main,
                                       verify_file)


def _tar_from_tree(tree: dict, out_path: str, mode: str = "w:gz"):
    """tree: {relative/path: bytes} -> tar archive."""
    with tarfile.open(out_path, mode) as t:
        for rel, data in tree.items():
            info = tarfile.TarInfo(rel)
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
    return out_path


def _png_bytes(hw=16, seed=0) -> bytes:
    img = Image.fromarray(
        np.random.default_rng(seed).integers(0, 255, (hw, hw, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


# --------------------------------------------------------------- digests


def test_verify_file_pass_and_fail(tmp_path):
    f = tmp_path / "blob.bin"
    f.write_bytes(b"payload")
    good = hashlib.md5(b"payload").hexdigest()
    assert file_digest(str(f), "md5") == good
    verify_file(str(f), "md5", good)  # passes
    verify_file(str(f), "md5", None)  # unknown digest: silently passes
    verify_file(str(f), "md5", "0" * 32, skip=True)  # explicit skip
    with pytest.raises(ValueError, match="md5 mismatch"):
        verify_file(str(f), "md5", "0" * 32)
    sha = hashlib.sha256(b"payload").hexdigest()
    verify_file(str(f), "sha256", sha)


# ----------------------------------------------------------------- cifar


def test_prepare_cifar10_extracts_loadable_layout(tmp_path):
    from eoe_tpu.datasets.cifar import load_cifar10

    def batch(n, labels_key=b"labels"):
        return pickle.dumps({
            b"data": np.zeros((n, 3072), np.uint8),
            labels_key: list(np.zeros(n, np.int64))})

    tree = {f"cifar-10-batches-py/data_batch_{i}": batch(4) for i in range(1, 6)}
    tree["cifar-10-batches-py/test_batch"] = batch(4)
    arch = _tar_from_tree(tree, str(tmp_path / "cifar-10-python.tar.gz"))

    out = main(["cifar10", arch, "--datapath", str(tmp_path), "--skip-hash"])
    assert pt.isdir(out)
    xtr, ytr, xte, yte = load_cifar10(pt.join(str(tmp_path), "datasets", "cifar10"))
    assert xtr.shape == (20, 32, 32, 3) and xte.shape == (4, 32, 32, 3)
    # the real archive must hash-verify: a corrupt one raises
    with pytest.raises(ValueError, match="md5 mismatch"):
        main(["cifar10", arch, "--datapath", str(tmp_path)])


# --------------------------------------------------------------- download


def _fake_cifar10_archive(path):
    def batch(n, labels_key=b"labels"):
        return pickle.dumps({
            b"data": np.zeros((n, 3072), np.uint8),
            labels_key: list(np.zeros(n, np.int64))})

    tree = {f"cifar-10-batches-py/data_batch_{i}": batch(4) for i in range(1, 6)}
    tree["cifar-10-batches-py/test_batch"] = batch(4)
    return _tar_from_tree(tree, path)


def test_download_then_check_only_roundtrip(tmp_path, monkeypatch):
    """--download (mocked fetch, reference endpoints mvtec.py:323-333 /
    clip.py:36-53) -> placed layout -> --check-only passes. The fetched
    archive is digest-verified like a user-supplied one, so the fake archive
    must pair with --skip-hash."""
    import eoe_tpu.main.prepare_data as pd

    fetched_urls = []

    def fake_fetch(url, dest, timeout=30.0):
        fetched_urls.append(url)
        os.makedirs(pt.dirname(dest), exist_ok=True)
        _fake_cifar10_archive(dest)
        return dest

    monkeypatch.setattr(pd, "fetch_url", fake_fetch)
    out = main(["cifar10", "--download", "--datapath", str(tmp_path),
                "--skip-hash"])
    assert pt.isdir(out)
    assert fetched_urls == [pd.DOWNLOAD_URLS["cifar10"][0]]
    # downloaded file landed in the default download dir
    assert pt.isfile(pt.join(str(tmp_path), "downloads", "cifar-10-python.tar.gz"))
    # the placed layout passes --check-only
    assert main(["cifar10", "--check-only", "--datapath", str(tmp_path)])


def test_download_skips_cleanly_without_egress(tmp_path, monkeypatch, capsys):
    """No egress (the fetch raises) must be a clean skip: message, no
    traceback, None return."""
    import eoe_tpu.main.prepare_data as pd

    def no_egress(url, dest, timeout=30.0):
        raise OSError("Network is unreachable")

    monkeypatch.setattr(pd, "fetch_url", no_egress)
    out = main(["cifar10", "--download", "--datapath", str(tmp_path)])
    assert out is None
    assert "download failed" in capsys.readouterr().out
    # datasets with no public endpoint skip with a message too
    out = main(["imagenet30", "--download", "--datapath", str(tmp_path)])
    assert out is None
    assert "no public download endpoint" in capsys.readouterr().out


def test_download_reuses_verified_archive(tmp_path, monkeypatch):
    """A previously-downloaded archive with a matching digest is not
    re-fetched."""
    import eoe_tpu.main.prepare_data as pd

    dl = tmp_path / "downloads"
    dl.mkdir()
    arch = dl / "cifar-10-python.tar.gz"
    _fake_cifar10_archive(str(arch))
    digest = file_digest(str(arch), "md5")
    monkeypatch.setitem(pd.ARCHIVE_MD5, "cifar-10-python.tar.gz", digest)

    def must_not_fetch(url, dest, timeout=30.0):
        raise AssertionError("should not re-fetch a verified archive")

    monkeypatch.setattr(pd, "fetch_url", must_not_fetch)
    out = main(["cifar10", "--download", "--datapath", str(tmp_path)])
    assert pt.isdir(out)


# ----------------------------------------------------------------- mvtec


def test_prepare_mvtec_builds_blob(tmp_path):
    tree = {}
    for cls in ("bottle", "wood"):
        for i in range(2):
            tree[f"{cls}/train/good/{i:03}.png"] = _png_bytes(seed=i)
            tree[f"{cls}/test/good/{i:03}.png"] = _png_bytes(seed=10 + i)
            tree[f"{cls}/test/broken/{i:03}.png"] = _png_bytes(seed=20 + i)
    arch = _tar_from_tree(tree, str(tmp_path / "mvtec_anomaly_detection.tar.xz"),
                          mode="w:xz")
    main(["mvtec", arch, "--datapath", str(tmp_path), "--blob-resolution", "32"])
    blob = pt.join(str(tmp_path), "datasets", "mvtec", "admvtec_32x32.npz")
    assert pt.exists(blob)
    d = np.load(blob, allow_pickle=False)
    assert d["train_data"].shape == (4, 32, 32, 3)
    assert d["test_data"].shape == (8, 32, 32, 3)
    assert set(d["test_anomaly_labels"]) == {0, 1, 2}  # good + 2 class defects


# ------------------------------------------------------------------- cub


def test_prepare_cub_integrity_sweep(tmp_path):
    imgs = {"001.Black_footed_Albatross/a.jpg", "002.Laysan_Albatross/b.jpg"}
    tree = {f"CUB_200_2011/images/{rel}": _png_bytes() for rel in imgs}
    tree["CUB_200_2011/images.txt"] = "".join(
        f"{i + 1} {rel}\n" for i, rel in enumerate(sorted(imgs))).encode()
    arch = _tar_from_tree(tree, str(tmp_path / "CUB_200_2011.tgz"))
    out = main(["cub", arch, "--datapath", str(tmp_path), "--skip-hash"])
    assert pt.exists(pt.join(out, "images.txt"))

    # corrupt: images.txt lists a file the archive lacks -> hard failure
    # (cub.py:203-210 role)
    tree.pop("CUB_200_2011/images/001.Black_footed_Albatross/a.jpg")
    arch2 = _tar_from_tree(tree, str(tmp_path / "CUB_bad.tgz"))
    with pytest.raises(FileNotFoundError, match="corrupted"):
        main(["cub", arch2, "--datapath", str(tmp_path / "dp2"), "--skip-hash"])


# ------------------------------------------------------------------ clip


def test_prepare_clip_sha256(tmp_path):
    ck = tmp_path / "ViT-B-32.pt"
    ck.write_bytes(b"not the real checkpoint")
    with pytest.raises(ValueError, match="sha256 mismatch"):
        main(["clip", str(ck), "--datapath", str(tmp_path)])
    # unknown checkpoint names are refused unless forced
    other = tmp_path / "mystery.pt"
    other.write_bytes(b"x")
    with pytest.raises(ValueError, match="unknown CLIP checkpoint"):
        main(["clip", str(other), "--datapath", str(tmp_path)])
    out = main(["clip", str(ck), "--datapath", str(tmp_path), "--skip-hash"])
    assert pt.exists(out)
    # the published digest table matches the reference URLs (clip.py:18-23)
    assert CLIP_SHA256["ViT-B-32.pt"].startswith("40d365")


# ----------------------------------------------------------------- mnist


def test_prepare_mnist_places_gz(tmp_path):
    import gzip
    src = tmp_path / "train-images-idx3-ubyte.gz"
    with gzip.open(src, "wb") as f:
        f.write(b"\x00" * 16)
    with pytest.raises(ValueError, match="md5 mismatch"):
        main(["mnist", str(src), "--datapath", str(tmp_path)])
    main(["mnist", str(src), "--datapath", str(tmp_path), "--skip-hash"])
    assert pt.exists(pt.join(str(tmp_path), "datasets", "mnist",
                             "train-images-idx3-ubyte.gz"))


# ------------------------------------------------------------ tinyimages


def test_prepare_tinyimages_size_gate(tmp_path):
    f = tmp_path / "tiny_images.bin"
    f.write_bytes(b"\x00" * 3072)
    with pytest.raises(ValueError, match="79302017"):
        main(["tinyimages", str(f), "--datapath", str(tmp_path)])
    out = main(["tinyimages", str(f), "--datapath", str(tmp_path), "--skip-hash"])
    assert pt.exists(out)


# ------------------------------------------------- acceptance-config datasets


def _imagenet30_tree(tmp_path, n_img=2, splits=("train", "val")):
    from eoe_tpu.datasets.imagenet import AD_CLASSES
    root = tmp_path / "dp" / "datasets" / "imagenet_ad"
    for split in splits:
        for c in AD_CLASSES:
            d = root / split / c
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n_img):
                (d / f"{c}_{i}.png").write_bytes(_png_bytes(seed=i))
    return tmp_path / "dp"


def test_check_imagenet30_valid_and_missing_class(tmp_path):
    dp = _imagenet30_tree(tmp_path)
    out = main(["imagenet30", "--check-only", "--datapath", str(dp)])
    assert out.endswith("imagenet_ad")
    # removing one AD class folder must fail with the class named
    import shutil
    from eoe_tpu.datasets.imagenet import AD_CLASSES
    shutil.rmtree(str(dp / "datasets" / "imagenet_ad" / "val" / AD_CLASSES[3]))
    with pytest.raises(FileNotFoundError, match=AD_CLASSES[3]):
        main(["imagenet30", "--check-only", "--datapath", str(dp)])


def test_prepare_imagenet30_from_archive(tmp_path):
    from eoe_tpu.datasets.imagenet import AD_CLASSES
    tree = {}
    for split in ("train", "val"):
        for c in AD_CLASSES:
            tree[f"{split}/{c}/a.png"] = _png_bytes()
    arc = _tar_from_tree(tree, str(tmp_path / "in30.tar.gz"))
    dp = tmp_path / "dp"
    out = main(["imagenet30", arc, "--datapath", str(dp)])
    assert pt.isdir(pt.join(out, "train", AD_CLASSES[0]))


def test_check_imagenet21k_counts_and_overlap(tmp_path, capsys):
    from eoe_tpu.datasets.imagenet import IMAGENET1K_WNIDS
    root = tmp_path / "dp" / "datasets" / "imagenet22k" / "fall11_whole_extracted"
    wnids = ["n00000001", "n00000002", sorted(IMAGENET1K_WNIDS)[0]]
    for w in wnids:
        d = root / w
        d.mkdir(parents=True)
        (d / "img.png").write_bytes(_png_bytes())
    main(["imagenet21k", "--check-only", "--datapath", str(tmp_path / "dp")])
    outp = capsys.readouterr().out
    assert "3 wnid folders" in outp and "1 of the 30" in outp
    # empty tree fails
    with pytest.raises(FileNotFoundError):
        main(["imagenet21k", "--check-only", "--datapath", str(tmp_path / "empty")])


def test_build_imagenet21ksubset_from_tree(tmp_path):
    root = tmp_path / "dp" / "datasets" / "imagenet22k" / "fall11_whole_extracted"
    for w in ("n00000001", "n00000002"):
        d = root / w
        d.mkdir(parents=True)
        for i in range(4):
            (d / f"{w}_{i}.png").write_bytes(_png_bytes(seed=i))
    out = main(["imagenet21ksubset", "--build-subset", "2",
                "--subset-size", "32", "--datapath", str(tmp_path / "dp")])
    files = sorted(os.listdir(pt.join(out, "n00000001")))
    assert len(files) == 2 and files[0].endswith(".jpg")
    # and the check-only pass now succeeds
    main(["imagenet21ksubset", "--check-only", "--datapath", str(tmp_path / "dp")])


def test_check_custom_layout_modes(tmp_path):
    # general layout: class folders with normal/anomalous
    dp = tmp_path / "dp"
    for split in ("train", "test"):
        for cls in ("widget", "gadget"):
            for sub in ("normal", "anomalous"):
                d = dp / "datasets" / "custom" / split / cls / sub
                d.mkdir(parents=True)
                (d / "x.png").write_bytes(_png_bytes())
    out = main(["custom", "--check-only", "--datapath", str(dp)])
    assert out.endswith("custom")

    # one-vs-rest layout: plain class folders
    dp2 = tmp_path / "dp2"
    for split in ("train", "test"):
        for cls in ("dog", "cat"):
            d = dp2 / "datasets" / "custom" / split / cls
            d.mkdir(parents=True)
            (d / "x.png").write_bytes(_png_bytes())
    main(["custom", "--check-only", "--datapath", str(dp2)])

    # mismatched train/test classes fail
    import shutil
    shutil.rmtree(str(dp2 / "datasets" / "custom" / "test" / "cat"))
    with pytest.raises(ValueError, match="do not match"):
        main(["custom", "--check-only", "--datapath", str(dp2)])


def test_check_custom_split_less_roots(tmp_path):
    root = tmp_path / "r"
    (root / "normal").mkdir(parents=True)
    main(["custom", "--check-only", "--train-only", "--custom-root", str(root),
          "--datapath", str(tmp_path / "dp")])
    # eval-only with only an anomalous folder passes; bogus folder fails
    root2 = tmp_path / "r2"
    (root2 / "anomalous").mkdir(parents=True)
    main(["custom", "--check-only", "--eval-only", "--custom-root", str(root2),
          "--datapath", str(tmp_path / "dp")])
    (root2 / "garbage").mkdir()
    with pytest.raises(ValueError, match="garbage"):
        main(["custom", "--check-only", "--eval-only", "--custom-root",
              str(root2), "--datapath", str(tmp_path / "dp")])


def test_check_only_existing_datasets(tmp_path):
    """--check-only for the archive-placed datasets validates the layout
    without archives (here: cifar10 golden path + failure)."""
    import pickle
    dest = tmp_path / "dp" / "datasets" / "cifar10" / "cifar-10-batches-py"
    dest.mkdir(parents=True)
    for f in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        (dest / f).write_bytes(pickle.dumps({"data": b""}))
    main(["cifar10", "--check-only", "--datapath", str(tmp_path / "dp")])
    os.remove(str(dest / "test_batch"))
    with pytest.raises(FileNotFoundError, match="test_batch"):
        main(["cifar10", "--check-only", "--datapath", str(tmp_path / "dp")])
