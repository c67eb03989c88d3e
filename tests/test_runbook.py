"""RUNBOOK.md §0-§2 dry run over synthetic stand-in archives (VERDICT r4
item 10): tiny fake archives matching every prepare_data format are built,
registered through the real `prepare_data` CLI, and the acceptance commands
run against the REAL loaders (EOE_TPU_FAKE_DATA off), so the first real-data
session can't be derailed by a prepare_data/loader format bug.

Reference data layouts: /root/reference/src/eoe/datasets/{cifar,imagenet,
tinyimages}.py; CLIP checkpoint handling clip_official/clip/clip.py:18-53.
"""

import io
import json
import os
import os.path as pt
import pickle
import tarfile

import numpy as np
import pytest
from PIL import Image

from eoe_tpu.main.prepare_data import main as prepare

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")


# ------------------------------------------------------------ fake archives


def _tar_from_tree(tree, out_path, mode="w:gz"):
    with tarfile.open(out_path, mode) as t:
        for rel, data in tree.items():
            info = tarfile.TarInfo(rel)
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
    return out_path


def _png_bytes(hw=32, seed=0):
    img = Image.fromarray(
        np.random.default_rng(seed).integers(0, 255, (hw, hw, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _cifar_batch(n, n_classes, labels_key=b"labels", seed=0):
    rng = np.random.default_rng(seed)
    labels = (np.arange(n) % n_classes).astype(np.int64)
    # class-separable pixels so one training epoch moves the AUROC
    data = (rng.integers(0, 60, (n, 3072)) + labels[:, None] * 20).astype(np.uint8)
    return pickle.dumps({b"data": data, labels_key: list(labels)})


def _cifar10_archive(path):
    tree = {f"cifar-10-batches-py/data_batch_{i}": _cifar_batch(40, 10, seed=i)
            for i in range(1, 6)}
    tree["cifar-10-batches-py/test_batch"] = _cifar_batch(40, 10, seed=9)
    return _tar_from_tree(tree, path)


def _cifar100_archive(path):
    tree = {"cifar-100-python/train": _cifar_batch(200, 100, b"fine_labels"),
            "cifar-100-python/test": _cifar_batch(100, 100, b"fine_labels", 1)}
    return _tar_from_tree(tree, path)


def _imagenet30_archive(path):
    from eoe_tpu.datasets.imagenet import AD_CLASSES
    tree = {}
    for split in ("train", "val"):
        for ci, c in enumerate(AD_CLASSES):
            for i in range(2):
                tree[f"{split}/{c}/{i}.png"] = _png_bytes(seed=ci * 10 + i)
    return _tar_from_tree(tree, path)


def _imagenet21k_archive(path):
    # wnid folder tree incl. one EXCLUDED 1k synset (must be filtered at load)
    from eoe_tpu.datasets.imagenet import IMAGENET1K_WNIDS
    wnids = ["n90000001", "n90000002", sorted(IMAGENET1K_WNIDS)[0]]
    tree = {f"{w}/{w}_{i}.png": _png_bytes(seed=i) for w in wnids for i in range(3)}
    return _tar_from_tree(tree, path)


def _tinyimages_bin(path, n=64):
    # 3072 B/record, Fortran channel-major like the real tiny_images.bin
    rng = np.random.default_rng(3)
    rng.integers(0, 255, (n, 3072), np.uint8).tofile(path)
    return str(path)


def _cifar_idxs(path):
    # excluded-index list, 1-based line format of 80mn_cifar_idxs.txt
    path.write_text("\n".join(str(i) for i in (1, 5, 9)) + "\n")
    return str(path)


def _clip_checkpoint(path):
    from tests.test_clip import hf_to_openai_sd, tiny_hf_clip
    sd = hf_to_openai_sd(tiny_hf_clip())
    torch.save(sd, str(path))
    return str(path)


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    """RUNBOOK §0 against the stand-ins: every archive through prepare_data."""
    tmp = tmp_path_factory.mktemp("runbook")
    dp = tmp / "dp"
    arch = tmp / "archives"
    arch.mkdir()
    prepare(["cifar10", _cifar10_archive(str(arch / "cifar-10-python.tar.gz")),
             "--datapath", str(dp), "--skip-hash"])
    prepare(["cifar100", _cifar100_archive(str(arch / "cifar-100-python.tar.gz")),
             "--datapath", str(dp), "--skip-hash"])
    prepare(["imagenet30", _imagenet30_archive(str(arch / "in30.tar.gz")),
             "--datapath", str(dp)])
    prepare(["imagenet21k", _imagenet21k_archive(str(arch / "in21k.tar.gz")),
             "--datapath", str(dp)])
    prepare(["tinyimages", _tinyimages_bin(arch / "tiny_images.bin"),
             _cifar_idxs(arch / "80mn_cifar_idxs.txt"),
             "--datapath", str(dp), "--skip-hash"])
    # prepare_clip returns the full placed checkpoint path
    ckpt = prepare(["clip", _clip_checkpoint(arch / "ViT-B-32.pt"),
                    "--datapath", str(dp), "--skip-hash"])
    return dp, ckpt


def test_check_only_all(prepared):
    dp, _ = prepared
    out = prepare(["all", "--check-only", "--datapath", str(dp), "--skip-hash"])
    assert out.endswith("datasets")


def test_check_all_rejects_empty(tmp_path):
    with pytest.raises(FileNotFoundError, match="no prepared datasets"):
        prepare(["all", "--check-only", "--datapath", str(tmp_path)])


def test_runbook_cifar_hsc_end_to_end(prepared, tmp_path, monkeypatch):
    """§2 config 1 shape: train_cifar on the PREPARED layouts (real pickle
    parser + real tinyimages memmap reader, fake data OFF), one class/seed."""
    monkeypatch.delenv("EOE_TPU_FAKE_DATA", raising=False)
    dp, _ = prepared
    from eoe_tpu.main import train_cifar
    _, res = train_cifar.main([
        "--classes", "0", "-it", "1", "-e", "2", "-b", "16",
        "--datapath", str(dp), "--superdir", str(tmp_path)])
    assert np.isfinite(res["mean_auc"])
    run_dirs = [d for d in os.listdir(tmp_path) if d.startswith("log_")]
    assert run_dirs
    with open(pt.join(tmp_path, run_dirs[0], "results.json")) as f:
        assert "eval_mean_auc" in json.load(f)


def test_runbook_zero_shot_clip_end_to_end(prepared, tmp_path, monkeypatch):
    """§2 config 2 shape: zero-shot CLIP (epochs 0) with the fake ViT
    checkpoint through the REAL shape-sniffing converter + prepared CIFAR."""
    monkeypatch.delenv("EOE_TPU_FAKE_DATA", raising=False)
    dp, ckpt = prepared
    monkeypatch.setenv("EOE_TPU_CLIP_CHECKPOINT", ckpt)
    from eoe_tpu.main import train_clip_cifar
    _, res = train_clip_cifar.main([
        "-e", "0", "-it", "1", "--classes", "0", "-b", "16",
        "--datapath", str(dp), "--superdir", str(tmp_path)])
    assert np.isfinite(res["mean_auc"])


def test_runbook_imagenet_loaders(prepared, monkeypatch):
    """§2 configs 3-5 data path: the prepared imagenet30 + 21k trees load
    through the real folder loaders (class remap, 1k-synset exclusion) and
    yield trainable batches."""
    monkeypatch.delenv("EOE_TPU_FAKE_DATA", raising=False)
    dp, _ = prepared
    from eoe_tpu.datasets import load_dataset, str_labels
    from eoe_tpu.utils.logger import Logger
    logger = Logger(str(dp / "inlog"), noname=True, archive_source=False)
    specs = [{"op": "resize", "size": 32}, "normalize"]
    # the runners resolve --datapath to <datapath>/datasets (main/__init__.py)
    ds = load_dataset("imagenet", str(dp / "datasets"), [0], 0, specs, specs,
                      logger, "imagenet21k")
    assert len(str_labels("imagenet")) == 30
    # the excluded 1k synset must not appear in the OE pool
    oeds = ds.oe.train_set
    assert len(oeds) == 6  # 2 fake wnids x 3 images; 1k synset filtered
    x = ds.train_set.gather(np.arange(min(2, len(ds.train_set))))
    assert x.dtype == np.uint8 and x.shape[-1] == 3
