"""Folder-backed datasets over synthetic on-disk trees: imagenet30/21k layout,
MVTec blob building + defect labels, DTD splits, CUB metadata, custom layouts
with validation (references: src/eoe/datasets/{imagenet,mvtec,dtd,cub,custom}.py)."""

import os
import os.path as pt

import numpy as np
import pytest
from PIL import Image

from eoe_tpu.datasets import load_dataset
from eoe_tpu.datasets.folder import FolderSource, scan_image_folder


def write_img(path, color=None, size=(40, 40), rng=None):
    os.makedirs(pt.dirname(path), exist_ok=True)
    if color is not None:
        arr = np.full((*size, 3), color, np.uint8)
    else:
        arr = (rng or np.random.default_rng(0)).integers(0, 256, (*size, 3), np.uint8)
    Image.fromarray(arr).save(path)


# ----------------------------------------------------------------- FolderSource


def test_folder_source_decode_and_resize(tmp_path, rng):
    for i in range(4):
        write_img(str(tmp_path / "a" / f"{i}.png"), color=i * 40)
    paths, targets, classes = scan_image_folder(str(tmp_path), use_cache=False)
    src = FolderSource(paths, targets, (16, 16, 3))
    out = src.gather(np.arange(4))
    assert out.shape == (4, 16, 16, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(out[2], 80)


def test_folder_source_corrupt_file_fallback(tmp_path):
    write_img(str(tmp_path / "a" / "0.png"), color=10)
    (tmp_path / "a" / "1.png").write_bytes(b"not an image")
    write_img(str(tmp_path / "a" / "2.png"), color=30)
    paths, targets, _ = scan_image_folder(str(tmp_path), use_cache=False)
    src = FolderSource(paths, targets, (8, 8, 3))
    out = src.gather(np.array([1]))  # corrupt -> serves next index (parity imagenet.py:435-446)
    np.testing.assert_array_equal(out[0], 30)


def test_folder_source_ram_cache(tmp_path):
    write_img(str(tmp_path / "a" / "0.png"), color=99)
    paths, targets, _ = scan_image_folder(str(tmp_path), use_cache=False)
    src = FolderSource(paths, targets, (8, 8, 3), cache_bytes=1 << 20)
    src.gather(np.array([0]))
    assert 0 in src._cache
    os.remove(paths[0])  # cached -> still servable
    np.testing.assert_array_equal(src.gather(np.array([0]))[0], 99)


# ----------------------------------------------------------------- imagenet


@pytest.fixture
def imagenet_tree(tmp_path, rng):
    from eoe_tpu.datasets.imagenet import AD_CLASSES
    for split, n in (("train", 3), ("val", 2)):
        for cls in AD_CLASSES[:4] + ["not_an_ad_class"]:
            for i in range(n):
                write_img(str(tmp_path / "imagenet_ad" / split / cls / f"{i}.jpg"), rng=rng)
    return tmp_path


def test_imagenet30_remap_and_filter(imagenet_tree, rng):
    ds = load_dataset("imagenet", str(imagenet_tree), [0], 0, [{"op": "resize", "size": 32}],
                      [{"op": "resize", "size": 32}], None, rng=rng)
    # class 0 == 'acorn': 3 train samples
    assert len(ds.train_set) == 3
    # test keeps only AD-class samples: 4 classes x 2 (non-AD class dropped)
    assert len(ds.test_set) == 8
    assert set(ds.test_set.targets.tolist()) == {0, 1, 2, 3}
    x = ds.train_set.gather_all()
    assert x.shape == (3, 32, 32, 3)


def test_imagenet21k_excludes_1k_synsets(tmp_path, rng):
    from eoe_tpu.datasets.imagenet import ADImageNet21k
    base = tmp_path / "imagenet22k" / "fall11_whole_extracted"
    for wnid in ("n00000001", "n12267677"):  # the second is an excluded 1k synset
        for i in range(3):
            write_img(str(base / wnid / f"{i}.jpg"), rng=rng)
    ds = ADImageNet21k(str(tmp_path), [], 1, [{"op": "resize", "size": 16}], [],
                       (16, 16, 3), rng=rng)
    assert len(ds.train_set) == 3  # only the non-excluded synset
    assert ds.test_set is None


# ----------------------------------------------------------------- blobs


def test_blob_build_and_load(tmp_path, rng):
    """build_blob decodes the tree once into a memmap-able array shard whose
    gathers are byte-identical to the decoding FolderSource (SURVEY §7.3
    preprocessed array shards)."""
    from eoe_tpu.datasets.folder import (BlobSource, build_blob,
                                         load_blob_source)
    for cls in ("a", "b"):
        for i in range(3):
            write_img(str(tmp_path / cls / f"{i}.jpg"), rng=rng)
    out = build_blob(str(tmp_path), (16, 16))
    assert pt.exists(out) and pt.exists(out + ".json")
    got = load_blob_source(str(tmp_path), (16, 16, 3))
    assert got is not None
    src, targets, classes = got
    assert isinstance(src, BlobSource) and classes == ["a", "b"]
    paths, ftargets, _ = scan_image_folder(str(tmp_path), use_cache=False)
    np.testing.assert_array_equal(targets, ftargets)
    ref = FolderSource(paths, ftargets, (16, 16, 3)).gather(np.arange(6))
    np.testing.assert_array_equal(src.gather(np.arange(6)), ref)
    # mismatched resolution -> no blob (loaders fall back to decoding)
    assert load_blob_source(str(tmp_path), (8, 8, 3)) is None
    # blobs qualify for the device-resident training path
    assert src.fits_resident(6)


def test_imagenet30_prefers_blob(imagenet_tree, rng):
    from eoe_tpu.datasets.folder import BlobSource, build_blob
    root = imagenet_tree / "imagenet_ad"
    for split in ("train", "val"):
        build_blob(str(root / split), (32, 32))
    ds = load_dataset("imagenet", str(imagenet_tree), [0], 0,
                      [{"op": "resize", "size": 32}],
                      [{"op": "resize", "size": 32}], None, rng=rng)
    assert isinstance(ds.train_set.source, BlobSource)
    assert isinstance(ds.test_set.source, BlobSource)
    assert len(ds.train_set) == 3 and len(ds.test_set) == 8
    x = ds.train_set.gather_all()
    assert x.shape == (3, 32, 32, 3)
    # same remap/filter semantics as the FolderSource run above
    assert set(ds.test_set.targets.tolist()) == {0, 1, 2, 3}


def test_imagenet21k_blob_excludes_1k_synsets(tmp_path, rng):
    from eoe_tpu.datasets.folder import BlobSource, build_blob
    from eoe_tpu.datasets.imagenet import ADImageNet21k
    base = tmp_path / "imagenet22k" / "fall11_whole_extracted"
    for wnid in ("n00000001", "n12267677"):  # the second is an excluded 1k synset
        for i in range(3):
            write_img(str(base / wnid / f"{i}.jpg"), rng=rng)
    build_blob(str(base), (16, 16))
    ds = ADImageNet21k(str(tmp_path), [], 1, [{"op": "resize", "size": 16}], [],
                       (16, 16, 3), rng=rng)
    assert isinstance(ds.train_set.source, BlobSource)
    assert len(ds.train_set) == 3  # excluded synset's images not selectable
    assert all(str(p).startswith("n00000001") for p in
               np.asarray(ds.train_set.source.paths)[ds.train_set.indices])


# ----------------------------------------------------------------- mvtec


@pytest.fixture
def mvtec_tree(tmp_path, rng):
    root = tmp_path / "mvtec"
    for cls in ("bottle", "cable"):
        for i in range(4):
            write_img(str(root / cls / "train" / "good" / f"{i}.png"), rng=rng)
        for i in range(2):
            write_img(str(root / cls / "test" / "good" / f"{i}.png"), rng=rng)
            write_img(str(root / cls / "test" / "broken" / f"{i}.png"), rng=rng)
    return tmp_path


def test_mvtec_blob_and_defect_labels(mvtec_tree, rng):
    ds = load_dataset("mvtec", str(mvtec_tree), [0], 0, [{"op": "resize", "size": 16}],
                      [{"op": "resize", "size": 16}], None, rng=rng)
    # blob file created once
    assert pt.exists(str(mvtec_tree / "mvtec" / "admvtec_16x16.npz"))
    # train: 4 good images x10 enlarge, class 0 only
    assert len(ds.train_set) == 40
    # test: class 0 only (2 good + 2 broken)
    assert len(ds.test_set) == 4
    bt = ds.binary_targets(ds.test_set)
    assert sorted(bt.tolist()) == [0, 0, 1, 1]  # defect labels, not class labels
    # second construction loads the blob (no rebuild)
    ds2 = load_dataset("mvtec", str(mvtec_tree), [1], 0, [{"op": "resize", "size": 16}],
                       [{"op": "resize", "size": 16}], None, rng=rng)
    assert len(ds2.train_set) == 40


# ----------------------------------------------------------------- dtd / cub


def test_dtd_with_split_files(tmp_path, rng):
    from eoe_tpu.datasets.dtd import DTD_CLASSES
    base = tmp_path / "dtd" / "dtd"
    rel = []
    for cls in DTD_CLASSES[:2]:
        for i in range(4):
            r = f"{cls}/{cls}_{i}.jpg"
            write_img(str(base / "images" / r), rng=rng)
            rel.append(r)
    os.makedirs(base / "labels", exist_ok=True)
    (base / "labels" / "train1.txt").write_text("\n".join(rel[0::4] + rel[1::4]))
    (base / "labels" / "val1.txt").write_text("\n".join(rel[2::4]))
    (base / "labels" / "test1.txt").write_text("\n".join(rel[3::4]))
    ds = load_dataset("dtd", str(tmp_path), [0], 0, [{"op": "resize", "size": 16}],
                      [{"op": "resize", "size": 16}], None, rng=rng)
    assert len(ds.train_set) == 3  # class 0: 3 of 4 in train+val
    assert len(ds.test_set) == 2  # both classes' test fold


def test_cub_metadata_parsing(tmp_path, rng):
    meta = tmp_path / "cub" / "CUB_200_2011" / "CUB_200_2011"
    os.makedirs(meta, exist_ok=True)
    lines_i, lines_c, lines_s, lines_cls = [], [], [], []
    for ci in range(2):
        lines_cls.append(f"{ci + 1} {ci + 1:03d}.Bird_{ci}")
        for i in range(4):
            img_id = ci * 4 + i + 1
            r = f"{ci + 1:03d}.Bird_{ci}/img_{i}.jpg"
            write_img(str(meta / "images" / r), rng=rng)
            lines_i.append(f"{img_id} {r}")
            lines_c.append(f"{img_id} {ci + 1}")
            lines_s.append(f"{img_id} {1 if i < 3 else 0}")
    (meta / "images.txt").write_text("\n".join(lines_i))
    (meta / "image_class_labels.txt").write_text("\n".join(lines_c))
    (meta / "train_test_split.txt").write_text("\n".join(lines_s))
    (meta / "classes.txt").write_text("\n".join(lines_cls))
    ds = load_dataset("cub", str(tmp_path), [1], 0, [{"op": "resize", "size": 16}],
                      [{"op": "resize", "size": 16}], None, rng=rng)
    assert len(ds.train_set) == 3  # class 1 train samples
    assert len(ds.test_set) == 2  # one test sample per class


# ----------------------------------------------------------------- tinyimages


def test_tinyimages_memmap_and_exclusion(tmp_path, rng, monkeypatch):
    # disable the fake-data substitute: this test exercises the real memmap path
    monkeypatch.setenv("EOE_TPU_FAKE_DATA", "0")
    import eoe_tpu.datasets.tinyimages as ti
    root = tmp_path / "tinyimages"
    os.makedirs(root)
    n = 10
    data = rng.integers(0, 256, n * 3072, dtype=np.uint8).astype(np.uint8)
    data.tofile(root / "tiny_images.bin")
    (root / "80mn_cifar_idxs.txt").write_text("1\n3\n")  # 1-based -> excludes 0 and 2
    old = ti.N_TINY
    ti.N_TINY = n
    try:
        ds = ti.ADTinyImages(str(tmp_path), [0], 1, [], [], (32, 32, 3), rng=rng)
        assert len(ds.train_set) == 8
        img = ds.train_set.gather(np.array([0]))
        # first valid index is raw index 1; Fortran order per channel
        ref = data[3072:2 * 3072].reshape(3, 32, 32).transpose(2, 1, 0)
        np.testing.assert_array_equal(img[0], ref)
    finally:
        ti.N_TINY = old


# ----------------------------------------------------------------- custom


def make_custom_general(tmp_path, rng):
    for split in ("train", "test"):
        for cls in ("hazelnut", "screw"):
            for i in range(3):
                write_img(str(tmp_path / "custom" / split / cls / "normal" / f"{i}.png"), rng=rng)
            for i in range(2):
                write_img(str(tmp_path / "custom" / split / cls / "anomalous" / f"{i}.png"), rng=rng)
    return tmp_path


def test_custom_general_layout(tmp_path, rng):
    from eoe_tpu.datasets.custom import ADCustomDS
    make_custom_general(tmp_path, rng)
    ADCustomDS.classes = []
    ADCustomDS.ovr = False
    classes = ADCustomDS.determine_classes(str(tmp_path))
    assert classes == ["hazelnut", "screw"]
    ds = ADCustomDS(str(tmp_path), [0], 0, [{"op": "resize", "size": 16}],
                    [{"op": "resize", "size": 16}], (16, 16, 3), rng=rng)
    assert len(ds.train_set) == 3  # normal folder of class 0 only
    assert len(ds.test_set) == 5  # class 0: 3 normal + 2 anomalous
    bt = ds.binary_targets(ds.test_set)
    assert sorted(bt.tolist()) == [0, 0, 0, 1, 1]
    keys = ds.test_set.sample_keys
    assert keys and all("hazelnut" in k for k in keys)


def test_custom_as_oe(tmp_path, rng):
    from eoe_tpu.datasets.custom import ADCustomDS
    make_custom_general(tmp_path, rng)
    ADCustomDS.classes = []
    ADCustomDS.determine_classes(str(tmp_path))
    ds = load_dataset("custom", str(tmp_path), [0], 0, [{"op": "resize", "size": 16}],
                      [{"op": "resize", "size": 16}], None, oe_name="custom", rng=rng)
    # OE part = the anomalous folder of the SAME class (custom.py oe=True)
    assert len(ds.oe.train_set) == 2
    assert set(ds.oe.binary_targets(ds.oe.train_set).tolist()) == {1}


def test_custom_ovr_layout(tmp_path, rng):
    from eoe_tpu.datasets.custom import ADCustomDS
    for split in ("train", "test"):
        for cls in ("cat", "dog"):
            for i in range(3):
                write_img(str(tmp_path / "custom" / split / cls / f"{i}.png"), rng=rng)
    ADCustomDS.classes = []
    ADCustomDS.ovr = True
    try:
        ADCustomDS.determine_classes(str(tmp_path))
        ds = ADCustomDS(str(tmp_path), [0], 0, [{"op": "resize", "size": 16}],
                        [{"op": "resize", "size": 16}], (16, 16, 3), rng=rng)
        assert len(ds.train_set) == 3  # cat only
        assert len(ds.test_set) == 6  # all classes
        assert sorted(ds.binary_targets(ds.test_set).tolist()) == [0] * 3 + [1] * 3
    finally:
        ADCustomDS.ovr = False
        ADCustomDS.classes = []


def test_custom_layout_validation(tmp_path, rng):
    from eoe_tpu.datasets.custom import ADCustomDS
    # a class folder named 'normal' at the top level is invalid
    write_img(str(tmp_path / "custom" / "train" / "normal" / "0.png"), rng=rng)
    write_img(str(tmp_path / "custom" / "test" / "normal" / "0.png"), rng=rng)
    ADCustomDS.classes = []
    with pytest.raises(ValueError, match="normal"):
        ADCustomDS.determine_classes(str(tmp_path))
        ADCustomDS(str(tmp_path), [0], 0, [], [], (16, 16, 3), rng=rng)
    ADCustomDS.classes = []


def test_custom_eval_only_unlabeled(tmp_path, rng):
    from eoe_tpu.datasets.custom import ADCustomDS
    for i in range(2):
        write_img(str(tmp_path / "normal" / f"{i}.png"), rng=rng)
        write_img(str(tmp_path / "anomalous" / f"{i}.png"), rng=rng)
        write_img(str(tmp_path / "unlabeled" / f"{i}.png"), rng=rng)
    ADCustomDS.classes = []
    ADCustomDS.eval_only = True
    ADCustomDS.base_folder = "."
    try:
        ds = ADCustomDS(str(tmp_path), [0], 0, [{"op": "resize", "size": 16}],
                        [{"op": "resize", "size": 16}], (16, 16, 3), rng=rng)
        assert ds.train_set is None
        assert len(ds.test_set) == 6
        bt = ds.binary_targets(ds.test_set)
        assert sorted(bt.tolist()) == [-1, -1, 0, 0, 1, 1]  # unlabeled == -1
    finally:
        ADCustomDS.eval_only = False
        ADCustomDS.base_folder = "custom"
        ADCustomDS.classes = []


def test_folder_source_subset_resident_promotion(tmp_path):
    """A folder subset within the RAM budget may ride the device-resident
    trainer path: fits_resident + batch gather populate the cache so epochs
    after the first never touch the disk."""
    from eoe_tpu.datasets.bases import Subset
    for i in range(6):
        write_img(str(tmp_path / "a" / f"{i}.png"), color=i * 30)
    paths, targets, _ = scan_image_folder(str(tmp_path), use_cache=False)
    src = FolderSource(paths, targets, (8, 8, 3), cache_bytes=1 << 20)
    sub = Subset(src, np.arange(5))
    assert src.fits_resident(len(sub))
    out = sub.gather_all()
    assert out.shape == (5, 8, 8, 3)
    np.testing.assert_array_equal(out[3], 90)
    for p in paths:  # everything cached now: disk can disappear
        os.remove(p)
    np.testing.assert_array_equal(sub.gather_all()[3], 90)
    big = FolderSource(paths, targets, (8, 8, 3), cache_bytes=100)
    assert not big.fits_resident(5)


def test_folder_source_budget_zero_disables_cache(tmp_path):
    write_img(str(tmp_path / "a" / "0.png"), color=7)
    paths, targets, _ = scan_image_folder(str(tmp_path), use_cache=False)
    src = FolderSource(paths, targets, (8, 8, 3), cache_bytes=0)
    assert not src.fits_resident(1)
    src.gather(np.array([0]))
    assert not src._cache
