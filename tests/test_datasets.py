"""Data layer: AD target mapping, limit_samples, balanced sampler semantics,
load_dataset factory (reference: bases.py, datasets/__init__.py)."""

import numpy as np
import pytest

from eoe_tpu.datasets import DS_CHOICES, MSM, load_dataset, no_classes, str_labels
from eoe_tpu.datasets.bases import (ADDataset, ArraySource, BalancedEpochSampler,
                                    CombinedDataset, GenericADDataset, Subset)


def make_source(rng, n=60, n_classes=3, hw=8):
    imgs = rng.integers(0, 256, size=(n, hw, hw, 3), dtype=np.uint8)
    targets = np.arange(n) % n_classes
    return ArraySource(imgs, targets)


def make_ds(rng, normal=(0,), nominal=0, limit=float("inf"), **kw):
    src = make_source(rng)
    test = make_source(rng, n=30)
    return GenericADDataset(
        src, test, root="", normal_classes=normal, nominal_label=nominal,
        train_specs=[], test_specs=[], n_classes=3, raw_shape=(8, 8, 3),
        limit_samples=limit, **kw)


def test_train_set_filtered_to_normal_classes(rng):
    ds = make_ds(rng, normal=(0,))
    assert set(ds.train_set.targets.tolist()) == {0}
    assert len(ds.train_set) == 20


def test_binary_targets_mapping(rng):
    ds = make_ds(rng, normal=(0, 1))
    bt = ds.binary_targets(ds.test_set)
    raw = ds.test_set.targets
    np.testing.assert_array_equal(bt[np.isin(raw, [0, 1])], 0)
    np.testing.assert_array_equal(bt[raw == 2], 1)


def test_nominal_label_flip(rng):
    # nominal_label=1 flips the mapping (bases.py:138-140)
    ds = make_ds(rng, normal=(0,), nominal=1)
    bt = ds.binary_targets(ds.test_set)
    raw = ds.test_set.targets
    np.testing.assert_array_equal(bt[raw == 0], 1)
    np.testing.assert_array_equal(bt[raw != 0], 0)


def test_limit_samples_int(rng):
    ds = make_ds(rng, normal=(0,), limit=5)
    assert len(ds.train_set) == 5


def test_limit_samples_index_list_overrides_filter(rng):
    # explicit index list overrides class filtering (bases.py:185-190)
    ds = make_ds(rng, normal=(0,), limit=[1, 2, 3])
    np.testing.assert_array_equal(ds.train_set.indices, [1, 2, 3])


def test_stats_extraction_on_normalize(rng, tmp_path):
    src = make_source(rng)
    test = make_source(rng, n=30)
    ds = GenericADDataset(
        src, test, root=str(tmp_path), normal_classes=(0,), nominal_label=0,
        train_specs=["normalize"], test_specs=["normalize"], n_classes=3, raw_shape=(8, 8, 3))
    assert ds.stats is not None
    raw = src.images[src.targets == 0].reshape(-1, 3) / 255.0
    np.testing.assert_allclose(ds.stats.mean, raw.mean(0), atol=1e-4)
    # second construction hits the stats cache file
    ds2 = GenericADDataset(
        src, test, root=str(tmp_path), normal_classes=(0,), nominal_label=0,
        train_specs=["normalize"], test_specs=["normalize"], n_classes=3, raw_shape=(8, 8, 3))
    np.testing.assert_allclose(ds2.stats.mean, ds.stats.mean)


def test_sampler_shapes_and_coverage(rng):
    s = BalancedEpochSampler(n_normal=50, n_oe=7, batch_size=16, seed=0)
    idx_n, idx_o, w = s.epoch()
    assert idx_n.shape == idx_o.shape == w.shape == (4, 16)
    # every normal sample appears exactly once among the unpadded slots
    flat = idx_n.reshape(-1)[w.reshape(-1) > 0]
    assert sorted(flat.tolist()) == list(range(50))
    # padding slots masked out
    assert w.reshape(-1).sum() == 50
    # OE indices valid and repeated (7 < 50 -> repeat, bases.py:580-585)
    assert idx_o.max() < 7
    counts = np.bincount(idx_o.reshape(-1), minlength=7)
    assert counts.min() >= 1


def test_sampler_no_oe(rng):
    s = BalancedEpochSampler(n_normal=10, n_oe=0, batch_size=4, seed=0)
    idx_n, idx_o, w = s.epoch()
    assert idx_o is None
    assert idx_n.shape == (3, 4)


def test_sampler_oe_larger_than_normal():
    s = BalancedEpochSampler(n_normal=10, n_oe=100, batch_size=5, seed=0)
    _, idx_o, _ = s.epoch()
    assert idx_o.shape == (2, 5)
    assert idx_o.max() < 100


def test_load_dataset_combined(rng, tmp_path):
    ds = load_dataset("cifar10", str(tmp_path), [0], 0,
                      [], [], None, oe_name="cifar100", rng=rng)
    assert isinstance(ds, CombinedDataset)
    # OE train labels are flipped to anomalous
    bt = ds.oe.binary_targets(ds.oe.train_set)
    assert set(bt.tolist()) == {1}
    # test set is the normal dataset's test set
    assert ds.test_set is ds.normal.test_set


def test_load_dataset_oe_limit_samples(rng, tmp_path):
    ds = load_dataset("cifar10", str(tmp_path), [0], 0, [], [], None,
                      oe_name="cifar100", oe_limit_samples=1, rng=rng)
    assert len(ds.oe.train_set) == 1


def test_load_dataset_oe_only_guard(rng, tmp_path):
    with pytest.raises(ValueError):
        load_dataset("imagenetoe", str(tmp_path), [0], 0, [], [], None, rng=rng)


def test_msm_roundtrip():
    m = MSM("lpf", "train_oe", 3)
    assert str(m) == "lpf+train_oe--M3"
    m2 = MSM.load(str(m))
    assert m2.transform_str == "lpf" and m2.ds_part_str == "train_oe" and m2.magnitude == 3
    assert m2.get_spec() == {"op": "lpf", "magnitude": 3}


def test_msm_conditional_wiring(rng, tmp_path):
    msm = MSM("blur", "train_nominal", 2)
    ds = load_dataset("cifar10", str(tmp_path), [0], 0, [], [], None, msms=[msm], rng=rng)
    assert ds.train_conditional_pipeline.conditionals


def test_registry_covers_reference_datasets():
    # the reference registers 13 keys (datasets/__init__.py:21-145)
    for k in ("cifar10", "cifar100", "mnist", "emnist", "fmnist", "imagenet", "imagenet21k",
              "imagenet21ksubset", "imagenetoe", "tinyimages", "mvtec", "dtd", "cub", "custom"):
        assert k in DS_CHOICES, k
    assert no_classes("cifar10") == 10
    assert len(str_labels("cifar10")) == 10
    assert DS_CHOICES["imagenetoe"]["oe_only"]
