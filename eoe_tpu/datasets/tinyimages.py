"""80 Million Tiny Images as OE (the CIFAR-10 paper benchmark OE source).

Parity target: /root/reference/src/eoe/datasets/tinyimages.py — seeks into the
single 433 GB binary ``tiny_images.bin`` (3072 bytes per 32x32x3 image, Fortran
byte order, :129-135) and excludes the known CIFAR duplicates listed in
``80mn_cifar_idxs.txt`` (1-based indices, :93-106). OE-only; no test split.

TPU-native: the file is np.memmap'ed once; a gather is a fancy-index read —
no per-sample worker processes. The CIFAR-exclusion survivor index list is
cached on disk next to the bin (role of the reference's class-level cache).
"""

import os
import os.path as pt
from typing import Tuple

import numpy as np

from eoe_tpu.datasets.bases import ADDataset, DataSource

N_TINY = 79302017


class TinyImagesSource(DataSource):
    def __init__(self, bin_path: str, valid_indices: np.ndarray):
        self.bin_path = bin_path
        self.valid = np.asarray(valid_indices, dtype=np.int64)
        self.targets = np.zeros(len(self.valid), dtype=np.int64)  # single pseudo-class
        self._mm = None

    def _memmap(self):
        if self._mm is None:
            self._mm = np.memmap(self.bin_path, dtype=np.uint8, mode="r")
        return self._mm

    def __len__(self):
        return len(self.valid)

    @property
    def raw_shape(self) -> Tuple[int, int, int]:
        return (32, 32, 3)

    def gather(self, indices: np.ndarray) -> np.ndarray:
        mm = self._memmap()
        out = np.empty((len(indices), 32, 32, 3), dtype=np.uint8)
        for j, i in enumerate(self.valid[np.asarray(indices)]):
            raw = mm[i * 3072:(i + 1) * 3072]
            # stored column-major per channel (tinyimages.py:129-135)
            out[j] = raw.reshape(3, 32, 32).transpose(2, 1, 0)
        return out


def load_valid_indices(root: str, n_records: int = N_TINY) -> np.ndarray:
    """All indices minus the CIFAR near-duplicates (cached as .npy).

    ``n_records`` bounds the index space to the ACTUAL record count of the
    bin on disk — a truncated/partial copy (or a test stand-in slice) must
    never produce reads past EOF, which memmap serves as empty slices."""
    cache = pt.join(root, "tinyimages_valid_idxs.npy")
    if n_records == N_TINY and pt.exists(cache):
        return np.load(cache)
    excl_file = pt.join(root, "80mn_cifar_idxs.txt")
    mask = np.ones(n_records, dtype=bool)
    if pt.exists(excl_file):
        with open(excl_file) as f:
            # the file uses 1-based indices (tinyimages.py:97-100)
            excl = np.asarray([int(line) - 1 for line in f if line.strip()], dtype=np.int64)
        mask[excl[excl < n_records]] = False
    valid = np.flatnonzero(mask)
    if n_records == N_TINY:  # only the canonical bin's cache is reusable
        try:
            np.save(cache, valid)
        except OSError:
            pass
    return valid


class ADTinyImages(ADDataset):
    base_folder = "tinyimages"

    def __init__(self, root: str, normal_classes, nominal_label, train_specs, test_specs,
                 raw_shape, logger=None, limit_samples=float("inf"),
                 train_conditional=(), test_conditional=(), ds_statistics=None, rng=None):
        from eoe_tpu.datasets.cifar import use_fake_data
        ds_root = pt.join(root, self.base_folder)
        bin_path = pt.join(ds_root, "tiny_images.bin")
        if use_fake_data():
            bin_path = None
        elif not pt.exists(bin_path):
            raise FileNotFoundError(
                f"80M TinyImages binary not found at {bin_path}. The dataset has been "
                f"withdrawn by its authors; if you hold a copy, place tiny_images.bin "
                f"and 80mn_cifar_idxs.txt there.")
        super().__init__(
            root=ds_root, normal_classes=[0], nominal_label=nominal_label,
            train_specs=train_specs, test_specs=test_specs, n_classes=1,
            raw_shape=raw_shape, logger=logger, limit_samples=limit_samples,
            train_conditional=train_conditional, test_conditional=test_conditional,
            ds_statistics=ds_statistics, rng=rng)
        if bin_path is None:  # offline fake-data mode (EOE_TPU_FAKE_DATA=1)
            from eoe_tpu.datasets.bases import ArraySource
            fake = np.random.default_rng(7).integers(
                0, 256, (512, 32, 32, 3), dtype=np.uint8)
            self._train_source = ArraySource(fake, np.zeros(512, np.int64))
        else:
            n_rec = os.path.getsize(bin_path) // 3072
            self._train_source = TinyImagesSource(
                bin_path, load_valid_indices(ds_root, n_rec))
        self._train_set = self.create_subset(self._train_source)
        self._test_set = None  # OE only
        self.finalize()
