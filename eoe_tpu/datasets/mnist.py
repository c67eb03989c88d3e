"""MNIST / EMNIST-letters / FashionMNIST AD datasets (idx-ubyte parsers).

Parity targets: /root/reference/src/eoe/datasets/mnist.py and fmnist.py.
EMNIST uses the 'letters' split and transposes the raw data like torchvision
(mnist.py:131,143); letters labels 1..26 are remapped to 0..25.
"""

import gzip
import os.path as pt
import struct
from typing import Tuple

import numpy as np

from eoe_tpu.datasets.bases import ADDataset, ArraySource, Subset
from eoe_tpu.datasets.cifar import _fake_arrays, use_fake_data


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        zero, dtype, ndim = struct.unpack(">HBB", f.read(4))
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


def _find(root: str, names) -> str:
    for n in names:
        for suffix in ("", ".gz"):
            p = pt.join(root, n + suffix)
            if pt.exists(p):
                return p
    raise FileNotFoundError(
        f"none of {names} found under {root} (no network access here; place the idx files there "
        f"or set EOE_TPU_FAKE_DATA=1)")


def load_idx_dataset(root: str, prefix: str = "") -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    xtr = _read_idx(_find(root, [f"{prefix}train-images-idx3-ubyte", "train-images.idx3-ubyte"]))
    ytr = _read_idx(_find(root, [f"{prefix}train-labels-idx1-ubyte", "train-labels.idx1-ubyte"]))
    xte = _read_idx(_find(root, [f"{prefix}t10k-images-idx3-ubyte", "t10k-images.idx3-ubyte",
                                 f"{prefix}test-images-idx3-ubyte"]))
    yte = _read_idx(_find(root, [f"{prefix}t10k-labels-idx1-ubyte", "t10k-labels.idx1-ubyte",
                                 f"{prefix}test-labels-idx1-ubyte"]))
    return (xtr[..., None], ytr.astype(np.int64), xte[..., None], yte.astype(np.int64))


class _IdxBase(ADDataset):
    N_CLASSES = 10
    SUBDIR = "mnist"
    PREFIX = ""
    TRANSPOSE = False
    LABEL_OFFSET = 0

    def __init__(self, root: str, normal_classes, nominal_label, train_specs, test_specs,
                 raw_shape, logger=None, limit_samples=float("inf"),
                 train_conditional=(), test_conditional=(), ds_statistics=None, rng=None):
        ds_root = pt.join(root, self.SUBDIR) if root else root
        super().__init__(
            root=ds_root, normal_classes=normal_classes, nominal_label=nominal_label,
            train_specs=train_specs, test_specs=test_specs, n_classes=self.N_CLASSES,
            raw_shape=raw_shape, logger=logger, limit_samples=limit_samples,
            train_conditional=train_conditional, test_conditional=test_conditional,
            ds_statistics=ds_statistics, rng=rng)
        if use_fake_data():
            (xtr, ytr), (xte, yte) = _fake_arrays(self.N_CLASSES, hw=28, c=1)
        else:
            xtr, ytr, xte, yte = load_idx_dataset(ds_root, self.PREFIX)
            if self.TRANSPOSE:
                xtr = np.ascontiguousarray(xtr.transpose(0, 2, 1, 3))
                xte = np.ascontiguousarray(xte.transpose(0, 2, 1, 3))
            ytr = ytr - self.LABEL_OFFSET
            yte = yte - self.LABEL_OFFSET
        self._train_source = ArraySource(xtr, ytr)
        self._test_source = ArraySource(xte, yte)
        self._train_set = self.create_subset(self._train_source)
        self._test_set = Subset(self._test_source, np.arange(len(self._test_source)))
        self.finalize()


class ADMNIST(_IdxBase):
    N_CLASSES = 10
    SUBDIR = "mnist"


class ADEMNIST(_IdxBase):
    N_CLASSES = 26
    SUBDIR = "emnist"
    PREFIX = "emnist-letters-"
    TRANSPOSE = True
    LABEL_OFFSET = 1


class ADFMNIST(_IdxBase):
    N_CLASSES = 10
    SUBDIR = "fmnist"
