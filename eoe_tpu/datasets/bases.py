"""Dataset abstractions: sources, AD datasets, normal‖OE combination, and the
fixed-shape balanced batch sampler.

This is the TPU-native redesign of the reference's data layer
(/root/reference/src/eoe/datasets/bases.py):

  reference                               | here
  ----------------------------------------+----------------------------------
  TorchvisionDataset + DataLoader workers | ADDataset over array/lazy Sources;
  (fork per worker, PIL per sample)       | batch assembly = index gather, all
                                          | augmentation on device
  CPU->GPU transform splitting (:412-468) | one declarative spec pipeline per
  + 'normalize' placeholder (:293-372)    | split, compiled against dataset
                                          | statistics (ops.preprocess)
  BalancedConcatLoader (:570-600): zips   | BalancedEpochSampler: per-epoch
  normal and OE loaders, repeats short OE | fixed-shape (steps, B) index plans
  index lists, tops up short batches      | with identical repeat semantics;
                                          | ragged last batch -> padding+mask
  stats extraction w/ RunningStats        | single jitted reduction over the
  (:334-345)                              | raw normal train split

Label semantics are preserved exactly: normal classes -> nominal_label, all
others -> anomalous label (bases.py:138-140); OE datasets get the flipped
train label (datasets/__init__.py:298-305); `limit_samples` is an int (random
subset) or an explicit index list that overrides filtering (bases.py:168-202).
"""

import json
import os
import os.path as pt
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from eoe_tpu.ops import filters as Fil
from eoe_tpu.ops.metrics import channel_stats
from eoe_tpu.ops.preprocess import DatasetStats, compile_conditional, compile_pipeline

INF = float("inf")

STD_NORM = 0
GCN_NORM = 1


# ---------------------------------------------------------------- sources


class DataSource:
    """A random-access image collection at a fixed raw shape (h, w, c), uint8.

    ``gather`` is the only access path — batch assembly is always an index
    gather, never per-sample python iteration."""

    targets: np.ndarray  # int64 class labels, shape (n,)

    def __len__(self) -> int:
        raise NotImplementedError

    def gather(self, indices: np.ndarray) -> np.ndarray:
        """Return uint8 images (len(indices), h, w, c)."""
        raise NotImplementedError

    @property
    def raw_shape(self) -> Tuple[int, int, int]:
        raise NotImplementedError

    @property
    def resident(self) -> bool:
        """Whether the whole source can be cheaply device-put (array-backed)."""
        return False

    def fits_resident(self, n_items: int) -> bool:
        """Whether a SUBSET of n_items may be materialized once (gather_all)
        and trained on the device-resident fast path. Streaming sources
        return False; cached folder sources accept subsets within their RAM
        budget — decoding once per class-seed beats per-step streaming."""
        return self.resident


class ArraySource(DataSource):
    def __init__(self, images: np.ndarray, targets: np.ndarray):
        assert images.ndim == 4, f"expected (n, h, w, c), got {images.shape}"
        self.images = images
        self.targets = np.asarray(targets, dtype=np.int64)
        assert len(self.images) == len(self.targets)

    def __len__(self):
        return len(self.images)

    def gather(self, indices):
        return self.images[np.asarray(indices)]

    @property
    def raw_shape(self):
        return tuple(self.images.shape[1:])

    @property
    def resident(self):
        return isinstance(self.images, np.ndarray) and self.images.nbytes < 2 << 30


class LazySource(DataSource):
    """Backed by a loader callable (e.g. JPEG folder decode or a 433 GB
    memmap); gathers decode on demand. Not device-resident."""

    def __init__(self, n: int, raw_shape: Tuple[int, int, int], targets: np.ndarray,
                 gather_fn: Callable[[np.ndarray], np.ndarray]):
        self._n = n
        self._raw_shape = tuple(raw_shape)
        self.targets = np.asarray(targets, dtype=np.int64)
        self._gather = gather_fn

    def __len__(self):
        return self._n

    def gather(self, indices):
        return self._gather(np.asarray(indices))

    @property
    def raw_shape(self):
        return self._raw_shape


class Subset:
    """Indices into a source (mirrors torch.utils.data.Subset usage: the train
    split is ALWAYS a Subset, even when it spans the full source)."""

    def __init__(self, source: DataSource, indices: Sequence[int]):
        self.source = source
        self.indices = np.asarray(indices, dtype=np.int64)

    def __len__(self):
        return len(self.indices)

    def gather(self, positions: np.ndarray) -> np.ndarray:
        return self.source.gather(self.indices[np.asarray(positions)])

    def gather_all(self) -> np.ndarray:
        return self.source.gather(self.indices)

    @property
    def targets(self) -> np.ndarray:
        return self.source.targets[self.indices]

    @property
    def sample_keys(self):
        """Per-sample string keys (e.g. relative file paths) when the source
        provides them — used for the per-sample anomaly-score JSONs of custom
        datasets (ad_trainer.py:528-532)."""
        keys = getattr(self.source, "sample_keys", None)
        if keys is None:
            return None
        return [keys[i] for i in self.indices]


# ---------------------------------------------------------------- AD dataset


class ADDataset:
    """An anomaly-detection view of a classification dataset.

    Subclasses (or the generic ``from_sources``) provide train/test sources;
    this base handles: normal-class filtering, limit_samples, binary target
    mapping, statistics extraction + stats_cache.json caching, and pipeline
    compilation. Parity: bases.py:79-495.
    """

    # folder-backed datasets set this so random crops resample degenerate
    # (all-white-border) results, matching the reference's std<1e-15 retry
    # (imagenet.py:193-195, imagenetoe.py:146-148, cub.py:131-133,
    # custom.py:380-382); see ops.preprocess.random_crop
    degenerate_crop_guard = False

    def __init__(self, root: str, normal_classes: Sequence[int], nominal_label: int,
                 train_specs: Sequence, test_specs: Sequence, n_classes: int,
                 raw_shape: Tuple[int, int, int], logger=None,
                 limit_samples: Union[int, float, Sequence[int]] = INF,
                 train_conditional: Sequence = (), test_conditional: Sequence = (),
                 ds_statistics: Optional[dict] = None,
                 rng: Optional[np.random.Generator] = None):
        self.root = root
        self.normal_classes = tuple(normal_classes)
        normal_set = set(self.normal_classes)
        self.outlier_classes = [c for c in range(n_classes) if c not in normal_set]
        assert nominal_label in (0, 1)
        self.nominal_label = nominal_label
        self.anomalous_label = 1 - nominal_label
        self.logger = logger
        self.limit_samples = limit_samples
        self.raw_shape = tuple(raw_shape)
        self.n_classes = n_classes
        self.rng = rng if rng is not None else np.random.default_rng()

        self.train_specs = list(train_specs or ())
        self.test_specs = list(test_specs or ())
        self.train_conditional = list(train_conditional or ())
        self.test_conditional = list(test_conditional or ())

        self._train_set: Optional[Subset] = None
        self._test_set: Optional[Subset] = None
        self._stats: Optional[DatasetStats] = DatasetStats.from_json(ds_statistics)
        self._train_pipeline = None
        self._test_pipeline = None
        self._train_cond_pipeline = None
        self._test_cond_pipeline = None

    # -- subclass API ------------------------------------------------

    def _get_raw_train_set(self) -> Optional[Subset]:
        """The raw (unaugmented) normal train split used for statistics
        extraction; defaults to the train subset itself."""
        return self._train_set

    # -- construction helpers ----------------------------------------

    def create_subset(self, source: DataSource, class_labels: Optional[np.ndarray] = None) -> Subset:
        """Normal-class filter + limit_samples (parity: bases.py:168-202)."""
        labels = np.asarray(class_labels if class_labels is not None else source.targets)
        normal_idcs = np.argwhere(np.isin(labels, self.normal_classes)).flatten()
        if isinstance(self.limit_samples, (int, float)) and self.limit_samples < INF:
            k = min(int(self.limit_samples), len(normal_idcs))
            normal_idcs = np.sort(self.rng.choice(normal_idcs, k, replace=False))
        elif not isinstance(self.limit_samples, (int, float)):
            normal_idcs = np.asarray(self.limit_samples, dtype=np.int64)
        return Subset(source, normal_idcs)

    def finalize(self):
        """Extract statistics if any pipeline contains a normalization
        placeholder, then compile all pipelines. Call after train/test sets
        are set."""
        def _op(s):
            return (s if isinstance(s, str) else s.get("op", "")).lower()

        placeholders = ("norm", "normalise", "normalize",
                        "gcn-norm", "gcn-normalize", "gcn-normalise")
        needs_stats = any(_op(s) in placeholders
                          for s in (self.train_specs + self.test_specs))
        if needs_stats and self._stats is None:
            self._stats = self._extract_stats()
        guard = self.degenerate_crop_guard
        self._train_pipeline = compile_pipeline(self.train_specs, self._stats, guard)
        self._test_pipeline = compile_pipeline(self.test_specs, self._stats, guard)
        self._train_cond_pipeline = compile_conditional(self.train_conditional, self._stats, guard)
        self._test_cond_pipeline = compile_conditional(self.test_conditional, self._stats, guard)
        return self

    def _extract_stats(self) -> DatasetStats:
        mode = GCN_NORM if any(
            (s if isinstance(s, str) else s.get("op", "")).lower().startswith("gcn")
            for s in (self.train_specs + self.test_specs)
        ) else STD_NORM
        cached = self._load_cached_stats(mode)
        if cached is not None:
            if self.logger is not None:
                self.logger.print(f"Use cached stats of training dataset with normal classes {self.normal_classes}")
            return cached
        raw = self._get_raw_train_set()
        if raw is None:
            raise ValueError(
                "pipeline contains a normalization placeholder but this dataset cannot provide a raw "
                "train split to extract statistics from (e.g. a pure-OE or combined dataset)")
        images = raw.gather_all()
        if mode == STD_NORM:
            mean, std = channel_stats(images)
            stats = DatasetStats(tuple(mean.tolist()), tuple(std.tolist()), STD_NORM)
        else:
            import jax.numpy as jnp
            x = jnp.asarray(images, dtype=jnp.float32) / 255.0
            x = Fil.global_contrast_normalization(x, scale="l1")
            tmin, tmax = float(x.min()), float(x.max())
            c = images.shape[-1]
            stats = DatasetStats((tmin,) * c, (tmax - tmin,) * c, GCN_NORM)
        self._cache_stats(stats, mode)
        return stats

    # stats_cache.json — same role as bases.py:374-410
    def _stats_cache_file(self):
        return pt.join(self.root, "stats_cache.json") if self.root else None

    def _load_cached_stats(self, mode: int) -> Optional[DatasetStats]:
        file = self._stats_cache_file()
        if not file or not pt.exists(file):
            return None
        try:
            with open(file) as r:
                cache = json.load(r)
            entry = cache[type(self).__name__][str(mode)][json.dumps(list(self.normal_classes))]
            return DatasetStats(tuple(entry[0]), tuple(entry[1]), mode)
        except (KeyError, json.JSONDecodeError):
            return None

    def _cache_stats(self, stats: DatasetStats, mode: int):
        file = self._stats_cache_file()
        if not file:
            return
        cache = {}
        if pt.exists(file):
            try:
                with open(file) as r:
                    cache = json.load(r)
            except json.JSONDecodeError:
                cache = {}
        cache.setdefault(type(self).__name__, {}).setdefault(str(mode), {})[
            json.dumps(list(self.normal_classes))] = (list(stats.mean), list(stats.std))
        os.makedirs(pt.dirname(file), exist_ok=True)
        with open(file, "w") as w:
            json.dump(cache, w)

    # -- public surface ----------------------------------------------

    @property
    def train_set(self) -> Subset:
        return self._train_set

    @property
    def test_set(self) -> Subset:
        return self._test_set

    @property
    def ds_statistics(self) -> Optional[dict]:
        return self._stats.to_json() if self._stats is not None else None

    @property
    def stats(self) -> Optional[DatasetStats]:
        return self._stats

    @property
    def train_pipeline(self):
        return self._train_pipeline

    @property
    def test_pipeline(self):
        return self._test_pipeline

    @property
    def train_conditional_pipeline(self):
        return self._train_cond_pipeline

    @property
    def test_conditional_pipeline(self):
        return self._test_cond_pipeline

    def binary_targets(self, subset: Subset) -> np.ndarray:
        """class labels -> nominal/anomalous (bases.py:138-140). Negative raw
        labels (custom datasets' 'unlabeled') are passed through as -1."""
        t = subset.targets
        out = np.where(np.isin(t, self.normal_classes), self.nominal_label, self.anomalous_label)
        return np.where(t < 0, -1, out).astype(np.int64)

    def n_normal_anomalous(self, train: bool = True) -> Dict[int, int]:
        subset = self._train_set if train else self._test_set
        binary = self.binary_targets(subset)
        keys, counts = np.unique(binary, return_counts=True)
        return {int(k): int(v) for k, v in zip(keys, counts)}

    def preview(self, percls: int = 20, train: bool = True) -> np.ndarray:
        """A raw-image grid per binary class for visual-fixture logging
        (bases.py:246-291) — raw uint8 here; pipelines apply at display time."""
        subset = self._train_set if train else self._test_set
        binary = self.binary_targets(subset)
        out = []
        for c in sorted(set(binary.tolist())):
            pos = np.argwhere(binary == c).flatten()[:percls]
            out.append(subset.gather(pos))
        n = min(len(o) for o in out)
        return np.concatenate([o[:n] for o in out])

    def __repr__(self):
        return type(self).__name__


class GenericADDataset(ADDataset):
    """ADDataset over explicit sources — used by in-memory tests and by
    dataset adapters that prepare sources themselves."""

    def __init__(self, train_source: DataSource, test_source: Optional[DataSource], **kw):
        super().__init__(**kw)
        self._train_source = train_source
        self._test_source = test_source
        self._train_set = self.create_subset(train_source)
        if test_source is not None:
            self._test_set = Subset(test_source, np.arange(len(test_source)))
        self.finalize()


# ---------------------------------------------------------------- combined


class CombinedDataset:
    """Normal dataset + OE dataset (parity: bases.py:498-567).

    test == normal's test; train batches are assembled half/half by the
    BalancedEpochSampler. The OE dataset shares the normal dataset's compiled
    pipelines (the reference reaches the same state by deep-copying the
    already-split transforms, datasets/__init__.py:305-333) and additionally
    applies its own conditional (train_oe MSM) transforms.
    """

    def __init__(self, normal: ADDataset, oe: ADDataset):
        self.normal = normal
        self.oe = oe
        self.nominal_label = normal.nominal_label
        self.anomalous_label = normal.anomalous_label
        self.normal_classes = normal.normal_classes
        self.outlier_classes = normal.outlier_classes
        self.raw_shape = normal.raw_shape
        self.logger = normal.logger
        self.limit_samples = oe.limit_samples

    @property
    def train_set(self):
        return self.normal.train_set

    @property
    def test_set(self):
        return self.normal.test_set

    @property
    def ds_statistics(self):
        return self.normal.ds_statistics

    def n_normal_anomalous(self, train: bool = True) -> Dict[int, int]:
        if not train:
            return self.normal.n_normal_anomalous(False)
        n = self.normal.n_normal_anomalous(True)
        # every OE sample counts as anomalous regardless of raw class
        o = {self.anomalous_label: len(self.oe.train_set)}
        return {k: n.get(k, 0) + o.get(k, 0) for k in set(n) | set(o)}

    def __repr__(self):
        return f"CombinedDataset({self.normal!r}, {self.oe!r})"


# ---------------------------------------------------------------- sampler


class BalancedEpochSampler:
    """Per-epoch fixed-shape index plans for balanced normal‖OE batches.

    Reference semantics reproduced (bases.py:570-600):
      * normal indices: fresh shuffle each epoch, epoch length =
        ceil(N / B) steps (short last batch -> padded + masked),
      * OE indices: the OE subset's index list repeated ceil(N / n_oe) times
        when shorter than the normal set (:580-585), reshuffled each epoch,
        consumed in lockstep with the normal stream,
      * per-batch the OE half is truncated/padded to exactly match the normal
        half (:594-595).

    Returns positions into the respective Subsets plus a {0,1} weight mask of
    shape (steps, B) marking real (non-padding) slots.
    """

    def __init__(self, n_normal: int, n_oe: int, batch_size: int, seed: int):
        assert n_normal > 0, "empty normal train set"
        self.n_normal = n_normal
        self.n_oe = n_oe
        self.batch_size = batch_size
        self.steps = int(np.ceil(n_normal / batch_size))
        self.rng = np.random.default_rng(seed)
        if n_oe > 0 and n_oe < n_normal:
            r = int(np.ceil(n_normal / n_oe))
            self._oe_base = np.tile(np.arange(n_oe), r)
        elif n_oe > 0:
            self._oe_base = np.arange(n_oe)
        else:
            self._oe_base = None

    def epoch(self) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
        B, steps, N = self.batch_size, self.steps, self.n_normal
        total = steps * B
        normal = self.rng.permutation(N)
        pad = total - N
        weights = np.ones(total, dtype=np.float32)
        if pad:
            # pad with wrap-around (tiled when the set is smaller than one
            # batch), masked out via weights
            normal = np.tile(normal, int(np.ceil(total / N)))[:total]
            weights[N:] = 0.0
        oe = None
        if self._oe_base is not None:
            oe = self.rng.permutation(self._oe_base)
            while len(oe) < total:
                oe = np.concatenate([oe, self.rng.permutation(self._oe_base)])
            oe = oe[:total].reshape(steps, B)
        return normal.reshape(steps, B), oe, weights.reshape(steps, B)
