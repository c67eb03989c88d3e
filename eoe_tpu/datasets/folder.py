"""Folder-backed image sources: threaded JPEG decode feeding the device
pipeline.

TPU-native replacement for the reference's DataLoader-worker + PIL + shared
-memory stack (imagenet.py:109-227, cub.py:135, dtd.py:86-134): instead of
per-sample worker processes, a :class:`FolderSource` decodes a requested index
batch with a thread pool (PIL's decode releases the GIL), resizes every image
to the dataset's fixed raw shape once, and serves uint8 NHWC arrays that the
jitted train step augments on device. A byte-budgeted RAM cache replaces both
the reference's POSIX-shm cache server (experiments/caching/) and the
ImageNet-21k in-process cache (imagenet.py:458-478).

Corrupt-file tolerance mirrors imagenet.py:435-446: a failed decode logs a
warning and serves the next index instead.

Known deviation: the reference resizes with torchvision's shortest-side
semantics and crops later on the CPU; here raw images are resized to a SQUARE
raw shape at decode (crops then happen on device). For the benchmark
pipelines, which all end in square crops, this changes only the crop's source
aspect ratio.
"""

import os
import os.path as pt
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from eoe_tpu.datasets.bases import DataSource

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp")

# module-level scan cache: listing a million files takes time, and the trainer
# rebuilds datasets per class-seed (parity: MyImageNet.cache, imagenet.py:109)
_SCAN_CACHE: Dict[str, Tuple[list, np.ndarray, list]] = {}


def scan_image_folder(root: str, use_cache: bool = True
                      ) -> Tuple[List[str], np.ndarray, List[str]]:
    """torchvision-ImageFolder-style scan: one class per subdirectory
    (alphabetical), returns (paths, targets, classes)."""
    root = pt.abspath(root)
    if use_cache and root in _SCAN_CACHE:
        return _SCAN_CACHE[root]
    if not pt.isdir(root):
        raise FileNotFoundError(f"image folder not found: {root}")
    classes = sorted(d.name for d in os.scandir(root) if d.is_dir())
    paths: List[str] = []
    targets: List[int] = []
    for ci, cls in enumerate(classes):
        cdir = pt.join(root, cls)
        for dirpath, _, filenames in sorted(os.walk(cdir)):
            for fn in sorted(filenames):
                if fn.lower().endswith(IMG_EXTENSIONS):
                    paths.append(pt.join(dirpath, fn))
                    targets.append(ci)
    result = (paths, np.asarray(targets, dtype=np.int64), classes)
    if use_cache:
        _SCAN_CACHE[root] = result
    return result


def blob_path(folder: str, hw: Tuple[int, int]) -> str:
    """Path of the preprocessed array-shard blob for a class-folder tree:
    every image decoded+resized ONCE at prepare time into one memmap-able
    uint8 .npy (SURVEY.md §7.3 'plan for preprocessed array shards'; the
    analogous reference machinery is the shm cache server,
    imagenet.py:197-223 + experiments/caching/cache_ds_to_ram.py)."""
    return pt.join(pt.abspath(folder), f"_eoe_blob_{hw[0]}x{hw[1]}.npy")


def build_blob(folder: str, hw: Tuple[int, int], channels: int = 3,
               workers: int = 16, batch: int = 512) -> str:
    """Decode the whole class-folder tree into the blob (+ .json sidecar with
    the scan order, so loaders never re-scan or re-verify ordering). Uses the
    native C++ batch decoder through FolderSource. Atomic: written to .tmp
    and renamed."""
    import json

    paths, targets, classes = scan_image_folder(folder, use_cache=False)
    if not paths:
        raise FileNotFoundError(f"no images under {folder}")
    out = blob_path(folder, hw)
    src = FolderSource(paths, targets, (hw[0], hw[1], channels), cache_bytes=0,
                       workers=workers)
    arr = np.lib.format.open_memmap(out + ".tmp", mode="w+", dtype=np.uint8,
                                    shape=(len(paths), hw[0], hw[1], channels))
    for i in range(0, len(paths), batch):
        idx = np.arange(i, min(i + batch, len(paths)))
        arr[i:i + len(idx)] = src.gather(idx)
    arr.flush()
    del arr
    root = pt.abspath(folder)
    with open(out + ".json.tmp", "w") as f:
        json.dump({"classes": classes,
                   "targets": targets.tolist(),
                   "paths": [pt.relpath(p, root) for p in paths]}, f)
    os.replace(out + ".json.tmp", out + ".json")
    os.replace(out + ".tmp", out)
    return out


def load_blob_source(folder: str, raw_shape: Tuple[int, int, int], logger=None
                     ):
    """(BlobSource, targets, classes) when a matching blob exists, else None.
    RGB blobs serve grayscale raw shapes by channel slicing at gather."""
    import json

    bp = blob_path(folder, raw_shape[:2])
    if not (pt.exists(bp) and pt.exists(bp + ".json")):
        return None
    with open(bp + ".json") as f:
        meta = json.load(f)
    arr = np.load(bp, mmap_mode="r")
    if arr.shape[1:3] != tuple(raw_shape[:2]) or arr.shape[3] < raw_shape[2]:
        return None
    if len(arr) != len(meta["targets"]):
        if logger is not None:
            logger.warning(f"blob {bp} is inconsistent with its sidecar; ignoring")
        return None
    targets = np.asarray(meta["targets"], np.int64)
    src = BlobSource(arr, targets, raw_shape, paths=meta["paths"])
    return src, targets, meta["classes"]


class BlobSource(DataSource):
    """Memmap-backed preprocessed array shard: gathers are pure page-in reads
    (no decode), so folder datasets with a prepared blob feed the chip at
    memory speed and qualify for the device-resident training path."""

    RESIDENT_BYTES = int(os.environ.get("EOE_TPU_BLOB_RESIDENT_MB", "4096")) << 20

    def __init__(self, images, targets: np.ndarray, raw_shape: Tuple[int, int, int],
                 paths=None):
        self.images = images  # np.memmap (n, h, w, C>=c)
        self.targets = np.asarray(targets, np.int64)
        self._raw_shape = tuple(raw_shape)
        self.paths = paths

    def __len__(self):
        return len(self.images)

    @property
    def raw_shape(self):
        return self._raw_shape

    def gather(self, indices):
        out = self.images[np.asarray(indices)]
        if out.shape[-1] != self._raw_shape[2]:
            out = np.ascontiguousarray(out[..., :self._raw_shape[2]])
        return out

    def fits_resident(self, n_items: int) -> bool:
        return int(n_items) * int(np.prod(self._raw_shape)) <= self.RESIDENT_BYTES


def decode_image(path: str, hw: Tuple[int, int], gray: bool = False) -> np.ndarray:
    """Decode + RGB-convert + square-resize one image to uint8 (h, w, c)."""
    from PIL import Image
    with Image.open(path) as img:
        img = img.convert("L" if gray else "RGB")
        if img.size != (hw[1], hw[0]):
            img = img.resize((hw[1], hw[0]), Image.BILINEAR)
        arr = np.asarray(img, dtype=np.uint8)
    if gray:
        arr = arr[..., None]
    return arr


class FolderSource(DataSource):
    """Random-access source over image files with threaded decode and a
    byte-budgeted RAM cache of decoded (already resized) images."""

    # default decoded-image RAM budget per source when the constructor does
    # not choose one (EOE_TPU_FOLDER_CACHE_MB overrides; 0 disables). On a
    # weak host the decode is the bottleneck — one CPU decodes ~200 224^2
    # JPEGs/s while the chip trains ~4k img/s — so epochs after the first
    # should hit RAM, like the reference's shm cache server (experiments/
    # caching/) but without a separate process.
    DEFAULT_CACHE_BYTES = int(os.environ.get("EOE_TPU_FOLDER_CACHE_MB", "2048")) << 20

    def __init__(self, paths: Sequence[str], targets: np.ndarray,
                 raw_shape: Tuple[int, int, int], logger=None,
                 cache_bytes: Optional[int] = None, workers: int = 16,
                 sample_keys: Optional[Sequence[str]] = None,
                 shm_prefix: Optional[str] = None):
        self.paths = list(paths)
        self.targets = np.asarray(targets, dtype=np.int64)
        self._raw_shape = tuple(raw_shape)
        self.logger = logger
        self.cache_bytes = (self.DEFAULT_CACHE_BYTES if cache_bytes is None
                            else cache_bytes)
        self.workers = workers
        self._cache: Dict[int, np.ndarray] = {}
        self._cache_used = 0
        # per-sample string keys for score dicts (custom datasets key scores by
        # relative file path, ad_trainer.py:528-532)
        self.sample_keys = list(sample_keys) if sample_keys is not None else None
        # shm cache-server block prefix '{ds}_{split}' (utils/caching.py); when
        # set, decode checks the server's blocks before hitting the disk
        self.shm_prefix = shm_prefix

    def __len__(self):
        return len(self.paths)

    @property
    def raw_shape(self):
        return self._raw_shape

    def _decode_one(self, index: int) -> np.ndarray:
        cached = self._cache.get(index)
        if cached is not None:
            return cached
        hw = self._raw_shape[:2]
        gray = self._raw_shape[2] == 1
        if self.shm_prefix is not None:
            from eoe_tpu.utils.caching import read_shm_image
            img = read_shm_image(f"{self.shm_prefix}_{int(index)}")
            if img is not None:
                if img.shape[:2] != hw:  # cache server may store another size
                    from PIL import Image
                    img = np.asarray(Image.fromarray(img).resize((hw[1], hw[0])),
                                     np.uint8)
                return img if not gray else img[..., :1]
        i = int(index)
        for attempt in range(len(self.paths)):
            try:
                arr = decode_image(self.paths[i], hw, gray)
                break
            except Exception as e:  # corrupt file -> serve the next index
                if self.logger is not None:
                    self.logger.warning(
                        f"could not load picture at {self.paths[i]} ({e}); using next index",
                        print_msg=False)
                i = (i + 1) % len(self.paths)
        else:
            raise RuntimeError("all images in the folder source failed to decode")
        if self._cache_used + arr.nbytes <= self.cache_bytes:
            self._cache[index] = arr
            self._cache_used += arr.nbytes
        return arr

    def fits_resident(self, n_items: int) -> bool:
        """Subsets within the RAM budget may train on the device-resident
        path: the trainer gathers them ONCE per class-seed (native batch
        decode) instead of streaming per step — decisive when per-step
        host->device feeding pays fixed RPC latency (tunneled chips)."""
        return int(n_items) * int(np.prod(self._raw_shape)) <= self.cache_bytes

    def gather(self, indices: np.ndarray) -> np.ndarray:
        indices = np.asarray(indices)
        if self.shm_prefix is None and len(indices) >= 2 and self.cache_bytes:
            # cache-aware batch path: decode only the uncached indices — in
            # one native C++ call when possible — and remember them
            uniq = [int(i) for i in dict.fromkeys(indices.tolist())]
            missing = [i for i in uniq if i not in self._cache]
            extra = {}

            def keep(i, arr):
                if self._cache_used + arr.nbytes <= self.cache_bytes:
                    self._cache[i] = arr
                    self._cache_used += arr.nbytes
                else:
                    extra[i] = arr

            got = self._gather_native(np.asarray(missing)) if len(missing) >= 2 else None
            if got is not None:
                for i, arr in zip(missing, got):
                    keep(i, arr)
            elif missing:  # native unavailable / single index: threaded PIL
                with ThreadPoolExecutor(max_workers=self.workers) as pool:
                    for i, arr in zip(missing, pool.map(self._decode_one, missing)):
                        if i not in self._cache:
                            extra[i] = arr
            return np.stack([self._cache[int(i)] if int(i) in self._cache
                             else extra[int(i)] for i in indices])
        native = self._gather_native(indices)
        if native is not None:
            return native
        if len(indices) == 1:
            return self._decode_one(int(indices[0]))[None]
        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            imgs = list(pool.map(self._decode_one, indices.tolist()))
        return np.stack(imgs)

    def _gather_native(self, indices: np.ndarray) -> Optional[np.ndarray]:
        """C++ batch decode (eoe_tpu.native.loader): threaded libjpeg/libpng
        decode + fused resize in one call, no GIL. Falls back to the PIL path
        per failed image; bypassed for shm-server-backed sources (those hit
        the server's blocks per image)."""
        if self.shm_prefix is not None or len(indices) < 2:
            return None
        from eoe_tpu import native
        out, status = native.decode_batch_with_status(
            [self.paths[int(i)] for i in indices], self._raw_shape[:2],
            self._raw_shape[2], self.workers)
        if out is None:
            return None
        for j in np.flatnonzero(status):
            if self.logger is not None:
                self.logger.warning(
                    f"native decode failed for {self.paths[int(indices[j])]}; "
                    f"falling back to PIL", print_msg=False)
            out[j] = self._decode_one(int(indices[j]))
        return out

    def warm_cache(self, indices: Sequence[int]):
        """Pre-decode a set of indices into the RAM cache (role of
        ImageNet22K.cache, imagenet.py:458-478)."""
        for i in indices:
            if self._cache_used >= self.cache_bytes:
                break
            self._decode_one(int(i))
