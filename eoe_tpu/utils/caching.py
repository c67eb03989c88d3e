"""POSIX shared-memory image cache codec + block helpers.

Parity target: /root/reference/src/eoe/utils/caching.py (15-byte shape header
+ flat uint8 image buffer) and the shm read paths in the reference datasets
(imagenet.py:197-223 etc.): a separate long-running cache-server process
(experiments/caching/cache_ds_to_ram.py) decodes and resizes a dataset once
and publishes each image as a named shm block ``{ds}_{split}_{idx}``; training
processes attach read-only. The reference's careful ``resource_tracker
.unregister`` workaround (so a reader exiting doesn't reclaim the server's
blocks) is reproduced in :func:`read_shm_image`.
"""

from multiprocessing import shared_memory
from typing import Optional, Tuple

import numpy as np

HEADER = 15  # 3 x 5-digit ascii dims, parity with the reference codec


def encode_shape_and_image(img: np.ndarray) -> np.ndarray:
    """uint8 image (h, w, c) -> flat uint8 buffer with a 15-byte shape header."""
    assert img.ndim == 3 and img.dtype == np.uint8
    header = "".join(f"{d:05d}" for d in img.shape).encode("ascii")
    return np.concatenate([np.frombuffer(header, np.uint8), img.reshape(-1)])


def decode_shape_and_image(buf: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_shape_and_image`."""
    header = bytes(buf[:HEADER].tolist()).decode("ascii")
    shape = tuple(int(header[i * 5:(i + 1) * 5]) for i in range(3))
    return buf[HEADER:HEADER + int(np.prod(shape))].reshape(shape)


def write_shm_image(name: str, img: np.ndarray) -> int:
    """Publish one encoded image as a named shm block; returns its byte size."""
    data = encode_shape_and_image(np.ascontiguousarray(img))
    try:
        shm = shared_memory.SharedMemory(name=name, create=True, size=data.nbytes)
    except FileExistsError:
        old = shared_memory.SharedMemory(name=name)
        old.close()
        old.unlink()
        shm = shared_memory.SharedMemory(name=name, create=True, size=data.nbytes)
    shm.buf[:data.nbytes] = data.tobytes()
    shm.close()
    # the server intentionally leaks the handle: blocks outlive this function
    # and are reclaimed by clear_ds_ram_cache / unlink_shm_image
    return data.nbytes


def read_shm_image(name: str) -> Optional[np.ndarray]:
    """Attach to a published block and decode; None if absent. Unregisters the
    block from this process's resource tracker so closing it does NOT reclaim
    the server's memory (reference imagenet.py:201-221)."""
    try:
        shm = shared_memory.SharedMemory(name=name)
    except FileNotFoundError:
        return None
    try:
        img = decode_shape_and_image(np.copy(np.frombuffer(shm.buf, np.uint8)))
    finally:
        shm.close()
        try:
            from multiprocessing.resource_tracker import unregister
            unregister(shm._name, "shared_memory")  # noqa: SLF001
        except Exception:
            pass
    return img


def unlink_shm_image(name: str) -> bool:
    try:
        shm = shared_memory.SharedMemory(name=name)
    except FileNotFoundError:
        return False
    shm.close()
    try:
        shm.unlink()
    except FileNotFoundError:
        return False
    return True
