"""shm cache codec + FolderSource shm integration (reference:
src/eoe/utils/caching.py, experiments/caching/)."""

import numpy as np
import pytest

from eoe_tpu.utils.caching import (decode_shape_and_image, encode_shape_and_image,
                                   read_shm_image, unlink_shm_image, write_shm_image)


def test_codec_roundtrip(rng):
    img = rng.integers(0, 256, (17, 23, 3), np.uint8)
    buf = encode_shape_and_image(img)
    assert buf.dtype == np.uint8 and buf.shape == (15 + 17 * 23 * 3,)
    np.testing.assert_array_equal(decode_shape_and_image(buf), img)


def test_shm_write_read_unlink(rng):
    img = rng.integers(0, 256, (8, 9, 3), np.uint8)
    name = "eoe_tpu_test_shm_0"
    try:
        write_shm_image(name, img)
        np.testing.assert_array_equal(read_shm_image(name), img)
        # overwrite with different size works
        img2 = rng.integers(0, 256, (4, 4, 3), np.uint8)
        write_shm_image(name, img2)
        np.testing.assert_array_equal(read_shm_image(name), img2)
    finally:
        unlink_shm_image(name)
    assert read_shm_image(name) is None
    assert not unlink_shm_image(name)


def test_folder_source_prefers_shm(tmp_path, rng):
    from PIL import Image
    from eoe_tpu.datasets.folder import FolderSource
    disk = np.full((16, 16, 3), 10, np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(disk).save(p)
    src = FolderSource([str(p)], np.zeros(1, np.int64), (16, 16, 3),
                       shm_prefix="eoe_tpu_test_fs")
    shm_img = np.full((16, 16, 3), 99, np.uint8)
    try:
        write_shm_image("eoe_tpu_test_fs_0", shm_img)
        out = src.gather(np.array([0]))
        np.testing.assert_array_equal(out[0], shm_img)  # shm wins over disk
    finally:
        unlink_shm_image("eoe_tpu_test_fs_0")
    out = src.gather(np.array([0]))
    np.testing.assert_array_equal(out[0], disk)  # falls back to disk
