"""Pipeline compiler: spec resolution, normalization placeholders, conditional
(MSM) transforms (reference: bases.py:293-468, transformations.py:23-61)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eoe_tpu.ops.preprocess import (CLIP_MEAN, CLIP_STD, DatasetStats, PipelineError,
                                    compile_conditional, compile_pipeline)


@pytest.fixture
def imgs(rng):
    return (rng.random((8, 16, 16, 3)) * 255).astype(np.uint8)


def test_uint8_to_float(imgs):
    fn = compile_pipeline([])
    out = np.asarray(fn(jnp.array(imgs)))
    np.testing.assert_allclose(out, imgs.astype(np.float32) / 255.0, atol=1e-6)


def test_normalize_placeholder_requires_stats():
    with pytest.raises(PipelineError):
        compile_pipeline(["normalize"], stats=None)


def test_normalize_placeholder(imgs):
    stats = DatasetStats((0.5, 0.4, 0.3), (0.2, 0.2, 0.2))
    fn = compile_pipeline(["normalize"], stats)
    out = np.asarray(fn(jnp.array(imgs)))
    ref = (imgs / 255.0 - np.array(stats.mean)) / np.array(stats.std)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_normalize_runtime_stats_override(imgs):
    stats = DatasetStats((0.5, 0.4, 0.3), (0.2, 0.2, 0.2))
    fn = compile_pipeline(["normalize"], stats)
    rt = (jnp.array([0.1, 0.1, 0.1]), jnp.array([0.5, 0.5, 0.5]))
    out = np.asarray(fn(jnp.array(imgs), rt_stats=rt))
    ref = (imgs / 255.0 - 0.1) / 0.5
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_resize_and_crop(imgs):
    fn = compile_pipeline([{"op": "resize", "size": 24}, {"op": "center_crop", "size": 20}])
    assert fn(jnp.array(imgs)).shape == (8, 20, 20, 3)


def test_random_ops_need_key(imgs):
    fn = compile_pipeline([{"op": "random_hflip"}])
    with pytest.raises(PipelineError):
        fn(jnp.array(imgs))
    out = fn(jnp.array(imgs), jax.random.key(0))
    assert out.shape == (8, 16, 16, 3)


def test_random_crop_padding(imgs):
    fn = compile_pipeline([{"op": "random_crop", "size": 16, "padding": 2}])
    out = fn(jnp.array(imgs), jax.random.key(0))
    assert out.shape == (8, 16, 16, 3)


def test_random_crop_degenerate_guard():
    # reference parity: crops whose std < 1e-15 (all-white JPEG borders) are
    # re-drawn (imagenet.py:193-195); the fixed-shape equivalent falls back
    # to the center crop. Image: white except a black center pixel — most
    # random 4x4 crops of the 32x32 image are all-white (degenerate), the
    # center crop never is.
    img = np.full((4, 32, 32, 3), 255, np.uint8)
    img[:, 15:17, 15:17, :] = 0
    spec = [{"op": "random_crop", "size": 4, "resample_degenerate": True}]
    out = np.asarray(compile_pipeline(spec)(jnp.array(img), jax.random.key(3)))
    # every sample must contain the black pixel (either its random crop did,
    # or it was replaced by the center crop)
    assert (out.reshape(4, -1).min(axis=1) == 0).all()
    # without the guard, the same key yields at least one all-white crop
    base = [{"op": "random_crop", "size": 4}]
    raw = np.asarray(compile_pipeline(base)(jnp.array(img), jax.random.key(3)))
    assert (raw.reshape(4, -1).min(axis=1) > 0).any()
    # non-degenerate crops are bit-identical with and without the guard
    rnd = np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    a = np.asarray(compile_pipeline(spec)(jnp.array(rnd), jax.random.key(1)))
    b = np.asarray(compile_pipeline(base)(jnp.array(rnd), jax.random.key(1)))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("order", ["crop_flip", "flip_crop"])
@pytest.mark.parametrize("guard", [False, True])
def test_crop_hflip_fusion_bit_identical(order, guard):
    """compile_pipeline fuses adjacent random_crop + random_hflip into one
    pair of gathers (the flip rides the column indices); outputs must be
    BIT-identical to the unfused ops for both compositions, with and without
    the degenerate-crop guard, in uint8 and float."""
    from eoe_tpu.ops.preprocess import random_crop, random_hflip

    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (8, 21, 21, 3)).astype(np.uint8)
    img[:2] = 255  # degenerate once cropped
    crop = {"op": "random_crop", "size": 9, "padding": 2,
            "resample_degenerate": guard}
    flip = {"op": "random_hflip", "p": 0.5}
    specs = [crop, flip] if order == "crop_flip" else [flip, crop]
    fused = compile_pipeline(specs)
    assert fused.n_random == 2

    def unfused(x, key):
        k1, k2 = jax.random.split(key, 2)
        if order == "crop_flip":
            x = random_crop(x, k1, (9, 9), padding=2, resample_degenerate=guard)
            return random_hflip(x, k2, 0.5)
        x = random_hflip(x, k1, 0.5)
        return random_crop(x, k2, (9, 9), padding=2, resample_degenerate=guard)

    for dtype_in in (img, img.astype(np.float32) / 255.0):
        for seed in range(4):
            key = jax.random.key(seed)
            a = np.asarray(fused(jnp.asarray(dtype_in), key))
            ref = np.asarray(unfused(jnp.asarray(dtype_in), key))
            if ref.dtype == np.uint8:  # the pipeline ends in float space
                ref = ref.astype(np.float32) / 255.0
            np.testing.assert_array_equal(a, ref)


def test_dataset_degenerate_crop_guard_flag():
    # folder-backed datasets opt in at the class level; the flag is the
    # compile-time default for their random_crop specs
    from eoe_tpu.datasets.custom import ADCustomDS
    from eoe_tpu.datasets.imagenet import ADImageNet
    from eoe_tpu.datasets.bases import ADDataset

    assert ADImageNet.degenerate_crop_guard and ADCustomDS.degenerate_crop_guard
    assert not ADDataset.degenerate_crop_guard


def test_clip_preprocessing_specs(imgs):
    fn = compile_pipeline([{"op": "clip_pil_preprocessing", "resolution": 32},
                           "clip_tensor_preprocessing"])
    out = np.asarray(fn(jnp.array(imgs)))
    assert out.shape == (8, 32, 32, 3)
    # normalized by CLIP constants
    raw = np.asarray(jax.image.resize(jnp.array(imgs, jnp.float32) / 255.0, (8, 32, 32, 3), "cubic"))
    ref = (raw - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_unknown_op_raises():
    with pytest.raises(PipelineError):
        compile_pipeline(["warp_speed"])


def test_conditional_applies_per_label(imgs):
    # label==0 gets blurred, label==1 untouched (ConditionalCompose semantics,
    # transformations.py:40-53)
    cond = compile_conditional([(0, [{"op": "blur", "sigma": 2.0}], None)])
    labels = jnp.array([0, 1] * 4)
    out = np.asarray(cond(jnp.array(imgs), labels))
    raw = imgs.astype(np.float32) / 255.0
    np.testing.assert_allclose(out[1::2], raw[1::2], atol=1e-6)
    assert np.abs(out[0::2] - raw[0::2]).max() > 1e-3


def test_gaussian_noise_deterministic_per_key(imgs):
    fn = compile_pipeline([{"op": "gaussian_noise", "std": 0.1}])
    a = np.asarray(fn(jnp.array(imgs), jax.random.key(1)))
    b = np.asarray(fn(jnp.array(imgs), jax.random.key(1)))
    c = np.asarray(fn(jnp.array(imgs), jax.random.key(2)))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-4


def test_gaussian_noise_rbg_optin(imgs, monkeypatch):
    """EOE_TPU_RBG_NOISE=1 draws the bits from the hardware RNG (rbg impl):
    still per-key deterministic and roughly N(0, std), just a different
    stream (documented end-to-end negative — see the op's docstring)."""
    monkeypatch.setenv("EOE_TPU_RBG_NOISE", "1")
    fn = compile_pipeline([{"op": "gaussian_noise", "std": 0.1}])
    a = np.asarray(fn(jnp.array(imgs), jax.random.key(1)))
    b = np.asarray(fn(jnp.array(imgs), jax.random.key(1)))
    c = np.asarray(fn(jnp.array(imgs), jax.random.key(2)))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-4
    d = a - np.asarray(imgs, np.float32) / 255.0  # the drawn noise itself
    assert abs(float(d.mean())) < 0.01 and 0.05 < float(d.std()) < 0.2


def test_color_jitter_bounds(imgs):
    fn = compile_pipeline([{"op": "color_jitter", "brightness": 0.2, "contrast": 0.2,
                            "saturation": 0.2, "hue": 0.1}])
    out = np.asarray(fn(jnp.array(imgs), jax.random.key(0)))
    assert out.shape == imgs.shape
    assert out.min() >= -1e-5 and out.max() <= 1 + 1e-5


def test_pipeline_is_jittable(imgs):
    fn = compile_pipeline([{"op": "random_hflip"}, {"op": "blur", "sigma": 1.0}, "minmax_norm"])
    jitted = jax.jit(lambda x, k: fn(x, k))
    out = jitted(jnp.array(imgs), jax.random.key(0))
    assert np.isfinite(np.asarray(out)).all()


def test_u8_index_ops_before_conversion(rng):
    """Index-only prefix ops (hflip/crop) run on raw uint8 and must produce
    bit-identical results to the all-float pipeline (the conversion is
    monotone and elementwise, so it commutes with pure index ops)."""
    from eoe_tpu.ops.preprocess import DatasetStats, compile_pipeline
    x8 = rng.integers(0, 256, (4, 16, 16, 3), np.uint8)
    stats = DatasetStats((0.4, 0.5, 0.6), (0.2, 0.2, 0.2))
    specs = [{"op": "random_hflip"}, {"op": "random_crop", "size": 12, "padding": 2},
             "normalize"]
    pipe = compile_pipeline(specs, stats)
    key = jax.random.key(7)
    out_u8 = pipe(jnp.asarray(x8), key)
    out_f32 = pipe(jnp.asarray(x8, jnp.float32) / 255.0, key)
    np.testing.assert_array_equal(np.asarray(out_u8), np.asarray(out_f32))
    # all-index pipelines still return float in [0, 1]
    pipe2 = compile_pipeline([{"op": "center_crop", "size": 8}])
    out2 = pipe2(jnp.asarray(x8))
    assert out2.dtype == jnp.float32 and float(out2.max()) <= 1.0


@pytest.mark.parametrize("with_flip", [True, False])
@pytest.mark.parametrize("guard", [False, True])
def test_jitter_crop_flip_fusion_matches_unfused(with_flip, guard):
    """compile_pipeline fuses color_jitter + random_crop (+ random_hflip)
    into color_jitter_crop_flip: raw-dtype gathers, full-support contrast
    statistic, one elementwise jitter pass at crop size. Per-pixel the math
    is the unfused composition exactly (same keys per op), so outputs must
    be bit-identical on non-degenerate data in uint8 and float."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (6, 20, 20, 3)).astype(np.uint8)
    jit = {"op": "color_jitter", "brightness": 0.3, "contrast": 0.3,
           "saturation": 0.3, "hue": 0.1}
    crop = {"op": "random_crop", "size": 9, "resample_degenerate": guard}
    flip = {"op": "random_hflip", "p": 0.5}
    specs = [jit, crop] + ([flip] if with_flip else [])
    fused = compile_pipeline(specs)
    assert fused.n_random == (3 if with_flip else 2)

    import os
    os.environ["EOE_TPU_FUSE_JITTER_CROP"] = "0"
    try:
        unfused = compile_pipeline(specs)
    finally:
        del os.environ["EOE_TPU_FUSE_JITTER_CROP"]
    assert unfused.n_random == fused.n_random

    for dtype_in in (img, img.astype(np.float32) / 255.0):
        for seed in range(4):
            key = jax.random.key(seed)
            a = np.asarray(fused(jnp.asarray(dtype_in), key))
            b = np.asarray(unfused(jnp.asarray(dtype_in), key))
            assert a.shape == (6, 9, 9, 3)
            np.testing.assert_array_equal(a, b)


def test_jitter_crop_fusion_degenerate_contract():
    """Degenerate crops under the fusion: the constancy verdict runs on the
    RAW crop (documented deviation — the unfused order tests the jittered
    crop), and the center fallback is jittered with the same factors, so a
    constant-region crop yields jitter(center crop) exactly."""
    from eoe_tpu.ops.preprocess import color_jitter_crop_flip
    rng = np.random.default_rng(3)
    img = np.full((4, 20, 20, 3), 128, np.uint8)  # crops constant except...
    img[:, 8:12, 8:12] = rng.integers(0, 255, (4, 4, 4, 3))  # ...at the center
    key = jax.random.key(0)
    kj, kc = jax.random.split(key)
    out = np.asarray(color_jitter_crop_flip(
        jnp.asarray(img), kj, kc, size=(9, 9), resample_degenerate=True,
        brightness=0.2, contrast=0.2))
    # every output crop is either the (jittered) drawn crop or the jittered
    # center crop; constant outputs would mean the fallback was skipped
    for i in range(4):
        spread = out[i].max() - out[i].min()
        assert spread > 1e-6, "degenerate crop was not replaced"


def test_identity_resize_keeps_u8_prefix():
    """A resize whose target equals the input shape is a no-op and must not
    break the uint8 prefix: [resize(same), crop+flip] equals [crop+flip]
    bit-for-bit, and a REAL resize still interpolates in float."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (4, 16, 16, 3)).astype(np.uint8)
    key = jax.random.key(2)
    with_rs = compile_pipeline([{"op": "resize", "size": 16},
                                {"op": "random_crop", "size": 12},
                                {"op": "random_hflip"}])
    without = compile_pipeline([{"op": "random_crop", "size": 12},
                                {"op": "random_hflip"}])
    np.testing.assert_array_equal(np.asarray(with_rs(jnp.asarray(img), key)),
                                  np.asarray(without(jnp.asarray(img), key)))
    real = compile_pipeline([{"op": "resize", "size": 24}])
    out = np.asarray(real(jnp.asarray(img)))
    assert out.shape == (4, 24, 24, 3) and out.dtype == np.float32
