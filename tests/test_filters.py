"""Device filter kernels vs scipy/PIL references (reference CPU impls:
src/eoe/utils/transformations.py:90-323)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eoe_tpu.ops import filters as F


@pytest.fixture
def imgs(rng):
    return rng.random((4, 16, 16, 3)).astype(np.float32)


def test_gaussian_blur_matches_scipy(imgs):
    from scipy.ndimage import gaussian_filter1d
    sigma = 2.0
    k = F.kornia_kernel_size(sigma, 16)
    ours = np.asarray(F.gaussian_blur(jnp.array(imgs), sigma))
    # scipy 'mirror' == torch/kornia 'reflect' (edge not repeated)
    radius = k // 2
    ref = gaussian_filter1d(imgs, sigma, axis=2, mode="mirror", truncate=radius / sigma)
    ref = gaussian_filter1d(ref, sigma, axis=1, mode="mirror", truncate=radius / sigma)
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_kornia_kernel_size_formula():
    # k = 2*int(int(sigma/2)+0.5)+1 clamped (transformations.py:98,103)
    assert F.kornia_kernel_size(5.0, 224) == 5
    assert F.kornia_kernel_size(1.0, 224) == 3  # clamped up to 3
    assert F.kornia_kernel_size(100.0, 32) == 31  # clamped to image size


def test_minmax_norm_range(imgs):
    out = np.asarray(F.minmax_norm(jnp.array(imgs * 7 - 3)))
    assert out.min() == pytest.approx(0.0, abs=1e-6)
    assert out.max() == pytest.approx(1.0, abs=1e-6)


def test_hpf_removes_dc(imgs):
    out = np.asarray(F.high_pass_filter(jnp.array(imgs), magnitude=4))
    assert out.shape == imgs.shape
    # a constant image passes only through its (removed) DC component -> after
    # min-max renorm the output of a non-constant image keeps full range
    assert np.isfinite(out).all()
    assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6


def test_lpf_smooths(imgs):
    out = np.asarray(F.low_pass_filter(jnp.array(imgs), magnitude=6))
    # low-pass keeps less high-frequency energy than the input
    def hf_energy(x):
        f = np.fft.fftshift(np.fft.fft2(x, axes=(1, 2)), axes=(1, 2))
        return np.abs(f[:, :2, :, :]).sum() + np.abs(f[:, -2:, :, :]).sum()
    assert hf_energy(out) < hf_energy(imgs)


def test_hpf_magnitude_zero_identity(imgs):
    np.testing.assert_array_equal(np.asarray(F.high_pass_filter(jnp.array(imgs), 0)), imgs)


def test_gcn_l1(imgs):
    out = np.asarray(F.global_contrast_normalization(jnp.array(imgs), scale="l1"))
    flat = out.reshape(4, -1)
    np.testing.assert_allclose(flat.mean(1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(flat).mean(1), 1.0, atol=1e-4)


def test_grayscale_channel_mean(imgs):
    out = np.asarray(F.grayscale(jnp.array(imgs)))
    assert out.shape == (4, 16, 16, 1)
    np.testing.assert_allclose(out[..., 0], imgs.mean(-1), atol=1e-6)


def test_unsharp_mask_sharpens():
    # a soft edge gets steeper after unsharp masking
    x = np.zeros((1, 16, 16, 1), np.float32)
    x[:, :, 8:, :] = 1.0
    x = np.asarray(F.gaussian_blur(jnp.array(x), 1.5))
    sharp = np.asarray(F.unsharp_mask(jnp.array(x), percent=150.0))
    grad_in = np.abs(np.diff(x[0, 8, :, 0])).max()
    grad_out = np.abs(np.diff(sharp[0, 8, :, 0])).max()
    assert grad_out > grad_in
