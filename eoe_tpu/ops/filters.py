"""Batched image filters on device (NHWC float32 in [0, 1]).

TPU-native equivalents of the reference's dual CPU/GPU filter library
(utils/transformations.py): the reference keeps PIL/scipy CPU variants plus
torch GPU duals and splits pipelines between worker processes and the GPU
(bases.py:412-468). Here there is exactly one implementation per filter — a
batched jnp/lax function fused by XLA into the device-side preprocessing
pipeline — used for both the "CPU" and "GPU" roles.

Filter semantics mirror transformations.py:
  gaussian_blur  — kornia-style gaussian_blur2d (reflect padding, odd kernel,
                   k = 2*int(int(sigma/2)+0.5)+1 clamped to image size; :97-110,141-159)
  unsharp_mask   — PIL UnsharpMask(percent=magnitude*100, radius=2, threshold≈0)
                   (:114-120); threshold is ignored (PIL default 3/255 has no
                   effect at these magnitudes on [0,1] floats)
  hpf / lpf      — DFT filters with fftshifted center/border zeroing and
                   min-max renorm (:195-323). NOTE: the reference's CPU HPF
                   zeroes a square indexed [w-axis, h-axis] (transposed!) while
                   its GPU HPF zeroes [h, w]; we follow the GPU variant, which
                   is what actually ran in the published multiscale experiments.
  gcn            — per-sample global contrast normalization (:326-349)
  minmax_norm    — per-sample min-max to [0,1] (:177-190)
"""

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _gaussian_kernel1d(sigma: float, k: int) -> Array:
    x = jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2.0
    g = jnp.exp(-0.5 * jnp.square(x / sigma))
    return g / g.sum()


def kornia_kernel_size(sigma: float, image_size: int) -> int:
    """k = 2*int(int(sigma/2)+0.5)+1, clamped to [3, 2*int(int(S/2)+0.5)-1]
    (transformations.py:98,103,152-153)."""
    k = 2 * int(int(sigma / 2) + 0.5) + 1
    return max(min(k, 2 * int(int(image_size / 2) + 0.5) - 1), 3)


def gaussian_blur(images: Array, sigma: float, kernel_size: int = None) -> Array:
    """Separable depthwise gaussian blur with reflect padding (kornia-compatible)."""
    if sigma <= 0:
        return images
    n, h, w, c = images.shape
    k = kernel_size if kernel_size is not None else kornia_kernel_size(sigma, w)
    g = _gaussian_kernel1d(sigma, k)
    pad = k // 2
    x = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # depthwise separable: horizontal then vertical 1-d convs on the MXU-friendly
    # NHWC layout (feature_group_count = C)
    kern_h = jnp.tile(g.reshape(1, k, 1, 1), (1, 1, 1, c))  # HWIO with I=1 (depthwise)
    kern_v = jnp.tile(g.reshape(k, 1, 1, 1), (1, 1, 1, c))
    dn = lax.conv_dimension_numbers(x.shape, kern_h.shape, ("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(x, kern_h, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    x = lax.conv_general_dilated(x, kern_v, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    return x


def unsharp_mask(images: Array, percent: float, radius: float = 2.0) -> Array:
    """PIL-style unsharp mask: img + percent/100 * (img - blur(img)), clipped."""
    if percent <= 0:
        return images
    blurred = gaussian_blur(images, radius, kernel_size=2 * int(radius) * 2 + 1)
    sharp = images + (percent / 100.0) * (images - blurred)
    return jnp.clip(sharp, 0.0, 1.0)


def minmax_norm(images: Array) -> Array:
    """Per-sample min-max normalization over all pixels and channels
    (transformations.py:177-190: subtract min, then divide by the max of the
    shifted image)."""
    n = images.shape[0]
    flat = images.reshape(n, -1)
    flat = flat - flat.min(axis=1, keepdims=True)
    flat = flat / flat.max(axis=1, keepdims=True)
    return flat.reshape(images.shape)


def _fftshift_mask_center(h: int, w: int, e: int) -> Array:
    """Mask (h, w) that zeroes the centered e-box of an fftshifted spectrum."""
    ih = jnp.arange(h)
    iw = jnp.arange(w)
    mh = (ih >= h // 2 - e) & (ih < h // 2 + e)
    mw = (iw >= w // 2 - e) & (iw < w // 2 + e)
    return ~(mh[:, None] & mw[None, :])


def _fftshift_mask_border(h: int, w: int, e: int) -> Array:
    ih = jnp.arange(h)
    iw = jnp.arange(w)
    mh = (ih < e) | (ih >= h - e)
    mw = (iw < e) | (iw >= w - e)
    return ~(mh[:, None] | mw[None, :])


def _dft_filter(images: Array, magnitude: int, mask_fn) -> Array:
    n, h, w, c = images.shape
    e = min(int(magnitude), min(w // 2, h // 2))
    if e <= 0:
        return images
    f = jnp.fft.fftshift(jnp.fft.fft2(images, axes=(1, 2)), axes=(1, 2))
    mask = mask_fn(h, w, e)[None, :, :, None]
    f = f * mask
    out = jnp.fft.ifft2(jnp.fft.ifftshift(f, axes=(1, 2)), axes=(1, 2)).real
    return minmax_norm(out)


def high_pass_filter(images: Array, magnitude: int) -> Array:
    """Zero the fftshifted low-frequency center box, min-max renormalize."""
    return _dft_filter(images, magnitude, _fftshift_mask_center)


def low_pass_filter(images: Array, magnitude: int) -> Array:
    """Zero the fftshifted high-frequency border band, min-max renormalize."""
    return _dft_filter(images, magnitude, _fftshift_mask_border)


def global_contrast_normalization(images: Array, scale: str = "l1") -> Array:
    """Per-sample GCN: subtract the per-image mean, divide by the per-image L1
    mean or (L2 norm / n_features) (transformations.py:326-349)."""
    assert scale in ("l1", "l2")
    n = images.shape[0]
    n_features = images[0].size
    flat = images.reshape(n, -1)
    flat = flat - flat.mean(axis=1, keepdims=True)
    if scale == "l1":
        s = jnp.abs(flat).mean(axis=1, keepdims=True)
    else:
        s = jnp.sqrt(jnp.square(flat).sum(axis=1, keepdims=True)) / n_features
    return (flat / s).reshape(images.shape)


def grayscale(images: Array) -> Array:
    """Channel-mean grayscale, keeps a single channel (transformations.py:163-175)."""
    return images.mean(axis=-1, keepdims=True)


# string ids matching the reference's TRANSFORMS registry (transformations.py:20)
FILTERS = {
    "blur": lambda x, m: gaussian_blur(x, float(m)),
    "sharpen": lambda x, m: unsharp_mask(x, float(m) * 100.0),
    "hpf": lambda x, m: high_pass_filter(x, int(m)),
    "lpf": lambda x, m: low_pass_filter(x, int(m)),
}
