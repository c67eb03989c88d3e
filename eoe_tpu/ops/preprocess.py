"""Device-side preprocessing / augmentation pipelines.

The reference splits its torchvision pipelines into per-worker CPU transforms
and GPU "dual" transforms at runtime (bases.py:412-468) and keeps serializable
string placeholders like 'normalize' that are replaced once dataset statistics
are known (bases.py:293-372). This module is the TPU-native redesign of that
whole mechanism:

  * a pipeline is a declarative list of **specs** — plain dicts / strings,
    JSON-serializable, stored in setup.json and checkpoints exactly like the
    reference's transform reprs;
  * ``compile_pipeline(specs, stats)`` resolves placeholders against the
    dataset statistics and returns ONE pure batched function
    ``fn(images, key) -> images`` over NHWC float32 in [0, 1] that runs fully
    on device inside the jitted train/eval step — XLA fuses the element-wise
    chain; there is no CPU/GPU split and no worker processes;
  * label-conditional pipelines (the reference's ConditionalCompose /
    multiscale MSM machinery, transformations.py:23-61) compile to fixed-shape
    ``jnp.where`` over both branches.

Known, documented deviations from torchvision semantics (all negligible at the
magnitudes the reference uses):
  * ColorJitter applies brightness/contrast/saturation/hue in fixed order
    instead of a random permutation;
  * Resize uses jax.image.resize (linear antialiased / bicubic) instead of PIL
    resampling.
"""

import dataclasses
import os
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from eoe_tpu.ops import filters as F

Array = jax.Array
Spec = Union[str, Dict[str, Any]]

# CLIP's canonical normalization constants (public, from OpenAI CLIP preprocessing)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

NORM_PLACEHOLDERS = ("norm", "normalise", "normalize")
GCN_PLACEHOLDERS = ("gcn-norm", "gcn-normalize", "gcn-normalise")


@dataclasses.dataclass
class DatasetStats:
    """Per-channel statistics extracted from the raw normal train split,
    mirroring the reference's ds_statistics dict carried in snapshots
    (ad_trainer.py:600-605)."""
    mean: Tuple[float, ...]
    std: Tuple[float, ...]
    mode: int = 0  # 0 = STD_NORM, 1 = GCN_NORM (bases.py:22-27)

    def to_json(self):
        return {"mean": list(map(float, self.mean)), "std": list(map(float, self.std)), "mode": self.mode}

    @staticmethod
    def from_json(d):
        if d is None:
            return None
        return DatasetStats(tuple(d["mean"]), tuple(d["std"]), int(d.get("mode", 0)))


# ---------------------------------------------------------------- color ops


def _rgb_to_hsv(img: Array) -> Array:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-12), 0.0)
    dc = jnp.maximum(deltac, 1e-12)
    rc = (maxc - r) / dc
    gc = (maxc - g) / dc
    bc = (maxc - b) / dc
    h = jnp.where(r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(deltac > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(img: Array) -> Array:
    # branch-free formulation: jnp.choose lowers to a per-element select
    # cascade that cost ~14x whole-step throughput on TPU (measured: WRN-224
    # train 262 vs 3684 img/s with/without the hue path)
    h, s, v = img[..., 0], img[..., 1], img[..., 2]

    def channel(n):
        k = jnp.mod(n + h * 6.0, 6.0)
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([channel(5.0), channel(3.0), channel(1.0)], axis=-1)


def _luma(img: Array) -> Array:
    if img.shape[-1] == 1:
        return img[..., 0]
    return 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]


def color_jitter(images: Array, key: Array, brightness: float = 0.0, contrast: float = 0.0,
                 saturation: float = 0.0, hue: float = 0.0) -> Array:
    """Per-sample color jitter (factors sampled like torchvision)."""
    n = images.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    shape = (n, 1, 1, 1)
    if brightness > 0:
        f = jax.random.uniform(kb, shape, minval=max(0.0, 1 - brightness), maxval=1 + brightness)
        images = jnp.clip(images * f, 0.0, 1.0)
    if contrast > 0:
        f = jax.random.uniform(kc, shape, minval=max(0.0, 1 - contrast), maxval=1 + contrast)
        mean = _luma(images).mean(axis=(1, 2)).reshape(n, 1, 1, 1)
        images = jnp.clip(f * images + (1 - f) * mean, 0.0, 1.0)
    if saturation > 0 and images.shape[-1] == 3:
        f = jax.random.uniform(ks, shape, minval=max(0.0, 1 - saturation), maxval=1 + saturation)
        gray = _luma(images)[..., None]
        images = jnp.clip(f * images + (1 - f) * gray, 0.0, 1.0)
    if hue > 0 and images.shape[-1] == 3:
        d = jax.random.uniform(kh, (n, 1, 1), minval=-hue, maxval=hue)
        hsv = _rgb_to_hsv(images)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + d) % 1.0)
        images = _hsv_to_rgb(hsv)
    return images


# ---------------------------------------------------------------- geometric ops


def resize(images: Array, size: Tuple[int, int], method: str = "linear") -> Array:
    n, h, w, c = images.shape
    if (h, w) == tuple(size):
        return images
    return jax.image.resize(images, (n, size[0], size[1], c), method=method)


def _resize_u8(images: Array, size: Tuple[int, int], method: str = "linear") -> Array:
    """resize that keeps identity resizes OUT of the float conversion: a
    same-shape resize passes raw uint8 bytes through (so a leading
    ``resize`` spec over pre-resized blob data doesn't kill the uint8
    index-op prefix); a real resize converts to float first (interpolating
    in uint8 would quantize)."""
    if images.shape[1:3] == tuple(size):
        return images
    return resize(_f32(images), size, method)


def center_crop(images: Array, size: Tuple[int, int]) -> Array:
    n, h, w, c = images.shape
    th, tw = size
    # torchvision pads when the crop is larger than the image
    if th > h or tw > w:
        ph, pw = max(th - h, 0), max(tw - w, 0)
        images = jnp.pad(images, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))
        n, h, w, c = images.shape
    i = (h - th) // 2
    j = (w - tw) // 2
    return images[:, i:i + th, j:j + tw, :]


def random_crop(images: Array, key: Array, size: Tuple[int, int], padding: int = 0,
                resample_degenerate: bool = False) -> Array:
    """Per-sample random crop with optional zero padding.

    Implemented as two per-sample axis gathers (take_along_axis): a vmapped
    dynamic_slice lowers to ~93ms for a 128x256x256x3 batch on v5e while the
    gather form takes 0.4ms — 233x — with bit-identical output (same key
    split and randint draws).

    ``resample_degenerate``: the reference recursively re-draws crops whose
    pixel std is < 1e-15 — all-white JPEG borders in the folder datasets
    (imagenet.py:193-195, imagenetoe.py:146-148, cub.py:131-133,
    custom.py:380-382). Recursion is data-dependent control flow, so the
    fixed-shape equivalent falls back to the center crop (never degenerate
    unless the whole image is), selected per sample with jnp.where."""
    if padding > 0:
        images = jnp.pad(images, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    n, h, w, c = images.shape
    th, tw = size
    ki, kj = jax.random.split(key)
    tops = jax.random.randint(ki, (n,), 0, h - th + 1)
    lefts = jax.random.randint(kj, (n,), 0, w - tw + 1)
    rows = tops[:, None] + jnp.arange(th)
    cols = lefts[:, None] + jnp.arange(tw)
    out = jnp.take_along_axis(images, rows[:, :, None, None], axis=1)
    out = jnp.take_along_axis(out, cols[:, None, :, None], axis=2)
    if resample_degenerate:
        out = _degenerate_to_center(out, images, size)
    return out


def _is_degenerate(out: Array) -> Array:
    """Per-sample constancy mask. The reference's std<1e-15 detects
    exactly-constant crops; max-min over the image axes is the cheap
    equivalent (raw-dtype reads — 4x cheaper than an f32 std for uint8, no
    multiplies, and no flatten-reshape, which materialized a relayouted
    (n, 150528) copy at 0.55ms/step in the acceptance trace)."""
    spread = out.max(axis=(1, 2, 3)) - out.min(axis=(1, 2, 3))
    eps = 0 if out.dtype == jnp.uint8 else jnp.asarray(1e-6, out.dtype)
    return spread <= eps


def _degenerate_to_center(out: Array, images: Array, size,
                          flip: Optional[Array] = None,
                          flip_first: bool = False) -> Array:
    """Replace degenerate (constant) crops by the center crop — the
    fixed-shape equivalent of the reference's re-draw (imagenet.py:193-195).
    ``flip``: (n,1,1,1) bool — when the flip was folded into the crop gather
    (random_crop_hflip), the fallback must match the unfused composition
    bit-for-bit: crop→flip flips the center window in place; flip→crop takes
    the MIRRORED center window of the unflipped image reversed (the two
    differ by one column when (w - tw) is odd)."""
    n, h, w, c = images.shape
    th, tw = size
    center = center_crop(images, size)
    if flip is not None:
        if flip_first:
            ci, cj2 = (h - th) // 2, (w - tw) - (w - tw) // 2
            alt = images[:, ci:ci + th, cj2:cj2 + tw, :][:, :, ::-1, :]
        else:
            alt = center[:, :, ::-1, :]
        center = jnp.where(flip, alt, center)
    return jnp.where(_is_degenerate(out).reshape(n, 1, 1, 1), center, out)


def random_crop_hflip(images: Array, key_crop: Array, key_flip: Array,
                      size: Tuple[int, int], padding: int = 0, p: float = 0.5,
                      resample_degenerate: bool = False,
                      flip_first: bool = False) -> Array:
    """random_crop and random_hflip FUSED into one pair of gathers: the flip
    becomes a per-sample reversal of the crop's column indices, eliminating
    the standalone ``reverse`` ops (1.24ms/step in the CLIP acceptance trace)
    and one full-batch materialization. Bit-identical to the unfused ops —
    each draws from its own key exactly as alone; ``flip_first`` selects the
    hflip→crop composition (WRN/CIFAR stacks) vs crop→hflip (CLIP stacks):

      flip(crop(x))[i, j] = x[top+i, left + (tw-1-j)]            (mirror cols)
      crop(flip(x))[i, j] = x[top+i, (W-1) - left - j]           (mirror offsets)
    """
    if padding > 0:
        images = jnp.pad(images, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    n, h, w, c = images.shape
    th, tw = size
    ki, kj = jax.random.split(key_crop)
    tops = jax.random.randint(ki, (n,), 0, h - th + 1)
    lefts = jax.random.randint(kj, (n,), 0, w - tw + 1)
    flip = jax.random.bernoulli(key_flip, p, (n, 1, 1, 1))
    j = jnp.arange(tw)
    if flip_first:
        cols = jnp.where(flip[:, :, 0, 0], (w - 1) - lefts[:, None] - j,
                         lefts[:, None] + j)
    else:
        cols = lefts[:, None] + jnp.where(flip[:, :, 0, 0], tw - 1 - j, j)
    rows = tops[:, None] + jnp.arange(th)
    out = jnp.take_along_axis(images, rows[:, :, None, None], axis=1)
    out = jnp.take_along_axis(out, cols[:, None, :, None], axis=2)
    if resample_degenerate:
        out = _degenerate_to_center(out, images, size, flip=flip,
                                    flip_first=flip_first)
    return out


def random_hflip(images: Array, key: Array, p: float = 0.5) -> Array:
    n = images.shape[0]
    flip = jax.random.bernoulli(key, p, (n, 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def _f32(images: Array) -> Array:
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images


def color_jitter_crop_flip(images: Array, key_jit: Array, key_crop: Array,
                           key_flip: Optional[Array] = None, *,
                           size: Tuple[int, int], p: float = 0.5,
                           resample_degenerate: bool = False,
                           brightness: float = 0.0, contrast: float = 0.0,
                           saturation: float = 0.0, hue: float = 0.0) -> Array:
    """color_jitter → random_crop [→ random_hflip] FUSED (padding-0 crops).

    The unfused order (the reference's CLIP fine-tune stack,
    train_clip_imagenet.py:28-37: ColorJitter before RandomCrop) forces the
    crop gathers into float space and runs the jitter arithmetic over the
    full pre-crop image. The fusion keeps the math but reorders the data
    movement:

      * the contrast statistic (per-image luma mean AFTER brightness — the
        only full-resolution support in the chain) is computed as a fused
        read+reduce over the raw input, with no full-size float write;
      * the crop(+flip) gathers run on the RAW dtype (uint8 inputs move 4x
        fewer bytes — 689µs/step of f32 gather relayout copies in the CLIP
        acceptance trace);
      * the remaining jitter chain is purely per-pixel once the mean is
        precomputed, so it runs at CROP resolution as ONE fused elementwise
        pass (the reduction that split the unfused chain in two is gone).

    Per-pixel identical to the unfused composition: every jitter stage is
    elementwise given (factors, mean), and uint8→float conversion commutes
    with the gathers. Factors/offsets draw from each op's own key exactly as
    unfused. One documented deviation: ``resample_degenerate`` tests the RAW
    crop's constancy, while the unfused order tests the jittered crop (the
    reference retries on the fully transformed tensor, imagenet.py:193-195).
    A constant crop is constant under jitter and vice versa except when
    clipping collapses a near-saturated crop's spread — with the reference's
    ±0.01 factors that needs every pixel within 1% of white, i.e. exactly the
    all-white-border case both verdicts already flag."""
    n = images.shape[0]
    shape = (n, 1, 1, 1)
    kb, kc, ks, kh = jax.random.split(key_jit, 4)
    fb = fc = None
    if brightness > 0:
        fb = jax.random.uniform(kb, shape, minval=max(0.0, 1 - brightness),
                                maxval=1 + brightness)
    if contrast > 0:
        fc = jax.random.uniform(kc, shape, minval=max(0.0, 1 - contrast),
                                maxval=1 + contrast)
        full = _f32(images)
        if fb is not None:
            full = jnp.clip(full * fb, 0.0, 1.0)
        mean = _luma(full).mean(axis=(1, 2)).reshape(n, 1, 1, 1)
    if key_flip is not None:
        out = random_crop_hflip(images, key_crop, key_flip, size=size, p=p,
                                resample_degenerate=resample_degenerate)
    else:
        out = random_crop(images, key_crop, size=size,
                          resample_degenerate=resample_degenerate)
    out = _f32(out)
    if fb is not None:
        out = jnp.clip(out * fb, 0.0, 1.0)
    if fc is not None:
        out = jnp.clip(fc * out + (1 - fc) * mean, 0.0, 1.0)
    if saturation > 0 and out.shape[-1] == 3:
        fs = jax.random.uniform(ks, shape, minval=max(0.0, 1 - saturation),
                                maxval=1 + saturation)
        out = jnp.clip(fs * out + (1 - fs) * _luma(out)[..., None], 0.0, 1.0)
    if hue > 0 and out.shape[-1] == 3:
        d = jax.random.uniform(kh, (n, 1, 1), minval=-hue, maxval=hue)
        hsv = _rgb_to_hsv(out)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + d) % 1.0)
        out = _hsv_to_rgb(hsv)
    return out


def gaussian_noise(images: Array, key: Array, std: float) -> Array:
    """Additive Gaussian noise (reference transformations.py's Noise /
    torch.randn_like). EOE_TPU_RBG_NOISE=1 draws the bits from the TPU
    hardware RNG (the ``rbg`` PRNG impl → XLA RngBitGenerator) instead of
    threefry — a measured NEGATIVE for the default: isolated, the rbg draw
    is 10x cheaper (0.018ms vs 0.186ms for a (256,224,224,3) normal on
    v5e), but end-to-end on the CLIP acceptance step it recovers nothing
    (4039.6 vs 4050.7 img/s, within noise) — the augmentation ladder's
    ~2% noise term is the fusion-boundary materialization of the noise
    chain, not bit generation, and the rng custom call breaks the same
    fusion. Kept opt-in because rbg bits also aren't sharding/vmap-stable
    the way threefry's are (the stream itself was never reference-pinned;
    torch draws its own)."""
    if os.environ.get("EOE_TPU_RBG_NOISE", "0") != "0":
        data = jax.random.key_data(key).ravel()
        key = jax.random.wrap_key_data(jnp.tile(data, 2)[:4], impl="rbg")
    return images + std * jax.random.normal(key, images.shape, dtype=images.dtype)


def normalize(images: Array, mean: Sequence[float], std: Sequence[float]) -> Array:
    mean = jnp.asarray(mean, dtype=images.dtype).reshape(1, 1, 1, -1)
    std = jnp.asarray(std, dtype=images.dtype).reshape(1, 1, 1, -1)
    return (images - mean) / std


def _normalize_rt(images: Array, rt_stats, mean, std) -> Array:
    """Normalize preferring runtime-traced stats (so one compiled pipeline
    serves every class/seed; per-class stats are inputs, not constants)."""
    if rt_stats is not None:
        return normalize(images, rt_stats[0], rt_stats[1])
    return normalize(images, mean, std)


# ---------------------------------------------------------------- spec compiler


def _canon(spec: Spec) -> Dict[str, Any]:
    if isinstance(spec, str):
        return {"op": spec}
    return dict(spec)


class PipelineError(ValueError):
    pass


def compile_pipeline(specs: Sequence[Spec], stats: Optional[DatasetStats] = None,
                     degenerate_crop_guard: bool = False,
                     ) -> Callable[[Array, Optional[Array]], Array]:
    """Compile transform specs into one batched device function
    ``fn(images, key) -> images``. ``key`` may be None if no spec is random.

    ``degenerate_crop_guard``: default for ``random_crop``'s
    ``resample_degenerate`` (folder-backed datasets set it so any pipeline
    they feed gets the reference's white-crop resampling; an explicit
    per-spec ``resample_degenerate`` key still wins)."""
    steps: List[Tuple[bool, Callable]] = []  # (needs_key, fn); fn may take rt_stats kw
    STATS_OP = "__stats__"  # sentinel: fn additionally receives runtime stats
    # index-only ops (flips, crops) commute with the monotone uint8->float
    # conversion, so they run on the raw bytes: a batched hflip reverse moves
    # 4x fewer bytes in uint8 than in f32 (measured 0.94ms/step of f32
    # `reverse` on the v5e CLIP bench)
    U8_SAFE = {"random_hflip", "random_horizontal_flip", "random_crop",
               "center_crop"}

    u8_safe: List[bool] = []  # parallel to steps
    HFLIP_OPS = ("random_hflip", "random_horizontal_flip")

    def _crop_kw(s):
        size = s["size"]
        return dict(size=(size, size) if isinstance(size, int) else tuple(size),
                    padding=int(s.get("padding", 0)),
                    resample_degenerate=bool(s.get("resample_degenerate",
                                                   degenerate_crop_guard)))

    specs_list = list(specs or ())
    skip = 0
    for si, raw in enumerate(specs_list):
        if skip:
            skip -= 1
            continue
        s = _canon(raw)
        op = s["op"].lower()
        nxt = _canon(specs_list[si + 1]) if si + 1 < len(specs_list) else {}
        nxt_op = str(nxt.get("op", "")).lower()
        n_before = len(steps)
        # peephole: color_jitter + random_crop (+ random_hflip) fuse into
        # color_jitter_crop_flip — raw-dtype gathers, full-support contrast
        # statistic, single elementwise jitter pass at crop resolution (see
        # its docstring). Padding-0 crops only: zero padding applied BEFORE
        # jitter would be jittered (contrast mixes 0 toward the mean), so
        # padded crops keep the unfused order.
        if (op == "color_jitter" and nxt_op == "random_crop"
                and int(nxt.get("padding", 0) or 0) == 0
                and os.environ.get("EOE_TPU_FUSE_JITTER_CROP", "1") != "0"):
            nxt2 = _canon(specs_list[si + 2]) if si + 2 < len(specs_list) else {}
            has_flip = str(nxt2.get("op", "")).lower() in HFLIP_OPS
            ckw = _crop_kw(nxt)
            ckw.pop("padding")
            fn = partial(
                color_jitter_crop_flip,
                brightness=float(s.get("brightness", 0.0)),
                contrast=float(s.get("contrast", 0.0)),
                saturation=float(s.get("saturation", 0.0)),
                hue=float(s.get("hue", 0.0)),
                p=float(nxt2.get("p", 0.5)) if has_flip else 0.5, **ckw)
            steps.append((3 if has_flip else 2, fn))
            u8_safe.append(True)  # converts internally, after the gathers
            skip = 2 if has_flip else 1
            continue
        # peephole: adjacent random_crop + random_hflip fuse into ONE pair of
        # gathers (random_crop_hflip) — the flip rides the crop's column
        # indices, bit-identical to the unfused ops (each keeps its own key,
        # consumed in spec order), killing the standalone reverse ops
        # (1.24ms/step in the CLIP acceptance trace)
        if op == "random_crop" and nxt_op in HFLIP_OPS:
            steps.append((2, partial(random_crop_hflip, flip_first=False,
                                     p=float(nxt.get("p", 0.5)), **_crop_kw(s))))
            u8_safe.append(True)
            skip = 1
            continue
        if op in HFLIP_OPS and nxt_op == "random_crop":
            fn = partial(random_crop_hflip, flip_first=True,
                         p=float(s.get("p", 0.5)), **_crop_kw(nxt))
            # unfused order draws the flip's key FIRST; preserve it
            steps.append((2, lambda x, k1, k2, fn=fn: fn(x, k2, k1)))
            u8_safe.append(True)
            skip = 1
            continue
        if op in ("to_tensor", "totensor", "rgb"):
            continue  # images are already float NHWC in [0,1]
        elif op == "resize":
            size = s["size"]
            size = (size, size) if isinstance(size, int) else tuple(size)
            # u8-safe wrapper: a resize whose target equals the input shape
            # (pre-resized blobs, synthetic benches) must not break the
            # uint8 index-op prefix; real resizes convert to float first
            steps.append((False, partial(_resize_u8, size=size,
                                         method=s.get("method", "linear"))))
            u8_safe.append(True)
            continue
        elif op == "center_crop":
            size = s["size"]
            size = (size, size) if isinstance(size, int) else tuple(size)
            steps.append((False, partial(center_crop, size=size)))
        elif op == "random_crop":
            steps.append((True, partial(random_crop, **_crop_kw(s))))
        elif op in ("random_hflip", "random_horizontal_flip"):
            steps.append((True, partial(random_hflip, p=float(s.get("p", 0.5)))))
        elif op == "color_jitter":
            steps.append((True, partial(
                color_jitter,
                brightness=float(s.get("brightness", 0.0)), contrast=float(s.get("contrast", 0.0)),
                saturation=float(s.get("saturation", 0.0)), hue=float(s.get("hue", 0.0)))))
        elif op == "gaussian_noise":
            steps.append((True, partial(gaussian_noise, std=float(s["std"]))))
        elif op == "grayscale":
            steps.append((False, F.grayscale))
        elif op == "blur":
            steps.append((False, partial(F.gaussian_blur, sigma=float(s["sigma"]))))
        elif op == "sharpen":
            steps.append((False, partial(F.unsharp_mask, percent=float(s["percent"]))))
        elif op == "hpf":
            steps.append((False, partial(F.high_pass_filter, magnitude=int(s["magnitude"]))))
        elif op == "lpf":
            steps.append((False, partial(F.low_pass_filter, magnitude=int(s["magnitude"]))))
        elif op == "minmax_norm":
            steps.append((False, F.minmax_norm))
        elif op == "gcn":
            steps.append((False, partial(F.global_contrast_normalization, scale=s.get("scale", "l1"))))
        elif op in NORM_PLACEHOLDERS:
            if stats is None:
                raise PipelineError(
                    "pipeline contains 'normalize' but no dataset statistics were provided; "
                    "they are extracted from the raw normal train split (see datasets.bases)")
            steps.append((STATS_OP, partial(_normalize_rt, mean=stats.mean, std=stats.std)))
        elif op in GCN_PLACEHOLDERS:
            if stats is None:
                raise PipelineError("pipeline contains 'gcn-normalize' but no dataset statistics were provided")
            steps.append((False, partial(F.global_contrast_normalization, scale="l1")))
            steps.append((STATS_OP, partial(_normalize_rt, mean=stats.mean, std=stats.std)))
        elif op == "clip_pil_preprocessing":
            # bicubic resize + RGB conversion to CLIP's 224 input (clip.py:58-65;
            # the reference's _convert_image_to_rgb expands grayscale datasets)
            res = int(s.get("resolution", 224))

            def _clip_pil(x, res=res):
                if x.shape[-1] == 1:
                    x = jnp.repeat(x, 3, axis=-1)  # index-only: u8-safe
                return _resize_u8(x, size=(res, res), method="cubic")

            steps.append((False, _clip_pil))
            u8_safe.append(True)  # identity resizes pass raw bytes through
            continue
        elif op == "clip_tensor_preprocessing":
            steps.append((False, partial(normalize, mean=CLIP_MEAN, std=CLIP_STD)))
        elif op == "normalize_with":
            steps.append((False, partial(normalize, mean=tuple(s["mean"]), std=tuple(s["std"]))))
        elif op == "lambda":
            raise PipelineError("arbitrary lambdas are not serializable; add a named op instead")
        else:
            raise PipelineError(f"unknown transform op: {op!r} (spec {raw!r})")
        u8_safe.extend([op in U8_SAFE] * (len(steps) - n_before))

    n_random = sum(int(kind) for kind, _ in steps
                   if kind is True or kind in (2, 3))

    def _to_float(images: Array) -> Array:
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        return images

    def apply(images: Array, key: Optional[Array] = None, rt_stats=None) -> Array:
        """``rt_stats``: optional traced (mean, std) arrays overriding the baked
        statistics, so one compiled train step serves all classes/seeds."""
        images = jnp.asarray(images)
        keys = jax.random.split(key, n_random) if (n_random and key is not None) else None
        if n_random and key is None:
            raise PipelineError("pipeline contains random ops but no PRNG key was passed")
        ki = 0
        for (kind, fn), safe in zip(steps, u8_safe):
            if not safe:
                images = _to_float(images)
            if kind is True:
                images = fn(images, keys[ki])
                ki += 1
            elif kind == 2:  # fused pair: consumes both ops' keys in spec order
                images = fn(images, keys[ki], keys[ki + 1])
                ki += 2
            elif kind == 3:  # fused jitter+crop+flip: all three ops' keys
                images = fn(images, keys[ki], keys[ki + 1], keys[ki + 2])
                ki += 3
            elif kind == STATS_OP:
                images = fn(images, rt_stats)
            else:
                images = fn(images)
        return _to_float(images)

    apply.specs = list(specs or ())
    apply.n_random = n_random
    # bf16-safe: every op tolerates low-precision inputs (jnp.fft needs f32)
    ops_used = {_canon(s)["op"].lower() for s in (specs or ())}
    apply.low_precision_safe = not (ops_used & {"hpf", "lpf", "gcn",
                                                *GCN_PLACEHOLDERS})
    return apply


def compile_conditional(conditionals: Sequence[Tuple[int, Optional[Sequence[Spec]], Optional[Sequence[Spec]]]],
                        stats: Optional[DatasetStats] = None,
                        degenerate_crop_guard: bool = False) -> Callable[[Array, Array, Optional[Array]], Array]:
    """Compile label-conditional transforms: list of (cond, specs_eq, specs_neq).

    Equivalent to the reference's batched-GPU ConditionalCompose
    (transformations.py:40-53): both branches are computed on the whole batch
    and merged with jnp.where on the label — fixed shapes under jit."""
    compiled = [
        (cond,
         compile_pipeline(t1 or [], stats, degenerate_crop_guard),
         compile_pipeline(t2 or [], stats, degenerate_crop_guard))
        for cond, t1, t2 in (conditionals or ())
    ]
    n_random = sum(f1.n_random + f2.n_random for _, f1, f2 in compiled)

    def apply(images: Array, labels: Array, key: Optional[Array] = None, rt_stats=None) -> Array:
        images = jnp.asarray(images)
        # only convert when branches actually run (jnp.where merges arithmetic
        # results); an empty conditional list must pass uint8 through so the
        # main pipeline's index-only prefix keeps its 4x cheaper byte moves
        if compiled and images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        for cond, f1, f2 in compiled:
            k1 = k2 = None
            if key is not None:
                key, k1, k2 = jax.random.split(key, 3)
            a = f1(images, k1, rt_stats)
            b = f2(images, k2, rt_stats)
            images = jnp.where(labels.reshape(-1, 1, 1, 1) == cond, a, b)
        return images

    apply.n_random = n_random
    apply.conditionals = list(conditionals or ())
    return apply


def specs_repr(specs: Sequence[Spec]) -> str:
    """Canonical string form for setup.json matching / resume asserts
    (the reference compares transform reprs, main/__init__.py:576-589)."""
    import json
    return json.dumps([_canon(s) for s in (specs or ())], sort_keys=True)
