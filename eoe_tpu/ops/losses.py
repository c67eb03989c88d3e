"""Anomaly-detection objectives as pure JAX functions.

Each objective provides
  * ``loss(features, labels, center, *, nominal_label=0, inputs=None)`` — scalar
    training loss over a batch of model outputs (shape ``(n, d)`` or ``(n, 1)``),
  * ``score(features, center, *, nominal_label=0, inputs=None)`` — per-sample
    anomaly scores (shape ``(n,)``; larger = more anomalous).

Semantics match the reference trainers (behavioral parity targets, not code):
HSC   — /root/reference/src/eoe/training/hsc.py:12-21
BCE   — /root/reference/src/eoe/training/bce.py:15-20
focal — /root/reference/src/eoe/training/focal.py:11-36
DSVDD — /root/reference/src/eoe/training/dsvdd.py:10-27
DSAD  — /root/reference/src/eoe/training/dsad.py:12-21
AE    — /root/reference/src/eoe/training/ae.py:12-16
CLIP  — /root/reference/src/eoe/training/clip.py:66-103

Unlike the reference (loss methods on trainer subclasses), these are standalone
pure functions so XLA can fuse them with the model's final projection inside a
single jitted train step, and so they can be vmapped over evolutionary
candidates.

Masking convention: every loss accepts an optional ``weights`` array (0/1 per
sample). This replaces the reference's boolean-indexing (dynamic shapes) with
fixed-shape masked means, which is required under jit.
"""

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-9


def _masked_mean(x: Array, weights: Optional[Array]) -> Array:
    if weights is None:
        return x.mean()
    weights = weights.astype(x.dtype)
    return (x * weights).sum() / jnp.maximum(weights.sum(), 1.0)


def _pseudo_huber(features: Array) -> Array:
    """sqrt(||f||^2 + 1) - 1, the HSC radial distance (hsc.py:13,18)."""
    sq = jnp.sum(jnp.square(features.reshape(features.shape[0], -1)), axis=-1)
    return jnp.sqrt(sq + 1.0) - 1.0


# ---------------------------------------------------------------- HSC


def hsc_score(features: Array, center: Optional[Array] = None, *, nominal_label: int = 0, **_) -> Array:
    dists = _pseudo_huber(features)
    return 1.0 - jnp.exp(-dists)


def hsc_loss(features: Array, labels: Array, center: Optional[Array] = None, *,
             nominal_label: int = 0, weights: Optional[Array] = None, **_) -> Array:
    dists = _pseudo_huber(features)
    scores = 1.0 - jnp.exp(-dists)
    losses = jnp.where(labels == nominal_label, dists, -jnp.log(scores + _EPS))
    return _masked_mean(losses, weights)


# ---------------------------------------------------------------- BCE


def _bce_with_logits(logits: Array, targets: Array) -> Array:
    # numerically stable log(1 + exp(...)) formulation
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def bce_score(features: Array, center: Optional[Array] = None, *, nominal_label: int = 0, **_) -> Array:
    scores = jax.nn.sigmoid(features.reshape(features.shape[0]))
    return scores if nominal_label == 0 else 1.0 - scores


def bce_loss(features: Array, labels: Array, center: Optional[Array] = None, *,
             nominal_label: int = 0, weights: Optional[Array] = None, **_) -> Array:
    logits = features.reshape(features.shape[0])
    return _masked_mean(_bce_with_logits(logits, labels.astype(logits.dtype)), weights)


# ---------------------------------------------------------------- focal


def focal_score(features: Array, center: Optional[Array] = None, *, nominal_label: int = 0, **_) -> Array:
    return bce_score(features, center, nominal_label=nominal_label)


def focal_loss(features: Array, labels: Array, center: Optional[Array] = None, *,
               nominal_label: int = 0, gamma: float = 2.0, eps: float = 1e-7,
               weights: Optional[Array] = None, **_) -> Array:
    logits = features.reshape(features.shape[0])
    bce = _bce_with_logits(logits, labels.astype(logits.dtype))
    pt = jnp.clip(jnp.exp(-bce), eps, 1.0 - eps)
    return _masked_mean((1.0 - pt) ** gamma * bce, weights)


# ---------------------------------------------------------------- DSVDD


def dsvdd_score(features: Array, center: Array, *, nominal_label: int = 0, **_) -> Array:
    return jnp.sum(jnp.square(features - center), axis=-1)


def dsvdd_loss(features: Array, labels: Array, center: Array, *,
               nominal_label: int = 0, weights: Optional[Array] = None, **_) -> Array:
    return _masked_mean(jnp.sum(jnp.square(features - center), axis=-1), weights)


def dsvdd_center(feature_sums: Array, count: Array, *, eps: float = 1e-1) -> Array:
    """Finalize the DSVDD center from summed normal-sample features.

    Mirrors the reference's epsilon clamp that keeps center coordinates away
    from zero (dsvdd.py:19-21): small-magnitude entries are pushed to +-eps.
    Note the reference only clamps strictly negative/positive entries; exact
    zeros stay zero — reproduced here.
    """
    center = feature_sums / jnp.maximum(count, 1.0)
    small = jnp.abs(center) < eps
    center = jnp.where(small & (center < 0), -eps, center)
    center = jnp.where(small & (center > 0), eps, center)
    return center


# ---------------------------------------------------------------- DSAD


def dsad_score(features: Array, center: Optional[Array] = None, *, nominal_label: int = 0, **_) -> Array:
    return hsc_score(features, center, nominal_label=nominal_label)


def dsad_loss(features: Array, labels: Array, center: Optional[Array] = None, *,
              nominal_label: int = 0, weights: Optional[Array] = None, **_) -> Array:
    sq = jnp.sum(jnp.square(features.reshape(features.shape[0], -1)), axis=-1)
    losses = jnp.where(labels == nominal_label, sq, 1.0 / (sq + _EPS))
    return _masked_mean(losses, weights)


# ---------------------------------------------------------------- AE (reconstruction)


def ae_score(features: Array, center: Optional[Array] = None, *, inputs: Array, nominal_label: int = 0, **_) -> Array:
    diff = (features - inputs).reshape(features.shape[0], -1)
    return jnp.sum(jnp.square(diff), axis=-1)


def ae_loss(features: Array, labels: Array, center: Optional[Array] = None, *,
            inputs: Array, nominal_label: int = 0, weights: Optional[Array] = None, **_) -> Array:
    diff = (features - inputs).reshape(features.shape[0], -1)
    return _masked_mean(jnp.sum(jnp.square(diff), axis=-1), weights)


# ---------------------------------------------------------------- CLIP (prompt-based)


def clip_score(image_features: Array, text_features: Array, *, nominal_label: int = 0, **_) -> Array:
    """Anomaly score = softmax over 100*cosine similarities, prob of the last
    (anomaly) prompt (clip.py:66-79). ``text_features`` rows are L2-normalized
    prompt embeddings with the anomaly prompt last."""
    t = text_features / jnp.linalg.norm(text_features, axis=-1, keepdims=True)
    v = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    sim = jax.nn.softmax(100.0 * v @ t.T, axis=-1)
    return sim[:, -1]


def clip_loss(image_features: Array, labels: Array, text_features: Array, *,
              nominal_label: int = 0, ad_mode: str = "one_vs_rest",
              weights: Optional[Array] = None, **_) -> Array:
    """Prompt-contrastive AD loss (clip.py:81-103).

    one_vs_rest: normal samples maximize log-softmax of prompt 0, anomalous
    (OE) samples of the last (anomaly) prompt. leave_one_out: normal samples
    maximize the max over all non-anomaly prompts. ``text_features`` are used
    as-is (the reference normalizes them once in prepare_metric)."""
    anom_label = 1 - nominal_label
    v = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    logp = jax.nn.log_softmax(100.0 * v @ text_features.T, axis=-1)
    aloss = logp[:, -1]
    if ad_mode == "one_vs_rest":
        nloss = logp[:, 0]
    elif ad_mode == "leave_one_out":
        nloss = jnp.max(logp[:, :-1], axis=-1)
    else:
        raise NotImplementedError(f"ad_mode {ad_mode} unknown")
    losses = -jnp.where(labels == anom_label, aloss, nloss)
    return _masked_mean(losses, weights)


# ---------------------------------------------------------------- registry


class Objective:
    """Bundles the loss/score pair of one AD objective.

    Mirrors the reference's TRAINER registry keys (training/__init__.py:8-11);
    the 'ae' objective exists in the reference code base but is unregistered
    there — we register it since it is functional.
    """

    def __init__(self, name: str, loss_fn, score_fn, *, needs_center: bool = False,
                 clf_head: bool = False, uses_inputs: bool = False, is_clip: bool = False):
        self.name = name
        self.loss = loss_fn
        self.score = score_fn
        self.needs_center = needs_center  # requires a prepare_metric pass (DSVDD center / CLIP text prompts)
        self.clf_head = clf_head          # model needs a 1-neuron classification head
        self.uses_inputs = uses_inputs    # loss/score need the raw inputs (AE)
        self.is_clip = is_clip

    def __repr__(self):
        return f"Objective({self.name})"


OBJECTIVES = {
    "hsc": Objective("hsc", hsc_loss, hsc_score),
    "bce": Objective("bce", bce_loss, bce_score, clf_head=True),
    "focal": Objective("focal", focal_loss, focal_score, clf_head=True),
    "dsvdd": Objective("dsvdd", dsvdd_loss, dsvdd_score, needs_center=True),
    "dsad": Objective("dsad", dsad_loss, dsad_score),
    "ae": Objective("ae", ae_loss, ae_score, uses_inputs=True),
    "clip": Objective("clip", clip_loss, clip_score, needs_center=True, is_clip=True),
}
