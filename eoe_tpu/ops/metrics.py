"""Evaluation metrics: ROC / PRC curves, AUROC, average precision.

The reference computes these on host with sklearn (ad_trainer.py:498-547).
We provide:
  * host-side exact curves (numpy, tie-handling identical to sklearn) used for
    the logged ROC/PRC artifacts and the official AUROC numbers,
  * ``auroc_jax`` — an O(n log n) jit/vmap-compatible AUROC (rank statistic,
    average ranks over ties) for on-device use, e.g. vmapped evolutionary
    fitness over candidates without host round-trips. With tie-averaged ranks
    this equals the trapezoidal ROC AUC exactly.

Label convention follows the reference: anomalous == 1 is the positive class,
samples with label < 0 ("unlabeled" in custom datasets) are excluded
(ad_trainer.py:517-521) — in the jit version via a weights mask.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class ROC(NamedTuple):
    tpr: np.ndarray
    fpr: np.ndarray
    thresholds: np.ndarray
    auc: float

    def get_score(self):
        return self.auc


class PRC(NamedTuple):
    prec: np.ndarray
    rec: np.ndarray
    thresholds: np.ndarray
    avg_prec: float

    def get_score(self):
        return self.avg_prec


def _binary_clf_curve(labels: np.ndarray, scores: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cumulative TP/FP per distinct threshold, descending — sklearn-compatible."""
    labels = np.asarray(labels).reshape(-1)
    scores = np.asarray(scores, dtype=np.float64).reshape(-1)
    order = np.argsort(-scores, kind="mergesort")
    scores, labels = scores[order], labels[order]
    # indices of last occurrence of each distinct score
    distinct = np.where(np.diff(scores))[0]
    threshold_idxs = np.r_[distinct, labels.size - 1]
    tps = np.cumsum(labels == 1)[threshold_idxs].astype(np.float64)
    fps = (1 + threshold_idxs) - tps
    return fps, tps, scores[threshold_idxs]


def roc_curve(labels, scores) -> ROC:
    """ROC curve + trapezoidal AUC. Equivalent to sklearn.metrics.roc_curve/auc
    with drop_intermediate=False prepended (0,0)."""
    fps, tps, thr = _binary_clf_curve(labels, scores)
    tps = np.r_[0.0, tps]
    fps = np.r_[0.0, fps]
    thr = np.r_[np.inf, thr]
    tpr = tps / tps[-1] if tps[-1] > 0 else np.zeros_like(tps)
    fpr = fps / fps[-1] if fps[-1] > 0 else np.zeros_like(fps)
    auc = float(np.trapezoid(tpr, fpr))
    return ROC(tpr=tpr, fpr=fpr, thresholds=thr, auc=auc)


def precision_recall_curve(labels, scores) -> PRC:
    """PRC + average precision, matching sklearn semantics (AP = sum over
    thresholds of (R_n - R_{n-1}) * P_n)."""
    fps, tps, thr = _binary_clf_curve(labels, scores)
    denom = tps + fps
    prec = np.divide(tps, denom, out=np.zeros_like(tps), where=denom > 0)
    rec = tps / tps[-1] if tps[-1] > 0 else np.zeros_like(tps)
    ap = float(np.sum(np.diff(np.r_[0.0, rec]) * prec))
    # sklearn returns curves reversed with an appended (p=1, r=0) point
    prec_out = np.r_[prec[::-1], 1.0]
    rec_out = np.r_[rec[::-1], 0.0]
    return PRC(prec=prec_out, rec=rec_out, thresholds=thr[::-1], avg_prec=ap)


def auroc(labels, scores) -> float:
    return roc_curve(labels, scores).auc


def average_precision(labels, scores) -> float:
    return precision_recall_curve(labels, scores).avg_prec


# ---------------------------------------------------------------- jit AUROC


def auroc_jax(labels: Array, scores: Array, weights: Optional[Array] = None) -> Array:
    """AUROC as a Mann-Whitney U rank statistic (jit/vmap compatible).

    With ties resolved via average ranks this is exactly the trapezoidal AUC.
    ``weights`` masks samples out (e.g. label < 0 or padding); masked samples
    are sorted to the bottom with -inf scores and excluded from the ranks.
    """
    scores = scores.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1)
    if weights is None:
        weights = jnp.ones_like(scores)
    weights = weights.astype(jnp.float32) * (labels >= 0)
    pos = (labels == 1).astype(jnp.float32) * weights
    neg = (labels != 1).astype(jnp.float32) * weights

    masked = jnp.where(weights > 0, scores, -jnp.inf)
    order = jnp.argsort(masked)
    s_sorted = masked[order]
    w_sorted = weights[order]
    # rank among included samples only (1-based over cumulative weights)
    cumw = jnp.cumsum(w_sorted)
    ranks_raw = cumw  # rank of each sorted position
    # average ranks over tied groups: segment mean of ranks_raw grouped by equal score
    n = scores.shape[0]
    idx = jnp.arange(n)
    new_grp = jnp.concatenate([jnp.array([True]), s_sorted[1:] != s_sorted[:-1]])
    grp_id = jnp.cumsum(new_grp) - 1
    # group sums of (rank * w) and w via segment_sum
    grp_rank_sum = jax.ops.segment_sum(ranks_raw * w_sorted, grp_id, num_segments=n)
    grp_w_sum = jax.ops.segment_sum(w_sorted, grp_id, num_segments=n)
    avg_rank = jnp.where(grp_w_sum > 0, grp_rank_sum / jnp.maximum(grp_w_sum, 1.0), 0.0)[grp_id]
    # place back to original order
    ranks = jnp.zeros(n, dtype=jnp.float32).at[order].set(avg_rank)

    n_pos = pos.sum()
    n_neg = neg.sum()
    sum_pos_ranks = (ranks * pos).sum()
    u = sum_pos_ranks - n_pos * (n_pos + 1.0) / 2.0
    return jnp.where((n_pos > 0) & (n_neg > 0), u / jnp.maximum(n_pos * n_neg, 1.0), jnp.nan)


# ---------------------------------------------------------------- running stats


class RunningStats:
    """Welford-style streaming per-channel mean/std (replaces utils/stats.py:5).

    Add batches of shape (n, channels); mean()/std() return per-channel values.
    Internally a jitted combine so big array-resident datasets reduce on device.
    """

    def __init__(self):
        self.n = 0.0
        self.mean = None
        self.m2 = None

    def add(self, x):
        x = jnp.asarray(x, dtype=jnp.float32)
        x = x.reshape(-1, x.shape[-1])
        b_n = x.shape[0]
        b_mean = jnp.mean(x, axis=0)
        b_m2 = jnp.sum(jnp.square(x - b_mean), axis=0)
        if self.mean is None:
            self.n, self.mean, self.m2 = float(b_n), b_mean, b_m2
            return
        delta = b_mean - self.mean
        tot = self.n + b_n
        self.mean = self.mean + delta * (b_n / tot)
        self.m2 = self.m2 + b_m2 + jnp.square(delta) * self.n * b_n / tot
        self.n = tot

    def get_mean(self) -> np.ndarray:
        return np.asarray(self.mean)

    def get_std(self) -> np.ndarray:
        return np.asarray(jnp.sqrt(self.m2 / jnp.maximum(self.n - 1.0, 1.0)))


@jax.jit
def _channel_sums(x):
    # reduce the leading axes of the natural (n, h, w, c) layout in one
    # fusion. Do NOT reshape to (n*h*w, c): a 2D array with a 3-lane minor
    # dim is a pathological TPU shape — jnp.std over f32[102M, 3] measured
    # ~9 MINUTES on v5e where this form takes ~45ms.
    xf = x.astype(jnp.float32) / (255.0 if x.dtype == jnp.uint8 else 1.0)
    axes = tuple(range(x.ndim - 1))
    return jnp.sum(xf, axis=axes), jnp.sum(jnp.square(xf), axis=axes)


def channel_stats(images) -> Tuple[np.ndarray, np.ndarray]:
    """One-shot per-channel mean/std of an (n, h, w, c) uint8/float array.

    Equivalent to the reference's RunningStats pass over the raw normal train
    split (bases.py:334-345) but as a single jitted reduction on device.
    """
    x = jnp.asarray(images)
    n = float(np.prod(x.shape[:-1]))
    s1, s2 = _channel_sums(x)
    mean = np.asarray(s1) / n
    # reference uses the unbiased (n-1) std of the per-pixel sample population
    var = (np.asarray(s2) - n * mean ** 2) / max(n - 1.0, 1.0)
    return mean, np.sqrt(np.maximum(var, 0.0))
