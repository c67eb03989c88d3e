"""ROC/PRC/AUROC vs sklearn (the reference's metric backend, ad_trainer.py:498-547)."""

import jax.numpy as jnp
import numpy as np
import pytest
import sklearn.metrics as skm

from eoe_tpu.ops import metrics as M


@pytest.mark.parametrize("ties", [False, True])
def test_roc_matches_sklearn(rng, ties):
    y = rng.integers(0, 2, 300)
    s = rng.normal(size=300) + y * 0.7
    if ties:
        s = np.round(s, 1)
    assert M.auroc(y, s) == pytest.approx(skm.roc_auc_score(y, s), abs=1e-12)


def test_prc_matches_sklearn(rng):
    y = rng.integers(0, 2, 300)
    s = np.round(rng.normal(size=300) + y * 0.7, 1)
    assert M.average_precision(y, s) == pytest.approx(skm.average_precision_score(y, s), abs=1e-12)


def test_auroc_jax_matches_host(rng):
    y = rng.integers(0, 2, 500)
    s = np.round(rng.normal(size=500) + y * 0.5, 1)
    assert float(M.auroc_jax(jnp.array(y), jnp.array(s))) == pytest.approx(M.auroc(y, s), abs=1e-5)


def test_auroc_jax_weights_mask(rng):
    y = rng.integers(0, 2, 200)
    s = rng.normal(size=200) + y
    w = np.zeros(200, np.float32)
    w[:120] = 1
    masked = float(M.auroc_jax(jnp.array(y), jnp.array(s), jnp.array(w)))
    assert masked == pytest.approx(M.auroc(y[:120], s[:120]), abs=1e-5)


def test_auroc_jax_excludes_negative_labels(rng):
    y = rng.integers(0, 2, 200)
    s = rng.normal(size=200) + y
    y2 = y.copy()
    y2[150:] = -1  # 'unlabeled' (ad_trainer.py:517-521)
    ours = float(M.auroc_jax(jnp.array(y2), jnp.array(s)))
    assert ours == pytest.approx(M.auroc(y[:150], s[:150]), abs=1e-5)


def test_auroc_degenerate_single_class():
    assert np.isnan(float(M.auroc_jax(jnp.zeros(10, int), jnp.arange(10.0))))


def test_channel_stats_vs_numpy(rng):
    imgs = rng.integers(0, 256, size=(50, 8, 8, 3), dtype=np.uint8)
    mean, std = M.channel_stats(imgs)
    x = imgs.reshape(-1, 3).astype(np.float64) / 255.0
    np.testing.assert_allclose(mean, x.mean(0), atol=1e-5)
    np.testing.assert_allclose(std, x.std(0, ddof=1), atol=1e-5)


def test_running_stats_matches_oneshot(rng):
    x = rng.normal(size=(1000, 3)).astype(np.float32)
    rs = M.RunningStats()
    for chunk in np.array_split(x, 7):
        rs.add(chunk)
    np.testing.assert_allclose(rs.get_mean(), x.mean(0), atol=1e-5)
    np.testing.assert_allclose(rs.get_std(), x.std(0, ddof=1), atol=1e-5)


def test_tracker_smoothing_and_counts(capsys):
    from eoe_tpu.utils.logger import Logger, Tracker
    lg = Logger("/tmp/eoe_trk", active=False)
    val = [2.0]
    with lg.track([2, 2], {"loss": lambda: val[0]}, "t") as tr:
        for ep in range(2):
            for s in range(2):
                val[0] *= 0.5
                tr.update([0, 1])
            tr.update([1, 0])
    assert tr.counts[0] == 2
    assert tr.n == 4
    assert 0 < tr._smoothed["loss"] < 2.0
