"""Objective losses/scores vs hand-computed torch reference formulas
(reference: src/eoe/training/{hsc,bce,focal,dsvdd,dsad,ae,clip}.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from eoe_tpu.ops import losses as L

N, D = 16, 32


@pytest.fixture
def feats(rng):
    return rng.normal(size=(N, D)).astype(np.float32)


@pytest.fixture
def labels(rng):
    lab = np.zeros(N, dtype=np.int64)
    lab[N // 2:] = 1
    return lab


def torch_hsc_loss(f, lab, nominal=0):
    f = torch.tensor(f)
    dists = torch.sqrt(torch.norm(f, p=2, dim=1) ** 2 + 1) - 1
    scores = 1 - torch.exp(-dists)
    return float(torch.where(torch.tensor(lab) == nominal, dists, -torch.log(scores + 1e-9)).mean())


def test_hsc_loss_matches_reference(feats, labels):
    ours = float(L.hsc_loss(jnp.array(feats), jnp.array(labels)))
    assert ours == pytest.approx(torch_hsc_loss(feats, labels), rel=1e-5)


def test_hsc_score_matches_reference(feats):
    f = torch.tensor(feats)
    dists = torch.sqrt(torch.norm(f, p=2, dim=1) ** 2 + 1) - 1
    ref = (1 - torch.exp(-dists)).numpy()
    np.testing.assert_allclose(np.asarray(L.hsc_score(jnp.array(feats))), ref, rtol=1e-5)


def test_bce_loss_matches_reference(rng, labels):
    logits = rng.normal(size=(N, 1)).astype(np.float32)
    ref = float(tF.binary_cross_entropy_with_logits(
        torch.tensor(logits).squeeze(), torch.tensor(labels).float()))
    ours = float(L.bce_loss(jnp.array(logits), jnp.array(labels)))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_bce_score_nominal_label_flip(rng):
    logits = rng.normal(size=(N, 1)).astype(np.float32)
    s0 = np.asarray(L.bce_score(jnp.array(logits), nominal_label=0))
    s1 = np.asarray(L.bce_score(jnp.array(logits), nominal_label=1))
    np.testing.assert_allclose(s0 + s1, 1.0, rtol=1e-6)
    ref = torch.sigmoid(torch.tensor(logits).squeeze()).numpy()
    np.testing.assert_allclose(s0, ref, rtol=1e-5)


def test_focal_loss_matches_reference(rng, labels):
    logits = rng.normal(size=(N, 1)).astype(np.float32)
    bce = tF.binary_cross_entropy_with_logits(
        torch.tensor(logits).squeeze(), torch.tensor(labels).float(), reduction="none")
    pt = torch.exp(-bce).clamp(1e-7, 1 - 1e-7)
    ref = float(((1 - pt) ** 2.0 * bce).mean())
    ours = float(L.focal_loss(jnp.array(logits), jnp.array(labels)))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_dsvdd_loss_and_score(feats, labels, rng):
    center = rng.normal(size=(D,)).astype(np.float32)
    ref_score = ((torch.tensor(feats) - torch.tensor(center)) ** 2).sum(-1).numpy()
    np.testing.assert_allclose(
        np.asarray(L.dsvdd_score(jnp.array(feats), jnp.array(center))), ref_score, rtol=1e-4)
    assert float(L.dsvdd_loss(jnp.array(feats), jnp.array(labels), jnp.array(center))) == \
        pytest.approx(float(ref_score.mean()), rel=1e-4)


def test_dsvdd_center_eps_clamp():
    # small-magnitude coordinates are pushed to +-eps, exact zeros stay zero
    sums = jnp.array([0.05, -0.05, 0.5, 0.0]) * 10
    c = np.asarray(L.dsvdd_center(sums, jnp.asarray(10.0), eps=0.1))
    np.testing.assert_allclose(c, [0.1, -0.1, 0.5, 0.0], rtol=1e-6)


def test_dsad_loss_matches_reference(feats, labels):
    f = torch.tensor(feats)
    sq = (f ** 2).sum(-1)
    ref = float(torch.where(torch.tensor(labels) == 0, sq, 1.0 / (sq + 1e-9)).mean())
    ours = float(L.dsad_loss(jnp.array(feats), jnp.array(labels)))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_ae_loss_uses_inputs(rng, labels):
    x = rng.normal(size=(N, 8, 8, 3)).astype(np.float32)
    recon = rng.normal(size=(N, 8, 8, 3)).astype(np.float32)
    ref = float(((torch.tensor(recon) - torch.tensor(x)) ** 2).flatten(1).sum(-1).mean())
    ours = float(L.ae_loss(jnp.array(recon), jnp.array(labels), inputs=jnp.array(x)))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_clip_loss_and_score(rng, labels):
    img = rng.normal(size=(N, 64)).astype(np.float32)
    txt = rng.normal(size=(3, 64)).astype(np.float32)
    txt_n = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    # torch reference (clip.py:66-103)
    timg = torch.tensor(img)
    timg = timg / timg.norm(dim=-1, keepdim=True)
    ttxt = torch.tensor(txt_n)
    logp = (100 * timg @ ttxt.t()).log_softmax(dim=-1)
    ref_score = (100 * timg @ ttxt.t()).softmax(dim=-1)[:, -1].numpy()
    # softmax over 100x-scaled cosine logits amplifies float32 noise -> atol
    np.testing.assert_allclose(
        np.asarray(L.clip_score(jnp.array(img), jnp.array(txt))), ref_score, atol=1e-2)
    # one_vs_rest: normal -> prompt 0; anomalous -> last prompt
    ref_ovr = float(-torch.where(torch.tensor(labels) == 1, logp[:, -1], logp[:, 0]).mean())
    ours_ovr = float(L.clip_loss(jnp.array(img), jnp.array(labels), jnp.array(txt_n)))
    assert ours_ovr == pytest.approx(ref_ovr, rel=2e-3)
    # leave_one_out: normal -> max over non-anomaly prompts
    ref_loo = float(-torch.where(
        torch.tensor(labels) == 1, logp[:, -1], logp[:, :-1].max(-1).values).mean())
    ours_loo = float(L.clip_loss(jnp.array(img), jnp.array(labels), jnp.array(txt_n),
                                 ad_mode="leave_one_out"))
    assert ours_loo == pytest.approx(ref_loo, rel=2e-3)


def test_masked_mean_weights(feats, labels):
    # masking out the second half must equal computing on the first half only
    w = np.zeros(N, np.float32)
    w[: N // 2] = 1
    ours = float(L.hsc_loss(jnp.array(feats), jnp.array(labels), weights=jnp.array(w)))
    ref = float(L.hsc_loss(jnp.array(feats[: N // 2]), jnp.array(labels[: N // 2])))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_objective_registry_complete():
    # the reference registers hsc/bce/clip/dsvdd/dsad/focal (training/__init__.py:8-11)
    for k in ("hsc", "bce", "clip", "dsvdd", "dsad", "focal", "ae"):
        assert k in L.OBJECTIVES
    assert L.OBJECTIVES["bce"].clf_head and L.OBJECTIVES["focal"].clf_head
    assert L.OBJECTIVES["dsvdd"].needs_center and L.OBJECTIVES["clip"].needs_center


def test_losses_are_jittable(feats, labels):
    f = jnp.array(feats)
    lab = jnp.array(labels)
    for name in ("hsc", "dsad"):
        obj = L.OBJECTIVES[name]
        jitted = jax.jit(lambda f, l: obj.loss(f, l, None))
        assert np.isfinite(float(jitted(f, lab)))
