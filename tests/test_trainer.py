"""End-to-end training-engine tests on synthetic data (fake CIFAR substitute,
EOE_TPU_FAKE_DATA=1 via conftest). Covers the class×seed grid, OE batching,
objectives, snapshot/resume, and the results.json contract."""

import json
import os.path as pt

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eoe_tpu.datasets import load_dataset
from eoe_tpu.datasets.bases import ArraySource, GenericADDataset
from eoe_tpu.models.cnn import CNN32
from eoe_tpu.training import TRAINER, Trainer
from eoe_tpu.utils.logger import Logger


class TinyNet(nn.Module):
    """Small BN-free net for fast tests."""
    rep_dim: int = 16
    clf: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(32)(x))
        x = nn.Dense(self.rep_dim)(x)
        if self.clf:
            x = nn.Dense(1)(x)
        return x


def separable_ds(rng, n=128, hw=8, n_classes=3, specs=()):
    """Synthetic combined dataset (normal + OE) where class identity is
    linearly visible, so HSC with OE can trivially separate it."""
    from eoe_tpu.datasets.bases import CombinedDataset

    def make(n):
        targets = np.arange(n) % n_classes
        imgs = (rng.random((n, hw, hw, 3)) * 60).astype(np.uint8)
        imgs = np.clip(imgs + targets[:, None, None, None] * 60, 0, 255).astype(np.uint8)
        return imgs, targets

    xtr, ytr = make(n)
    xte, yte = make(n // 2)
    kw = dict(root="", train_specs=list(specs), test_specs=list(specs),
              n_classes=n_classes, raw_shape=(hw, hw, 3))
    normal = GenericADDataset(ArraySource(xtr, ytr), ArraySource(xte, yte),
                              normal_classes=(0,), nominal_label=0, **kw)
    # OE = the anomalous classes, flipped label (load_dataset semantics)
    oe = GenericADDataset(ArraySource(xtr, ytr), None,
                          normal_classes=tuple(range(1, n_classes)), nominal_label=1, **kw)
    return CombinedDataset(normal, oe)


def make_trainer(tmp_path, objective="hsc", epochs=3, model=None, **kw):
    logger = Logger(str(tmp_path), noname=True, archive_source=False)
    return TRAINER[objective](
        model=model or TinyNet(clf=objective in ("bce", "focal")),
        train_specs=[], test_specs=[], dataset="cifar10", oe_dataset="cifar100",
        datapath=str(tmp_path / "data"), logger=logger, epochs=epochs, lr=1e-3, wdk=0.0,
        milestones=[], batch_size=16, **kw)


@pytest.mark.parametrize("objective", ["hsc", "bce", "focal", "dsad", "dsvdd"])
def test_objectives_run_end_to_end(tmp_path, objective):
    trainer = make_trainer(tmp_path / objective, objective)
    _, res = trainer.run(run_classes=[0], run_seeds=1)
    assert np.isfinite(res["mean_auc"])
    assert res["cls_aucs"][0][0] is not None


def test_hsc_learns_separable_data(tmp_path, rng):
    trainer = make_trainer(tmp_path, "hsc", epochs=10)
    trainer.ds = separable_ds(rng)
    _, res = trainer.run(run_classes=[0], run_seeds=1)
    assert res["mean_auc"] > 0.9, f"separable data should be easy, got {res['mean_auc']}"


def test_results_json_contract(tmp_path):
    trainer = make_trainer(tmp_path, "hsc", epochs=1)
    trainer.run(run_classes=[0], run_seeds=2)
    with open(pt.join(trainer.logger.dir, "results.json")) as f:
        res = json.load(f)
    for k in ("eval_mean_auc", "eval_std_auc", "eval_mean_avg_prec", "eval_cls_rocs", "classes"):
        assert k in res
    assert len(res["eval_cls_rocs"][0]) == 2  # two seeds
    assert pt.exists(pt.join(trainer.logger.dir, "setup.json"))
    # per-sample anomaly scores logged (ad_trainer.py:547)
    assert pt.exists(pt.join(trainer.logger.dir, "eval_cls0_it0_anomaly_scores.json"))


def test_snapshot_and_resume(tmp_path):
    trainer = make_trainer(tmp_path / "a", "hsc", epochs=2)
    trainer.run(run_classes=[0], run_seeds=1)
    snap = trainer.logger.snapshot_path("snapshot_cls0_it0")
    assert pt.exists(snap)
    assert trainer.load_epochs_only(snap) == 2

    # resuming with epochs==saved epoch skips training and reproduces eval
    trainer2 = make_trainer(tmp_path / "b", "hsc", epochs=2)
    _, res2 = trainer2.run(run_classes=[0], run_seeds=1, load=[[snap]])
    with open(pt.join(trainer.logger.dir, "results.json")) as f:
        res1 = json.load(f)
    assert res2["mean_auc"] == pytest.approx(res1["eval_mean_auc"], abs=1e-6)


def test_eval_only_run(tmp_path):
    trainer = make_trainer(tmp_path, "hsc", epochs=1)
    _, res = trainer.run(run_classes=[0], run_seeds=1, train=False)
    assert np.isfinite(res["mean_auc"])  # random model still yields an AUC


def test_multi_seed_uses_different_keys(tmp_path):
    trainer = make_trainer(tmp_path, "hsc", epochs=1)
    trainer.run(run_classes=[0], run_seeds=2)
    # different init/shuffling per seed -> different per-sample scores
    with open(pt.join(trainer.logger.dir, "eval_cls0_it0_anomaly_scores.json")) as f:
        s0 = json.load(f)
    with open(pt.join(trainer.logger.dir, "eval_cls0_it1_anomaly_scores.json")) as f:
        s1 = json.load(f)
    assert s0 != s1


def test_without_oe_dataset(tmp_path, rng):
    logger = Logger(str(tmp_path), noname=True, archive_source=False)
    trainer = Trainer(
        model=TinyNet(), objective="dsvdd", train_specs=[], test_specs=[],
        dataset="cifar10", oe_dataset=None, datapath=str(tmp_path / "data"), logger=logger,
        epochs=2, lr=1e-3, wdk=0.0, milestones=[], batch_size=16)
    _, res = trainer.run(run_classes=[0], run_seeds=1)
    assert np.isfinite(res["mean_auc"])


def test_leave_one_out_mode(tmp_path):
    trainer = make_trainer(tmp_path, "hsc", epochs=1, ad_mode="leave_one_out")
    assert len(trainer.get_nominal_classes(3)) == 9
    assert 3 not in trainer.get_nominal_classes(3)
    _, res = trainer.run(run_classes=[0], run_seeds=1)
    assert np.isfinite(res["mean_auc"])


def test_cnn32_with_batchnorm_trains(tmp_path):
    trainer = make_trainer(tmp_path, "hsc", epochs=1, model=CNN32(rep_dim=32))
    _, res = trainer.run(run_classes=[0], run_seeds=1)
    assert np.isfinite(res["mean_auc"])


def test_dsvdd_center_deviation_bounded(tmp_path, rng):
    """Bounds the PARITY-documented DSVDD center deviations vs the reference
    (dsvdd.py:10-21): we use a count-weighted GLOBAL mean over
    PIPELINE-TRANSFORMED inputs; the reference uses a mean of per-batch means
    over loader outputs WITHOUT the device-side normalize. Training and
    evaluating with a reference-style center must land within 5 AUROC points
    on a synthetic separable config."""
    from eoe_tpu.ops.losses import dsvdd_center
    from eoe_tpu.training.trainer import Trainer

    def ref_style_center(trainer, ds, state):
        """mean-of-batch-means over raw [0,1] images, eps clamp (dsvdd.py)."""
        train_set = ds.train_set
        B = trainer.batch_size
        means = []
        for i in range(0, len(train_set), B):
            pos = np.arange(i, min(i + B, len(train_set)))
            x = jnp.asarray(np.asarray(train_set.gather(pos)), jnp.float32) / 255.0
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            feats = trainer.model.apply(
                variables, x.astype(trainer.compute_dtype), train=False)
            means.append(np.asarray(feats, np.float32).mean(axis=0))
        c = np.stack(means).mean(axis=0)
        return dsvdd_center(jnp.asarray(c), jnp.asarray(1.0))

    aucs = {}
    for variant in ("ours", "reference_style"):
        logger = Logger(str(tmp_path / variant), noname=True, archive_source=False)
        trainer = TRAINER["dsvdd"](
            model=TinyNet(), train_specs=["normalize"], test_specs=["normalize"],
            dataset="cifar10", oe_dataset="cifar100",
            datapath=str(tmp_path / variant / "data"), logger=logger, epochs=3,
            lr=1e-3, wdk=0.0, milestones=[], batch_size=16)
        # normalize in the pinned ds pipelines exercises deviation (b);
        # n=100 gives a short last batch, exercising deviation (a)
        trainer.ds = separable_ds(np.random.default_rng(0), n=100,
                                  specs=["normalize"])
        if variant == "reference_style":
            orig = Trainer.prepare_metric
            trainer.prepare_metric = (
                lambda clsstr, ds, state, seed: ref_style_center(trainer, ds, state))
        _, res = trainer.run(run_classes=[0], run_seeds=1)
        aucs[variant] = res["mean_auc"]
    assert abs(aucs["ours"] - aucs["reference_style"]) < 0.05, aucs


def test_observability_artifacts(tmp_path):
    """Round-5 fixtures: per-epoch train / per-class eval anomaly-score
    histograms (ad_trainer.py:458-465,541-544) and PIPELINE-OUTPUT preview
    grids (bases.py:246-291 — the reference previews loader output after all
    transforms, not raw images)."""
    import glob
    trainer = make_trainer(tmp_path, "hsc", epochs=2)
    trainer.run(run_classes=[0], run_seeds=1)
    d = trainer.logger.dir
    train_prev = glob.glob(pt.join(d, "training_cls0-*_preview.png"))
    eval_prev = glob.glob(pt.join(d, "eval_cls0-*_preview.png"))
    assert train_prev and eval_prev
    with open(pt.join(d, "scalars.json")) as f:
        scalars = json.load(f)
    train_h = [k for k in scalars
               if k.startswith("hist/Training: CLS0 SEED0 anomaly_scores")]
    eval_h = [k for k in scalars
              if k.startswith("hist/Eval: (SD0) anomaly_scores cls0")]
    assert train_h and eval_h
    # train histograms are per-epoch; each record carries counts + edges
    normal_key = "hist/Training: CLS0 SEED0 anomaly_scores normal"
    assert len(scalars[normal_key]) == 2
    step, rec = scalars[normal_key][0]
    assert len(rec["edges"]) == len(rec["counts"]) + 1 > 2


def test_transformed_preview_applies_pipeline(tmp_path):
    """The preview grid must show pipeline OUTPUT: with a crop in the train
    specs the preview spatial shape is the crop size, not the raw size."""
    logger = Logger(str(tmp_path), noname=True, archive_source=False)
    trainer = TRAINER["hsc"](
        model=TinyNet(), train_specs=[{"op": "random_crop", "size": 20}],
        test_specs=[], dataset="cifar10", oe_dataset="cifar100",
        datapath=str(tmp_path / "data"), logger=logger, epochs=0, lr=1e-3,
        wdk=0.0, milestones=[], batch_size=16)
    ds = load_dataset("cifar10", str(tmp_path / "data"), [0], 0,
                      trainer.train_specs, trainer.test_specs, logger, "cifar100")
    prev = trainer._transformed_preview(ds, 8, train=True)
    assert prev.shape[1:3] == (20, 20)
    assert prev.dtype == np.float32 and prev.min() >= 0.0 and prev.max() <= 1.0
    # two groups: normal then OE (both halves of the training batch)
    assert prev.shape[0] == 16


def test_throughput_accounting(tmp_path):
    trainer = make_trainer(tmp_path, "hsc", epochs=2)
    trainer.run(run_classes=[0], run_seeds=1)
    assert trainer.images_seen > 0
    assert trainer.images_per_second > 0


def test_vmap_seeds_matches_grid_semantics(tmp_path):
    """run(vmap_seeds=True): all seeds of a class train as one vmapped program;
    per-seed results are finite, distinct, and the full output contract holds."""
    trainer = make_trainer(tmp_path / "v", "hsc", epochs=2)
    _, res = trainer.run(run_classes=[0], run_seeds=3, vmap_seeds=True)
    assert len(res["cls_aucs"][0]) == 3
    assert all(np.isfinite(a) for a in res["cls_aucs"][0])
    # snapshots per seed written
    for it in range(3):
        assert pt.exists(trainer.logger.snapshot_path(f"snapshot_cls0_it{it}"))
    # per-seed scores differ (independent init keys)
    s0 = json.load(open(pt.join(trainer.logger.dir, "eval_cls0_it0_anomaly_scores.json")))
    s1 = json.load(open(pt.join(trainer.logger.dir, "eval_cls0_it1_anomaly_scores.json")))
    assert s0 != s1


def test_vmap_seeds_auto_enabled_when_safe(tmp_path):
    """run() defaults vmap_seeds to AUTO: on for multi-seed non-CLIP training
    from scratch on device-resident data (round-4 review: the 3x win should
    not depend on knowing the flag); --no-vmap-seeds / vmap_seeds=False still
    forces the sequential grid, and single-seed runs stay sequential."""
    trainer = make_trainer(tmp_path / "auto", "hsc", epochs=1)
    _, res_v = trainer.run(run_classes=[0], run_seeds=2)
    assert trainer._last_grid_vmapped is True
    trainer2 = make_trainer(tmp_path / "off", "hsc", epochs=1)
    _, res_s = trainer2.run(run_classes=[0], run_seeds=2, vmap_seeds=False)
    assert trainer2._last_grid_vmapped is False
    # auto-on must be parity-safe vs the sequential grid
    np.testing.assert_allclose(res_v["cls_aucs"][0], res_s["cls_aucs"][0],
                               atol=2e-3)
    trainer3 = make_trainer(tmp_path / "single", "hsc", epochs=1)
    trainer3.run(run_classes=[0], run_seeds=1)
    assert trainer3._last_grid_vmapped is False


def test_vmap_seeds_dsvdd_per_seed_centers(tmp_path):
    """DSVDD under the vmapped grid: each seed's center is a function of ITS
    init weights (sequential parity, dsvdd.py:10-21) — centers must be
    stacked per seed and the per-seed AUCs must match the sequential grid."""
    trainer = make_trainer(tmp_path / "v", "dsvdd", epochs=2)
    _, res_v = trainer.run(run_classes=[0], run_seeds=2, vmap_seeds=True)
    assert trainer._last_grid_vmapped is True
    c = np.asarray(trainer.center)
    assert c.ndim >= 2 and c.shape[0] == 2
    assert not np.allclose(c[0], c[1]), "per-seed centers must differ"
    trainer2 = make_trainer(tmp_path / "s", "dsvdd", epochs=2)
    _, res_s = trainer2.run(run_classes=[0], run_seeds=2, vmap_seeds=False)
    np.testing.assert_allclose(res_v["cls_aucs"][0], res_s["cls_aucs"][0],
                               atol=2e-3)


def test_init_states_stacked_matches_per_seed(tmp_path):
    """The one-transfer stacked init is bit-equal to the per-seed init_state
    loop it replaced (params, batch_stats, opt_state, step)."""
    trainer = make_trainer(tmp_path, "hsc", epochs=1, model=CNN32(rep_dim=32))
    ds = trainer._build_dataset(0, np.random.default_rng(0), None)
    keys = [jax.random.fold_in(jax.random.key(0), i) for i in range(3)]
    stacked = trainer.init_states_stacked(keys, ds, steps_per_epoch=4)
    for i, k in enumerate(keys):
        single = trainer.init_state(k, ds, steps_per_epoch=4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a[i]), np.asarray(b)),
            stacked, single)


def test_nan_retry_gives_up_gracefully(tmp_path):
    """NaN scores raise NanGradientsError; run() retries 5x then records None
    for the combo instead of crashing (ad_trainer.py:257-280 semantics)."""
    logger = Logger(str(tmp_path), noname=True, archive_source=False)
    trainer = Trainer(  # lr=1e32: guaranteed blow-up
        model=TinyNet(), objective="hsc", train_specs=[], test_specs=[],
        dataset="cifar10", oe_dataset="cifar100", datapath=str(tmp_path / "data"),
        logger=logger, epochs=1, lr=1e32, wdk=0.0, milestones=[], batch_size=16)
    _, res = trainer.run(run_classes=[0], run_seeds=1)
    assert res["cls_aucs"][0][0] is None
    assert np.isnan(res["mean_auc"])


def test_gcn_normalize_stats_mode(tmp_path):
    """'gcn-normalize' placeholder: GCN applied + min-max-style stats extracted
    from the raw train split (bases.py:24-45 GCN_NORM mode)."""
    logger = Logger(str(tmp_path), noname=True, archive_source=False)
    trainer = TRAINER["hsc"](
        model=TinyNet(), train_specs=["gcn-normalize"], test_specs=["gcn-normalize"],
        dataset="cifar10", oe_dataset="cifar100", datapath=str(tmp_path / "data"),
        logger=logger, epochs=1, lr=1e-3, wdk=0.0, milestones=[], batch_size=16)
    _, res = trainer.run(run_classes=[0], run_seeds=1)
    assert np.isfinite(res["mean_auc"])


def test_anomaly_scorer_from_snapshot(tmp_path, rng):
    """Serving API: AnomalyScorer loads a trained snapshot and reproduces the
    trainer's eval scores on the same images."""
    from eoe_tpu.inference import AnomalyScorer

    trainer = make_trainer(tmp_path, "hsc", epochs=2)
    trainer.run(run_classes=[0], run_seeds=1)
    snap = trainer.logger.snapshot_path("snapshot_cls0_it0")
    scorer = AnomalyScorer(snap, model=TinyNet(), objective="hsc", batch_size=8)
    # score the fake test set and compare with the logged per-sample scores
    from eoe_tpu.datasets import load_dataset
    ds = load_dataset("cifar10", str(tmp_path / "data"), [0], 0, [], [], None,
                      oe_name="cifar100", rng=np.random.default_rng([0, 0, 0]))
    imgs = ds.test_set.gather_all()
    scores = scorer.score(imgs)
    assert scores.shape == (len(imgs),)
    logged = json.load(open(pt.join(trainer.logger.dir,
                                    "eval_cls0_it0_anomaly_scores.json")))
    np.testing.assert_allclose(scores, [logged[str(i)] for i in range(len(imgs))],
                               rtol=1e-4)
    # odd batch sizes pad correctly
    np.testing.assert_allclose(scorer.score(imgs[:5]), scores[:5], rtol=1e-5)


def test_logger_tensorboard_default_on(tmp_path):
    """Tensorboard events are written by default (parity: the reference Logger
    always instantiates a SummaryWriter, logger.py:154-173)."""
    logger = Logger(str(tmp_path / "run"), noname=True, archive_source=False)
    logger.add_scalar("x", 1.0, 0)
    assert logger.tb_writer is not None
    tb = tmp_path / "run" / "tb"
    assert tb.is_dir() and any(tb.iterdir())
    # and it remains opt-out-able
    off = Logger(str(tmp_path / "run2"), noname=True, archive_source=False,
                 tensorboard=False)
    assert off.tb_writer is None


def test_logger_async_io_contract(tmp_path, monkeypatch):
    """Artifact writes run on the background I/O worker; drain() makes them
    all durable, EOE_TPU_SYNC_IO=1 forces inline writes, and both modes
    produce identical artifacts (PDF plots, preview PNGs, snapshot msgpack)."""
    from flax import serialization

    from eoe_tpu.ops.metrics import roc_curve

    rng = np.random.RandomState(0)
    scores = rng.randn(64)
    labels = (rng.rand(64) > 0.5).astype(np.int32)
    roc = roc_curve(labels, scores)
    imgs = rng.randint(0, 255, (8, 16, 16, 3), np.uint8)
    payload = {"params": {"w": np.arange(4.0)}, "epoch": 3}

    outs = {}
    for mode, sync in (("async", "0"), ("sync", "1")):
        monkeypatch.setenv("EOE_TPU_SYNC_IO", sync)
        logger = Logger(str(tmp_path / mode), noname=True, archive_source=False,
                        tensorboard=False)
        mean = logger.plot_many([roc, roc], labels=["a", "b"], name="roc")
        assert abs(mean.auc - roc.auc) < 1e-9  # return value is synchronous
        logger.logimg("preview", imgs, nrow=4)
        path = logger.snapshot("snap", payload)
        logger.drain()
        assert pt.isfile(pt.join(logger.dir, "roc.pdf"))
        assert pt.isfile(pt.join(logger.dir, "preview.png"))
        assert pt.isfile(path)
        outs[mode] = serialization.msgpack_restore(open(path, "rb").read())
        # drain is idempotent and re-submittable afterwards
        logger.drain()
        logger.logimg("preview2", imgs, nrow=4)
        logger.drain()
        assert pt.isfile(pt.join(logger.dir, "preview2.png"))
    np.testing.assert_array_equal(outs["async"]["params"]["w"],
                                  outs["sync"]["params"]["w"])
    # a failing artifact write becomes a warning, never an exception
    logger.logimg("bad", np.zeros((2, 2), np.uint8))  # wrong rank
    logger.drain()
    assert pt.isfile(pt.join(logger.dir, "warnings.txt"))


def test_resident_scan_path_matches_per_step(tmp_path, monkeypatch):
    """The TPU whole-epoch scan path and the CPU per-step fallback are the
    same program: same key -> identical final params and train AUC. (The scan
    path is CPU-gated because XLA:CPU runs conv backward ops inside scan
    bodies ~40x slower; EOE_TPU_CPU_SCAN=1 forces it for this test.)"""
    finals = {}
    for name, force_scan in (("step", False), ("scan", True)):
        if force_scan:
            monkeypatch.setenv("EOE_TPU_CPU_SCAN", "1")
        else:
            monkeypatch.delenv("EOE_TPU_CPU_SCAN", raising=False)
        ds = separable_ds(np.random.default_rng(0))
        trainer = make_trainer(tmp_path / name, epochs=2)
        trainer.ds = ds
        state, roc = trainer.train_cls(ds, 0, "x", 0, jax.random.key(0))
        finals[name] = (jax.tree_util.tree_map(np.asarray, state.params), roc.auc)
    p_step, auc_step = finals["step"]
    p_scan, auc_scan = finals["scan"]
    for a, b in zip(jax.tree_util.tree_leaves(p_step), jax.tree_util.tree_leaves(p_scan)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert auc_step == pytest.approx(auc_scan, abs=1e-9)
