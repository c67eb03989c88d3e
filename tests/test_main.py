"""Orchestration layer: CLI runners, resume (load_setup), evolutionary and
random OE search, multiscale sweep, custom train/inference entry points
(references: src/eoe/main/*)."""

import glob
import json
import os
import os.path as pt

import numpy as np
import pytest
from PIL import Image

from eoe_tpu.main import default_argsparse, evolve_argsparse, ms_argsparse


def base_args(tmp_path, extra=()):
    return ["-e", "1", "--iterations", "1", "--classes", "0",
            "--oe-dataset", "cifar100", "--datapath", str(tmp_path),
            "--superdir", str(tmp_path), *extra]


# ----------------------------------------------------------------- argparse


def test_default_argsparse_flags():
    args = default_argsparse(lambda s: s, argv=["-ds", "cifar10", "--ad-mode", "loo",
                                                "-oe", "none", "-b", "64"])
    assert args.dataset == "cifar10"
    assert args.ad_mode == "leave_one_out"  # short->long map
    assert args.oe_dataset is None  # 'none' -> None
    assert args.batch_size == 64


def test_ms_argsparse_builds_msms():
    args = ms_argsparse(lambda s: s, argv=["--ms-mode", "lpf+train_nominal",
                                           "blur+test_anomalous", "--magnitude", "3"])
    assert len(args.ms_mode) == 2
    assert str(args.ms_mode[0]) == "lpf+train_nominal--M3"


def test_evolve_argsparse_guards():
    with pytest.raises(ValueError, match="oe-size"):
        evolve_argsparse(lambda s: s, argv=["--oe-size", "5"])
    args = evolve_argsparse(lambda s: s, argv=["--ev-oesize", "2"])
    assert args.ev_oesize == 2 and args.ev_generations == 30


# ----------------------------------------------------------------- runners


def test_train_cifar_runner_end_to_end(tmp_path):
    from eoe_tpu.main import train_cifar
    _, res = train_cifar.main(base_args(tmp_path))
    assert np.isfinite(res["mean_auc"])
    # results.json written under datapath/results/superdir/log_*/
    res_files = glob.glob(str(tmp_path / "**" / "results.json"), recursive=True)
    assert res_files


def test_train_mnist_runner(tmp_path):
    from eoe_tpu.main import train_mnist
    _, res = train_mnist.main(base_args(tmp_path, ["--oe-dataset", "emnist"]))
    assert np.isfinite(res["mean_auc"])


def test_runner_modules_importable():
    import importlib
    for name in ("train_cifar", "train_mnist", "train_fmnist", "train_imagenet",
                 "train_imagenet_fast", "train_mvtec", "train_dtd", "train_cub",
                 "train_custom", "train_clip_cifar", "train_clip_mnist",
                 "train_clip_fmnist", "train_clip_imagenet", "train_clip_mvtec",
                 "train_clip_dtd", "train_clip_cub", "evolve_oe_cifar",
                 "evolve_oe_imagenet", "evolve_oe_custom", "random_oe_cifar",
                 "random_oe_imagenet", "multiscale_cifar", "multiscale_imagenet",
                 "train_only_custom", "inference_custom"):
        mod = importlib.import_module(f"eoe_tpu.main.{name}")
        assert hasattr(mod, "main"), name


def test_load_setup_resume(tmp_path):
    from eoe_tpu.main import train_cifar
    train_cifar.main(base_args(tmp_path))
    logdir = sorted(glob.glob(str(tmp_path / "log_*")))[0]
    # resume with --load: re-evaluates the completed combo into {dir}---CNTD
    _, res2 = train_cifar.main(base_args(tmp_path, ["--load", logdir]))
    assert np.isfinite(res2["mean_auc"])
    assert pt.isdir(logdir + "---CNTD")
    with open(pt.join(logdir, "results.json")) as f:
        res1 = json.load(f)
    assert res2["mean_auc"] == pytest.approx(res1["eval_mean_auc"], abs=1e-6)


def test_load_setup_asserts_on_mismatch(tmp_path):
    from eoe_tpu.main import train_cifar
    from eoe_tpu.main import load_setup
    train_cifar.main(base_args(tmp_path))
    logdir = sorted(glob.glob(str(tmp_path / "log_*")))[0]
    import argparse
    args = argparse.Namespace(dataset="cifar10", objective="hsc")
    with pytest.raises(AssertionError, match="transformation"):
        load_setup(logdir, args, ["normalize"], ["normalize"])


# ----------------------------------------------------------------- evolve


def test_evolve_runner(tmp_path):
    from eoe_tpu.main import evolve_oe_cifar
    history, tree = evolve_oe_cifar.main(base_args(tmp_path, [
        "--ev-generations", "2", "--ev-generation-pool", "3",
        "--ev-mutation-pool", "6", "--ev-mutation-oneofkbest", "2"]))
    assert len(history["pop"]) == 2
    assert len(history["fit"][0]) == 3
    # tree persisted with fitness values
    evolve_dirs = glob.glob(str(tmp_path / "log_*_evolve_*"))
    assert evolve_dirs
    with open(pt.join(evolve_dirs[0], "evolution.json")) as f:
        t = json.load(f)
    assert any(n.get("fitness") is not None for n in t["nodes"])
    # best/worst overview figures
    assert pt.exists(pt.join(evolve_dirs[0], "overview_best.png"))


def test_evolve_smoke_plumbing(tmp_path, capsys, monkeypatch):
    """experiments/evolve_smoke.py end-to-end with fake data: runs the real
    GA driver for 1 generation and prints the fitness-history JSON
    (acceptance-config coverage, BASELINE.md config 5)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "evolve_smoke", pt.join(pt.dirname(pt.dirname(pt.abspath(__file__))),
                                "experiments", "evolve_smoke.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    monkeypatch.setenv("EOE_TPU_FAKE_DATA", "1")
    rc = mod.main(["--dataset", "cifar10", "--generations", "1", "--pop", "2",
                   "--epochs", "1", "--datapath", str(tmp_path / "data"),
                   "--logpath", str(tmp_path / "log")])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["smoke"].startswith("evolutionary OE search cifar10")
    assert len(rec["mean_fitness_per_gen"]) == 1
    assert rec["best"] is not None and len(rec["best"]["indices"]) == 1


def test_random_oe_runner(tmp_path):
    from eoe_tpu.main import random_oe_cifar
    history, _ = random_oe_cifar.main(base_args(tmp_path, ["--ev-samples", "2"]))
    assert len(history["fit"][0]) == 2


def test_evolve_operators_semantics(tmp_path, rng):
    from eoe_tpu.evolve import (Individual, init_individual, mate_individuals,
                                mutate_individual, select_individual)
    from eoe_tpu.datasets.bases import ArraySource, Subset
    src = ArraySource(rng.integers(0, 256, (20, 8, 8, 3), np.uint8), np.zeros(20))
    oeds = Subset(src, np.arange(20))
    np.random.seed(0)
    inds = [Individual([init_individual(oeds)]) for _ in range(4)]
    for i, ind in enumerate(inds):
        ind.fitness.values = (i / 4,)
    # tournament selection prefers higher fitness (weight +1)
    sel = select_individual(inds, k=8, tournsize=3)
    assert np.mean([s.fitness.values[0] for s in sel]) >= np.mean(
        [i.fitness.values[0] for i in inds])
    # minimization flips preference
    inds_min = [Individual(list(i), weight=-1.0) for i in inds]
    for i, ind in enumerate(inds_min):
        ind.fitness.values = (i / 4,)
    sel_min = select_individual(inds_min, k=8, tournsize=3)
    assert np.mean([s.fitness.values[0] for s in sel_min]) <= np.mean(
        [i.fitness.values[0] for i in inds_min])
    # mutation replaces with a valid index
    ind = Individual([3])
    mutate_individual(ind, oeds, poolsize=6, indp=1.0, oneofkbest=2)
    assert 0 <= ind[0] < 20
    # multi-element mating swaps elements
    a, b = Individual([1, 2]), Individual([3, 4])
    np.random.seed(1)
    mate_individuals(a, b, oeds, poolsize=4, indp=1.0, oneofkbest=2)
    assert sorted(list(a) + list(b)) == [1, 2, 3, 4]


def test_tree_roundtrip(tmp_path):
    from eoe_tpu.evolve.tree import EvolNode, Individual, Tree
    n1, n2 = EvolNode(Individual([1], fitness=0.5)), EvolNode(Individual([2], fitness=0.9))
    tree = Tree(n1, n2)
    child = EvolNode(Individual([3], fitness=0.7))
    n1.add_children(child)
    tree.save(str(tmp_path / "evolution"))
    tree2 = Tree().load(str(tmp_path / "evolution.json"))
    assert len(tree2.bfs()) == 4
    top = tree2.topk(2, best=True)
    assert [n.content.values for n in top] == [[2], [3]]
    worst = tree2.topk(1, best=False)
    assert worst[0].content.values == [1]


# ----------------------------------------------------------------- multiscale


def test_multiscale_runner(tmp_path):
    from eoe_tpu.main import multiscale_cifar
    aucs = multiscale_cifar.main(base_args(tmp_path, [
        "--ms-mode", "lpf+train_nominal", "--magnitudes", "0", "2"]))
    assert len(aucs) == 2
    res_files = [f for f in glob.glob(str(tmp_path / "**" / "results.json"),
                                      recursive=True)]
    ms_res = [f for f in res_files if "magnitudes" in json.load(open(f))]
    assert ms_res
    r = json.load(open(ms_res[0]))
    assert r["magnitudes"] == [0, 2] and len(r["aucs"]) == 2


def test_multiscale_test_only_msm_reuses_models(tmp_path):
    # MSMs touching only test parts -> magnitude!=0 runs with epochs=0 reusing
    # the magnitude-0 snapshots (main/__init__.py:531-537)
    from eoe_tpu.main import multiscale_cifar
    aucs = multiscale_cifar.main(base_args(tmp_path, [
        "--ms-mode", "lpf+test_anomalous", "--magnitudes", "0", "2"]))
    assert len(aucs) == 2


# ----------------------------------------------------------------- custom e2e


def _write_splitless_custom(root, rng, n_normal=10, n_anom=4):
    for folder, n, col in (("normal", n_normal, 40), ("anomalous", n_anom, 200)):
        os.makedirs(pt.join(root, folder), exist_ok=True)
        for i in range(n):
            arr = np.full((40, 40, 3), col, np.uint8) + rng.integers(0, 30, (40, 40, 3),
                                                                     dtype=np.uint8)
            Image.fromarray(arr).save(pt.join(root, folder, f"{i}.png"))


def test_train_only_and_inference_custom(tmp_path, rng):
    from eoe_tpu.datasets.custom import ADCustomDS
    from eoe_tpu.main import inference_custom, train_only_custom
    data = str(tmp_path / "data")
    _write_splitless_custom(data, rng)
    try:
        train_only_custom.main([
            "-e", "2", "--iterations", "1", "-b", "8",
            "--custom-dataset-path", data, "--log-path", str(tmp_path / "train"),
            "--image-resize", "32", "--image-crop", "28", "28"])
        snaps = glob.glob(str(tmp_path / "train" / "**" / "snapshot_cls0_it0.msgpack"),
                          recursive=True)
        assert snaps
        ADCustomDS.train_only = False
        ADCustomDS.base_folder = "custom"
        ADCustomDS.classes = []
        _, res = inference_custom.main([
            "-b", "8", "--custom-dataset-path", data,
            "--log-path", str(tmp_path / "infer"), "--custom-model-snapshot", snaps[0],
            "--image-resize", "32", "--image-crop", "28", "28"])
        assert res["mean_auc"] > 0.9  # separable colors
        sfiles = glob.glob(str(tmp_path / "infer" / "**" /
                               "eval_cls0_it0_anomaly_scores.json"), recursive=True)
        scores = json.load(open(sfiles[0]))
        assert all("/" in k for k in scores)  # keyed by relative file path
    finally:
        ADCustomDS.train_only = False
        ADCustomDS.eval_only = False
        ADCustomDS.base_folder = "custom"
        ADCustomDS.classes = []


def test_evolve_vmapped_evaluator(tmp_path):
    """The vmapped fitness path (--ev-vmap): K candidates train as ONE vmapped
    program; uses a small model so the CPU compile stays test-sized."""
    import argparse
    from eoe_tpu.evolve import Individual, init_individual
    from eoe_tpu.evolve.vmapped import VmappedEvaluator
    from eoe_tpu.main import evolve_trainer
    from eoe_tpu.models.cnn import CNN32

    args = argparse.Namespace(classes=[0], iterations=1)
    trainer, oeds, _ = evolve_trainer(
        "hsc", "", "cifar10", "cifar100", 1, 1e-3, 0.0, [], 16, "one_vs_rest", None,
        CNN32(rep_dim=32), [], [], classes=[0], dataset_path=str(tmp_path),
        superdir=str(tmp_path))
    ev = VmappedEvaluator(trainer, args, chunk=4)
    inds = [Individual([init_individual(oeds)]) for _ in range(3)]
    fits = ev.evaluate_population([list(i) for i in inds])
    assert len(fits) == 3
    assert all(np.isfinite(f) and 0.0 <= f <= 1.0 for f in fits)


def _dsvdd_evolve_trainer(tmp_path, epochs=1, iterations=1):
    import argparse
    from eoe_tpu.main import evolve_trainer
    from eoe_tpu.models.cnn import CNN32

    args = argparse.Namespace(classes=[0], iterations=iterations)
    trainer, oeds, _ = evolve_trainer(
        "dsvdd", "", "cifar10", "cifar100", epochs, 1e-3, 0.0, [], 16,
        "one_vs_rest", None, CNN32(rep_dim=32), [], [], classes=[0],
        dataset_path=str(tmp_path), superdir=str(tmp_path))
    return trainer, oeds, args


def test_evolve_vmapped_dsvdd_center_per_iteration(tmp_path):
    """DSVDD's center is a function of the iteration's INIT WEIGHTS: the
    vmapped path must recompute it per iteration like the sequential path
    (trainer.train_cls), not reuse iteration 0's (round-4 bug: a single
    `if trainer.center is None` guard). Reference semantics:
    /root/reference/src/eoe/training/dsvdd.py:10-21."""
    import jax
    from eoe_tpu.evolve import init_individual
    from eoe_tpu.evolve.vmapped import VmappedEvaluator

    trainer, oeds, args = _dsvdd_evolve_trainer(tmp_path, epochs=1, iterations=2)
    ev = VmappedEvaluator(trainer, args, chunk=4)
    fits = ev.evaluate_population([[init_individual(oeds)] for _ in range(2)])
    assert len(fits) == 2 and all(np.isfinite(f) for f in fits)
    assert sorted(ev._centers) == [0, 1]
    c0, c1 = (np.asarray(ev._centers[i]) for i in (0, 1))
    assert not np.allclose(c0, c1), "different init weights must give different centers"
    # each must equal the sequential path's center for that iteration
    ds = trainer.ds
    for it in (0, 1):
        key = jax.random.fold_in(jax.random.fold_in(
            jax.random.key(trainer.seed), 0), it)
        base = trainer.init_state(key, ds, 1)
        seq_center = trainer.prepare_metric("x", ds, base, it)
        np.testing.assert_allclose(np.asarray(ev._centers[it]),
                                   np.asarray(seq_center), rtol=1e-5, atol=1e-6)


def test_evolve_vmapped_dsvdd_matches_sequential(tmp_path):
    """Sequential (reference-shaped evaluate_individual) vs vmapped DSVDD
    fitness must agree: same init key, same epoch-plan seed, same center."""
    from eoe_tpu.evolve import evaluate_individual, init_individual
    from eoe_tpu.evolve.vmapped import VmappedEvaluator

    trainer, oeds, args = _dsvdd_evolve_trainer(tmp_path, epochs=2, iterations=1)
    inds = [[init_individual(oeds)] for _ in range(2)]
    ev = VmappedEvaluator(trainer, args, chunk=4)
    fits_v = ev.evaluate_population(inds)
    trainer.center = None
    fits_s = [evaluate_individual(list(ind), trainer, args, None) for ind in inds]
    np.testing.assert_allclose(fits_v, fits_s, atol=2e-2)


def test_clip_setup_json_records_raw_specs(tmp_path):
    """ClipTrainer resolves placeholder specs internally but setup.json must
    record the RAW runner specs so --load's equality assertions hold."""
    from eoe_tpu.ops.preprocess import specs_repr
    from tests.test_clip import tiny_clip_for_trainer
    from eoe_tpu.training import TRAINER
    from eoe_tpu.utils.logger import Logger

    cfg, variables = tiny_clip_for_trainer()
    raw = [{"op": "random_hflip"}, "clip_pil_preprocessing", "clip_tensor_preprocessing"]
    trainer = TRAINER["clip"](
        model=None, train_specs=list(raw), test_specs=None, dataset="cifar10",
        oe_dataset="cifar100", datapath=str(tmp_path / "d"),
        logger=Logger(str(tmp_path), noname=True, archive_source=False),
        epochs=0, lr=1e-4, wdk=0.0, milestones=[], batch_size=8,
        clip_config=cfg, clip_variables=variables)
    assert specs_repr(trainer.setup_dict()["train_specs"]) == specs_repr(raw)
    assert trainer.setup_dict()["test_specs"] == []
    # while the COMPILED specs carry the resolved resolution
    assert any(isinstance(s, dict) and s.get("resolution") == cfg.image_resolution
               for s in trainer.train_specs)


def test_evaluate_uses_identity_not_value_equality(tmp_path):
    """A valid clone with values EQUAL to an invalid one must not be
    re-evaluated (Individual subclasses list -> `in` is value equality)."""
    from eoe_tpu.evolve import Individual, Toolbox, evaluate
    from eoe_tpu.evolve.tree import EvolNode, Individual as TI, Tree
    from eoe_tpu.datasets.bases import ArraySource, Subset
    from eoe_tpu.utils.logger import Logger

    src = ArraySource(np.zeros((4, 4, 4, 3), np.uint8), np.zeros(4))
    oeds = Subset(src, np.arange(4))
    a, b = Individual([1]), Individual([1])  # equal values
    a.fitness.values = (0.7,)  # a is VALID, b is not
    calls = []
    toolbox = Toolbox()
    toolbox.register("evaluate", lambda ind: calls.append(list(ind)) or 0.5)
    tree = Tree(EvolNode(TI([1])), EvolNode(TI([1])))
    pop = [a, b]
    logger = Logger(str(tmp_path), noname=True, archive_source=False)
    evaluate(pop, pop, 0, toolbox, {"pop": [], "fit": [], "mean_fit": [],
                                    "std_fit": [], "max_fit": [], "min_fit": []},
             tree, oeds, logger)
    assert len(calls) == 1  # only the invalid clone was evaluated
    assert a.fitness.values == (0.7,)  # the valid one kept its fitness


def test_tinyimages_fake_data_mode(tmp_path, rng):
    from eoe_tpu.datasets import load_dataset
    ds = load_dataset("cifar10", str(tmp_path), [0], 0, [], [], None,
                      oe_name="tinyimages", rng=rng)
    assert len(ds.oe.train_set) == 512  # synthetic OE pool


def test_mvtec_enlarge_keeps_residency(tmp_path, rng):
    from tests.test_folder_datasets import write_img
    from eoe_tpu.datasets import load_dataset
    root = tmp_path / "mvtec"
    for i in range(4):
        write_img(str(root / "bottle" / "train" / "good" / f"{i}.png"), rng=rng)
    write_img(str(root / "bottle" / "test" / "good" / "0.png"), rng=rng)
    write_img(str(root / "bottle" / "test" / "broken" / "0.png"), rng=rng)
    ds = load_dataset("mvtec", str(tmp_path), [0], 0, [{"op": "resize", "size": 16}],
                      [{"op": "resize", "size": 16}], None, rng=rng)
    assert len(ds.train_set) == 40  # 10x enlarge via tiled INDICES
    assert len(ds.train_set.source) == 4  # data NOT materialized 10x
    assert ds.train_set.source.resident


def test_tree_render(tmp_path):
    from eoe_tpu.evolve.tree import EvolNode, Individual, Tree
    parents = [EvolNode(Individual([i], fitness=i / 4)) for i in range(4)]
    tree = Tree(*parents)
    child = EvolNode(Individual([9], fitness=0.9))
    parents[0].add_children(child)
    out = tree.render(str(tmp_path / "genealogy.png"))
    assert out is not None and pt.exists(out)


def test_multiscale_continue_run(tmp_path):
    """--continue-run: completed magnitudes are reused from their results.json
    and only the new magnitudes train (multiscale_cifar.py continue logic)."""
    import os
    from eoe_tpu.main import multiscale_cifar
    base = base_args(tmp_path, ["--ms-mode", "lpf+train_nominal"])
    aucs1 = multiscale_cifar.main(base + ["--magnitudes", "0", "2"])
    outer = [o for o in sorted(glob.glob(str(tmp_path / "log_*")))
             if pt.isdir(o) and any("magnitude" in s for s in os.listdir(o))][0]
    aucs2 = multiscale_cifar.main(base + ["--magnitudes", "0", "2", "4",
                                          "--continue-run", outer])
    assert [tuple(a) for a in aucs2[:2]] == [tuple(a) for a in aucs1]
    assert len(aucs2) == 3


def test_evolve_continue_run_resumes_interrupted(tmp_path):
    """--ev-continue-run resumes from the last FINISHED generation of an
    interrupted run and completes the configured total (load_evolve)."""
    from eoe_tpu.main import evolve_oe_cifar
    base = base_args(tmp_path, ["--ev-generation-pool", "3", "--ev-mutation-pool", "4",
                                "--ev-mutation-oneofkbest", "2"])
    h1, _ = evolve_oe_cifar.main(base + ["--ev-generations", "3"])
    evdir = glob.glob(str(tmp_path / "log_*_evolve_*"))[0]
    # simulate the interruption: drop the last finished generation
    with open(pt.join(evdir, "results.json")) as f:
        h = json.load(f)
    for k in ("pop", "fit", "mean_fit", "std_fit", "max_fit", "min_fit"):
        h[k] = h[k][:2]
    with open(pt.join(evdir, "results.json"), "w") as f:
        json.dump(h, f)
    h2, _ = evolve_oe_cifar.main(base + ["--ev-generations", "3",
                                         "--ev-continue-run", evdir])
    assert len(h2["pop"]) == 3
    assert h2["pop"][:2] == h1["pop"][:2]  # loaded generations kept verbatim
    # per-generation PRNG streams derive from (ev_seed, gen): the resumed run
    # draws exactly what the uninterrupted run drew for the dropped generation
    assert h2["pop"][2] == h1["pop"][2]


def test_evolve_seed_reproducible(tmp_path):
    """Same --ev-seed: two fresh evolve runs reproduce the generation-0 and
    generation-1 populations byte-identically; the seed lands in the recorded
    setup. (The reference leaves evolution unseeded — SURVEY.md §7.3.)"""
    from eoe_tpu.main import evolve_oe_cifar

    def run(sub, seed):
        d = tmp_path / sub
        d.mkdir()
        h, _ = evolve_oe_cifar.main(base_args(d, [
            "--ev-generations", "2", "--ev-generation-pool", "3",
            "--ev-mutation-pool", "6", "--ev-mutation-oneofkbest", "2",
            "--ev-seed", str(seed)]))
        return h

    h1 = run("a", 5)
    h2 = run("b", 5)
    assert h1["pop"] == h2["pop"]
    assert h1["fit"] == h2["fit"]
    assert h1["setup"]["ev_seed"] == 5
    h3 = run("c", 77)
    assert h3["pop"] != h1["pop"]  # different seed -> different draws


def test_load_resume_partial_grid(tmp_path):
    """--load with a missing snapshot: completed combos re-evaluate to
    identical metrics, missing ones retrain (ad_trainer.py load semantics)."""
    import os
    from eoe_tpu.main import train_cifar
    base = ["-e", "1", "--iterations", "1", "--oe-dataset", "cifar100",
            "--datapath", str(tmp_path), "--superdir", str(tmp_path)]
    train_cifar.main(base + ["--classes", "0", "1"])
    logdir = sorted(glob.glob(str(tmp_path / "log_*")))[0]
    os.remove(pt.join(logdir, "snapshots", "snapshot_cls1_it0.msgpack"))
    _, res = train_cifar.main(base + ["--classes", "0", "1", "--load", logdir])
    with open(pt.join(logdir, "results.json")) as f:
        r1 = json.load(f)
    assert res["cls_aucs"][0][0] == pytest.approx(r1["eval_cls_rocs"][0][0], abs=1e-9)
    assert res["cls_aucs"][1][0] is not None


def test_compute_dtype_flag_and_resume(tmp_path):
    """--compute-dtype reaches the trainer, lands in setup.json, and --load
    restores it (CLIP defaults to bfloat16, others to float32)."""
    import jax.numpy as jnp
    from eoe_tpu.main import create_trainer, train_cifar
    from eoe_tpu.models.cnn import CNN32

    t32 = create_trainer("hsc", "c", "cifar10", None, 1, 1e-3, 0.0, [], 8,
                         "one_vs_rest", None, CNN32(), ["normalize"], ["normalize"],
                         dataset_path=str(tmp_path), logpath=str(tmp_path / "l1"))
    assert t32.compute_dtype == jnp.float32
    assert t32.setup_dict()["compute_dtype"] == "float32"
    tb = create_trainer("hsc", "c", "cifar10", None, 1, 1e-3, 0.0, [], 8,
                        "one_vs_rest", None, CNN32(), ["normalize"], ["normalize"],
                        compute_dtype="bfloat16",
                        dataset_path=str(tmp_path), logpath=str(tmp_path / "l2"))
    assert tb.compute_dtype == jnp.bfloat16

    _, res = train_cifar.main(base_args(tmp_path, ["--compute-dtype", "bfloat16"]))
    assert np.isfinite(res["mean_auc"])
    setups = glob.glob(str(tmp_path / "**" / "setup.json"), recursive=True)
    assert any(json.load(open(s)).get("compute_dtype") == "bfloat16" for s in setups)


def test_cli_mesh_vmap_seeds_shards_grid(tmp_path):
    """`-d 8 --vmap-seeds --iterations 8` through a real runner: the CLI
    builds the 8-device mesh and the vmapped seed grid shards across it."""
    from eoe_tpu.main import train_cifar
    _, res = train_cifar.main(
        ["-e", "1", "--iterations", "8", "--classes", "0",
         "--oe-dataset", "cifar100", "--datapath", str(tmp_path),
         "--superdir", str(tmp_path), "-d", "8", "--vmap-seeds", "-b", "16"])
    assert len(res["cls_aucs"][0]) == 8
    assert all(np.isfinite(a) for a in res["cls_aucs"][0])
    # the vmapped grid ran AND sharded (8 seeds % 8 devices == 0, data mesh)
    logs = glob.glob(str(tmp_path / "**" / "print.txt"), recursive=True)
    assert logs and ("seeds of cls 0 vmapped (seed axis sharded over the "
                     "data mesh)") in open(logs[0]).read()
