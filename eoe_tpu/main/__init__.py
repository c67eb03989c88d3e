"""Experiment orchestration: argparse stack, trainer factories, multiscale
driver, resume loaders.

Parity target: /root/reference/src/eoe/main/__init__.py —
  * ``default_argsparse`` with the reference's 14 shared flags plus
    modify_descr/parser/args hooks (:39-152); ``-d/--devices`` becomes the
    number of TPU chips for the data-parallel mesh (the reference is
    single-GPU; multi-device here is a capability upgrade, SURVEY.md §2.7),
  * ``ms_argsparse`` adds --ms-mode TRANSFORM+DSPART + --magnitude (:155-184),
  * ``evolve_argsparse`` adds the ten --ev-* flags (:187-277),
  * ``create_trainer`` / ``evolve_trainer`` factories (:280-363),
  * ``evolve_setup`` / ``rand_pick_setup`` GA preparation (:366-482),
  * ``multiscale_experiment`` magnitude sweep with the test-part model-reuse
    rule (:485-548),
  * ``load_setup`` / ``load_evolve`` resume with strict config matching
    (:551-712); continued runs log into ``{old_dir}---CNTD``.

Transform pipelines are the serializable spec lists of
:mod:`eoe_tpu.ops.preprocess` instead of torchvision Composes.
"""

import json
import os
import os.path as pt
import time
from argparse import ArgumentParser, BooleanOptionalAction, Namespace
from copy import deepcopy
from itertools import product
from typing import Callable, List, Optional, Sequence, Tuple, Union

import numpy as np

from eoe_tpu.datasets import (DS_CHOICES, DS_PARTS, MSM, MSM_TRANSFORMS,
                              TRAIN_NOMINAL_ID, TRAIN_OE_ID, no_classes)
from eoe_tpu.datasets.bases import INF
from eoe_tpu.evolve import (Individual, Toolbox, evaluate_individual, init_individual,
                            mate_individuals, mutate_individual,
                            replace_individuals_randomly, seed_evolution,
                            select_individual)
from eoe_tpu.evolve.tree import EvolNode, Individual as TreeIndividual, Tree
from eoe_tpu.ops.preprocess import specs_repr
from eoe_tpu.parallel import mesh as meshlib
from eoe_tpu.training import TRAINER, Trainer
from eoe_tpu.utils.logger import Logger

AD_MODE_MAP = {"ovr": "one_vs_rest", "loo": "leave_one_out", "ff": "fifty_fifty"}


def default_datapath() -> str:
    return os.environ.get("EOE_TPU_DATAPATH", pt.abspath(pt.join(os.getcwd(), "data")))


def default_argsparse(modify_descr: Callable[[str], str],
                      modify_parser: Callable[[ArgumentParser], None] = None,
                      modify_args: Callable[[Namespace], None] = None,
                      argv: Optional[List[str]] = None) -> Namespace:
    """The shared training CLI (parity: main/__init__.py:39-152).
    ``argv`` enables programmatic invocation (tests)."""
    parser = ArgumentParser(
        description=modify_descr(
            "Iterates over a set of classes found in the dataset and multiple random "
            "seeds per class. For each class-seed combination, it trains and evaluates "
            "a given AD model and objective. Depending on the ad_mode, it either treats "
            "the current class or all but the current class as normal. It always "
            "evaluates using the full test set. "))
    parser.add_argument("-ds", "--dataset", type=str, default=None,
                        choices=tuple(DS_CHOICES.keys()),
                        help="The dataset for which to train the AD model.")
    parser.add_argument("-oe", "--oe-dataset", type=str, default=None,
                        choices=tuple(DS_CHOICES.keys()) + ("none",),
                        help="Optional Outlier Exposure dataset; concatenates an equally "
                             "sized batch of its samples as auxiliary anomalies.")
    parser.add_argument("--oe-size", type=int, default=INF,
                        help="Use a random subset of the OE dataset with this size.")
    parser.add_argument("-b", "--batch-size", type=int, default=200,
                        help="Batch size (doubled when an OE dataset is present).")
    parser.add_argument("-e", "--epochs", type=int, default=50)
    parser.add_argument("-lr", "--learning-rate", type=float, default=1e-3)
    parser.add_argument("-wdk", "--weight-decay", type=float, default=1e-4)
    parser.add_argument("--milestones", type=int, nargs="+", default=[],
                        help="LR-scheduler milestones; each reduces the LR by 0.1.")
    parser.add_argument("-o", "--objective", type=str, default="hsc",
                        choices=tuple(TRAINER.keys()))
    parser.add_argument("--ad-mode", type=str, default="ovr", choices=("ovr", "loo", "ff"),
                        help="one-vs-rest, leave-one-class-out, or fifty-fifty benchmark mode.")
    parser.add_argument("--classes", type=int, nargs="+", default=None,
                        help="Class ids to iterate over; defaults to all.")
    parser.add_argument("-d", "--devices", type=int, metavar="N-CHIPS", default=None,
                        help="Number of TPU chips for the data-parallel mesh. Defaults "
                             "to all available devices. (The torch reference was "
                             "single-GPU; here batches shard over ICI.)")
    parser.add_argument("-it", "--iterations", type=int, default=2,
                        help="Random seeds per class.")
    parser.add_argument("--load", type=str, metavar="FILE-PATH", default=None,
                        help="Path to a previous run's logging directory; loads config + "
                             "snapshots, re-evaluates completed class-seed combos, and "
                             "continues into {old_dir}---CNTD.")
    parser.add_argument("--comment", type=str, default="")
    parser.add_argument("--superdir", type=str, default=".")
    parser.add_argument("--compute-dtype", type=str, default=None,
                        choices=("float32", "bfloat16"),
                        help="Matmul/conv compute precision on device. Defaults to "
                             "bfloat16 for the CLIP objective (the reference trains "
                             "CLIP in fp16, clip.py:73-117) and float32 otherwise "
                             "(the reference trains the from-scratch models in fp32).")
    parser.add_argument("--datapath", type=str, default=None,
                        help="Data root (default: $EOE_TPU_DATAPATH or ./data).")
    parser.add_argument("--vmap-seeds", action=BooleanOptionalAction,
                        default=None,
                        help="Train all seeds of a class as ONE vmapped program "
                             "(device-resident datasets; TPU-native grid "
                             "parallelism). Best for from-scratch models with "
                             "many epochs: ~3x for 8 CNN32 seeds at 25 epochs, "
                             "growing with epoch count; no benefit for CLIP "
                             "(pretrained init makes seed replicas identical). "
                             "On a data mesh (--devices N) the seed axis also "
                             "shards across chips when the seed count divides "
                             "the mesh. Default: auto — ON whenever the safe "
                             "heuristic holds (multi-seed non-CLIP training "
                             "from scratch on device-resident data); "
                             "--no-vmap-seeds forces the sequential grid.")
    if modify_parser is not None:
        modify_parser(parser)
    args = parser.parse_args(argv)
    if args.oe_dataset == "none":
        args.oe_dataset = None
    args.ad_mode = AD_MODE_MAP[args.ad_mode]
    if modify_args is not None:
        modify_args(args)
    return args


def ms_argsparse(modify_descr, modify_parser=None, modify_args=None, argv=None):
    """Adds --ms-mode and --magnitude (parity: main/__init__.py:155-184)."""

    def combined_parser(parser):
        parser.add_argument(
            "--ms-mode", type=str, default=(), nargs="+",
            choices=["+".join((i, j)) for i, j in product(MSM_TRANSFORMS, DS_PARTS.keys())],
            help="Multi-scale modes TRANSFORM+DSPART, e.g. lpf+train_nominal.")
        parser.add_argument("--magnitude", type=int, default=14,
                            help="Magnitude applied to all MSMs.")
        if modify_parser is not None:
            modify_parser(parser)

    def combined_args(args):
        args.ms_mode = [MSM(m.split("+")[0], m.split("+")[1], args.magnitude)
                        for m in args.ms_mode]
        if modify_args is not None:
            modify_args(args)

    return default_argsparse(modify_descr, combined_parser, combined_args, argv)


def evolve_argsparse(modify_descr, modify_parser=None, modify_args=None, argv=None):
    """Adds the --ev-* flags (parity: main/__init__.py:187-277)."""

    def evolve_descr(s):
        s += ("Repeats this complete procedure with different fixed Outlier Exposure "
              "(OE) subsets chosen by an evolutionary algorithm optimizing mean AUC. ")
        return modify_descr(s) if modify_descr is not None else s

    def evolve_parser(parser):
        parser.add_argument("--ev-oesize", type=int, default=1)
        parser.add_argument("--ev-generation-pool", type=int, default=16)
        parser.add_argument("--ev-mutation-pool", type=int, default=100)
        parser.add_argument("--ev-mutation-indp", type=float, default=1.0)
        parser.add_argument("--ev-mutation-oneofkbest", type=int, default=3)
        parser.add_argument("--ev-mutation-chance", type=float, default=0.5)
        parser.add_argument("--ev-mate-chance", type=float, default=0.2)
        parser.add_argument("--ev-generations", type=int, default=30)
        parser.add_argument("--ev-select-toursize", type=int, default=3)
        parser.add_argument("--ev-minimize-fitness", action="store_true")
        parser.add_argument("--ev-seed", type=int, default=0,
                            help="Seed for all stochastic GA decisions (init, "
                                 "mutation, mating, selection). Same-seed runs "
                                 "reproduce byte-identically; each generation's "
                                 "stream derives from (seed, gen), so resumes "
                                 "replay the uninterrupted run.")
        parser.add_argument("--ev-vmap", action="store_true",
                            help="Vectorize fitness evaluation: train all candidates "
                                 "of a generation as one vmapped program (TPU-native "
                                 "replacement for the reference's sequential runs).")
        parser.add_argument("--ev-continue-run", type=str, default=None)
        if modify_parser is not None:
            modify_parser(parser)

    def evolve_args(args):
        if args.load is not None:
            raise ValueError("For the evolutionary algorithm, `--load` has no impact. "
                             "Use `--ev-continue-run` instead.")
        if args.oe_size != INF:
            raise ValueError("For the evolutionary algorithm, `--oe-size` has no impact. "
                             "Use `--ev-oesize` instead.")
        if modify_args is not None:
            modify_args(args)

    return ms_argsparse(evolve_descr, evolve_parser, evolve_args, argv)


# ---------------------------------------------------------------- factories


def _enable_compile_cache():
    """Persistent XLA compilation cache (EOE_TPU_COMPILE_CACHE=0 disables):
    repeat runs of the same configuration skip the multi-minute TPU compiles."""
    if os.environ.get("EOE_TPU_COMPILE_CACHE", "1") == "0":
        return
    import jax
    if jax.default_backend() == "cpu":
        # CPU AOT cache entries are machine-feature-specific: entries written
        # by the remote TPU host's CPU load as pathologically slow executables
        return
    try:
        jax.config.update("jax_compilation_cache_dir",
                          pt.expanduser("~/.cache/eoe_tpu_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def _make_mesh(devices: Optional[int]):
    import jax
    _enable_compile_cache()
    meshlib.init_distributed()  # no-op unless EOE_TPU_DISTRIBUTED=1
    n = len(jax.devices())
    if devices is not None:
        n = min(devices, n)
    if n <= 1:
        return None
    return meshlib.make_mesh(meshlib.MeshConfig(data=n, model=1))


def create_trainer(trainer: str, comment: str, dataset: str, oe_dataset: Optional[str],
                   epochs: int, lr: float, wdk: float, milestones: List[int],
                   batch_size: int, ad_mode: str, devices: Optional[int], model,
                   train_specs: Sequence, test_specs: Sequence,
                   oe_limit_samples: Union[int, List[int]] = INF,
                   oe_limit_classes: Union[int, float] = INF,
                   msm: Sequence[MSM] = (), logpath: str = None, **kwargs) -> Trainer:
    """Build the trainer + logger (parity: main/__init__.py:280-317)."""
    import jax.numpy as jnp
    dtype_name = kwargs.pop("compute_dtype", None) or (
        "bfloat16" if trainer == "clip" else "float32")
    kwargs["compute_dtype"] = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    datapath = kwargs.pop("dataset_path", None) or default_datapath()
    superdir = kwargs.pop("superdir", ".")
    continue_run = kwargs.pop("continue_run", None)

    if continue_run is None:
        logger = Logger(pt.join(datapath, "results", superdir) if logpath is None
                        else logpath, comment)
    else:
        logger = Logger(continue_run + "---CNTD", noname=True)

    if dataset == "custom" or oe_dataset == "custom":
        from eoe_tpu.datasets.custom import ADCustomDS
        if ADCustomDS.train_only or ADCustomDS.eval_only:
            cstm_classes = ADCustomDS.determine_classes(datapath)
        else:
            datapath = pt.join(datapath, "datasets")
            cstm_classes = ADCustomDS.determine_classes(datapath)
        DS_CHOICES["custom"]["str_labels"] = cstm_classes
        DS_CHOICES["custom"]["no_classes"] = len(cstm_classes)
    else:
        datapath = pt.join(datapath, "datasets")

    return TRAINER[trainer](
        model=model, train_specs=train_specs, test_specs=test_specs, dataset=dataset,
        oe_dataset=oe_dataset, datapath=datapath, logger=logger, epochs=epochs, lr=lr,
        wdk=wdk, milestones=milestones, batch_size=batch_size, ad_mode=ad_mode,
        oe_limit_samples=oe_limit_samples, oe_limit_classes=oe_limit_classes, msms=msm,
        mesh=_make_mesh(devices), **kwargs)


def evolve_trainer(trainer: str, comment: str, dataset: str, oe_dataset: Optional[str],
                   epochs: int, lr: float, wdk: float, milestones: List[int],
                   batch_size: int, ad_mode: str, devices: Optional[int], model,
                   train_specs: Sequence, test_specs: Sequence,
                   oe_limit_samples: Union[int, List[int]] = INF,
                   oe_limit_classes: Union[int, float] = INF,
                   msms: Sequence[MSM] = (), evolve_tag: str = "", logpath: str = None,
                   classes: Optional[List[int]] = None, **kwargs):
    """Trainer with a pinned single-class dataset for the evolution loop
    (parity: main/__init__.py:320-363)."""
    from eoe_tpu.datasets import load_dataset

    evolve_dir = pt.join(kwargs.pop("superdir", "."),
                         f"log_{time.strftime('%Y%m%d%H%M%S')}_evolve_{evolve_tag}")
    continue_run = kwargs.pop("continue_run", None)
    if continue_run is not None:
        evolve_dir = continue_run + "---CNTD"
    trainer_obj = create_trainer(
        trainer, comment, dataset, oe_dataset, epochs, lr, wdk, milestones, batch_size,
        ad_mode, devices, model, train_specs, test_specs, oe_limit_samples,
        oe_limit_classes, msms, logpath, superdir=evolve_dir, continue_run=None, **kwargs)
    dummy = classes[0] if classes else 0
    ds = load_dataset(
        trainer_obj.dsstr, trainer_obj.datapath, trainer_obj.get_nominal_classes(dummy), 0,
        trainer_obj.train_specs, trainer_obj.test_specs, trainer_obj.logger,
        trainer_obj.oe_dsstr, trainer_obj.oe_limit_samples, trainer_obj.oe_limit_classes,
        trainer_obj.msms)
    if classes is not None and len(classes) == 1:
        trainer_obj.ds = ds
    else:
        raise NotImplementedError(
            "Evolve for multiple classes at once does not work: individuals pin "
            "trainer.ds.oe.train_set.indices, which a per-class dataset rebuild would "
            "discard (see the reference's rationale, main/__init__.py:350-360).")
    oeds = ds.oe.train_set
    outer_logger = Logger(pt.join(trainer_obj.logger.dir, ".."), noname=True)
    return trainer_obj, oeds, outer_logger


# ---------------------------------------------------------------- GA setup


def _make_history(**setup) -> dict:
    return {"pop": [], "fit": [], "mean_fit": [], "std_fit": [], "max_fit": [],
            "min_fit": [], "setup": setup}


def evolve_setup(oesize: int, generation_pool: int, mutation_pool: int,
                 mutation_indp: float, mutation_oneofkbest: int, mutation_chance: float,
                 mate_chance: float, generations: int, select_toursize: int,
                 trainer: Trainer, oeds, args: Namespace, maxfit: bool = True,
                 vmap_candidates: bool = False, seed: Optional[int] = None):
    """Prepare the GA toolbox + initial population (parity: main/__init__.py:366-430).
    The history's setup keys (incl. the reference's 'geneation_pool' typo) are
    kept for resume-file compatibility. ``vmap_candidates`` registers the
    vectorized fitness evaluator (eoe_tpu.evolve.vmapped): K candidates train
    as ONE vmapped program instead of K sequential runs. ``seed`` makes every
    stochastic GA decision reproducible (logged in the run's results.json
    setup; the reference leaves evolution unseeded)."""
    if seed is not None:
        seed_evolution(seed)
    history = _make_history(
        oesize=oesize, geneation_pool=generation_pool, mutation_pool=mutation_pool,
        mutation_indp=mutation_indp, mutation_oneofkbest=mutation_oneofkbest,
        mutation_chance=mutation_chance, mate_chance=mate_chance,
        generations=generations, oeds=trainer.oe_dsstr, select_toursize=select_toursize,
        ev_seed=seed)
    weight = 1.0 if maxfit else -1.0
    toolbox = Toolbox()
    toolbox.register("evaluate", evaluate_individual, trainer=trainer, args=args,
                     toolbox=toolbox)
    if vmap_candidates:
        from eoe_tpu.evolve.vmapped import VmappedEvaluator
        evaluator = VmappedEvaluator(trainer, args)
        toolbox.register("evaluate_population", evaluator.evaluate_population)
    toolbox.register("mate", mate_individuals, oeds=oeds, poolsize=mutation_pool,
                     indp=mutation_indp, oneofkbest=mutation_oneofkbest)
    toolbox.register("mutate", mutate_individual, oeds=oeds, poolsize=mutation_pool,
                     indp=mutation_indp, oneofkbest=mutation_oneofkbest)
    toolbox.register("select", select_individual, tournsize=select_toursize)
    pop = [Individual([init_individual(oeds) for _ in range(oesize)], weight)
           for _ in range(generation_pool)]
    tree = Tree(*[EvolNode(TreeIndividual(list(ind))) for ind in pop])
    return pop, 0, toolbox, history, tree


def rand_pick_setup(oesize: int, generation_pool: int, trainer: Trainer, oeds,
                    args: Namespace, maxfit: bool = True, seed: Optional[int] = None):
    """Random-search baseline setup (parity: main/__init__.py:433-482)."""
    if seed is not None:
        seed_evolution(seed)
    history = _make_history(oesize=oesize, ev_seed=seed)
    weight = 1.0 if maxfit else -1.0
    toolbox = Toolbox()
    toolbox.register("evaluate", evaluate_individual, trainer=trainer, args=args,
                     toolbox=toolbox)
    toolbox.register("mate", mate_individuals, oeds=oeds, poolsize=0, indp=0.0,
                     oneofkbest=0)
    toolbox.register("mutate", mutate_individual, oeds=oeds, poolsize=0, indp=0.0,
                     oneofkbest=0)
    toolbox.register("select", replace_individuals_randomly, oeds=oeds)
    pop = [Individual([init_individual(oeds) for _ in range(oesize)], weight)
           for _ in range(generation_pool)]
    tree = Tree(*[EvolNode(TreeIndividual(list(ind))) for ind in pop])
    return pop, 0, toolbox, history, tree


# ---------------------------------------------------------------- multiscale


def multiscale_experiment(args: Namespace, model, train_specs, test_specs,
                          magnitudes: Sequence[int] = (0, 1, 2, 4, 8, 16, 32), **kwargs):
    """One full training per MSM magnitude (parity: main/__init__.py:485-548):
    when all MSMs touch only test parts, magnitudes != 0 reuse the
    magnitude-0 models with epochs=0."""
    aucs = []
    superdir = kwargs.pop("superdir", ".")
    continue_run = kwargs.pop("continue_run", [])
    continue_last_magnitude = kwargs.pop("continue_last_magnitude", (None, None))
    plot_elsewhere = kwargs.pop("plot_elsewhere", None)
    datapath = kwargs.pop("dataset_path", None) or default_datapath()

    if len(continue_run) == 0:
        logger = Logger(pt.join(datapath, "results", superdir), args.comment)
    else:
        logger = Logger(args.continue_run if plot_elsewhere is None else plot_elsewhere,
                        noname=True)
    Trainer.KEEP_SNAPSHOT_IN_RAM = False
    magn0_snapshots = None
    test_only_msms = all(m.ds_part not in (TRAIN_NOMINAL_ID, TRAIN_OE_ID)
                         for m in args.ms_mode)
    for i, magnitude in enumerate(magnitudes):
        if len(continue_run) > i:
            aucs.append(tuple(continue_run[i]))
            if test_only_msms:
                raise NotImplementedError(
                    "For test-only MSMs, the magnitude-0 models have to be loaded "
                    "from the snapshots!")
            continue
        trainer = create_trainer(
            args.objective, f"magnitude_{magnitude}", args.dataset, args.oe_dataset,
            args.epochs, args.learning_rate, args.weight_decay, args.milestones,
            args.batch_size, args.ad_mode, args.devices, model, train_specs, test_specs,
            msm=[m.set_magnitude(magnitude) for m in args.ms_mode], logpath=logger.dir,
            oe_limit_samples=args.oe_size, continue_run=continue_last_magnitude[1],
            dataset_path=datapath, **kwargs)
        if magnitude != 0 and test_only_msms:
            trainer.epochs = 0
            _, results = trainer.run(args.classes, args.iterations, magn0_snapshots)
        else:
            _, results = trainer.run(args.classes, args.iterations,
                                     continue_last_magnitude[0])
        continue_last_magnitude = (None, None)
        if magnitude == 0:
            # snapshot paths of the magnitude-0 run for later epochs=0 reuse
            classes = args.classes if args.classes is not None else \
                list(range(no_classes(args.dataset)))
            magn0_snapshots = [
                [trainer.logger.snapshot_path(f"snapshot_cls{c}_it{i}")
                 if c in classes else None for i in range(args.iterations)]
                for c in range(no_classes(args.dataset))]
        aucs.append((results["mean_auc"], results["std_auc"]))

    print(f"----------------- {args.ms_mode} OVERVIEW -----------------")
    for s, (a, std) in zip(magnitudes, aucs):
        print(f"{args.ms_mode} with magnitude={s:02d} yielded {a * 100:04.2f} "
              f"+- {std * 100:04.2f}.")
    logger.logjson("results", {
        "magnitudes": list(magnitudes), "aucs": [a for a, _ in aucs],
        "stds": [s for _, s in aucs], "classes": args.classes, "comment": args.comment,
        "ms_mode": [repr(m) for m in args.ms_mode], "dataset": args.dataset})
    return aucs


# ---------------------------------------------------------------- runner tail


def run_default_training(args: Namespace, model, train_specs, test_specs):
    """The shared tail of every train_{DS}.py runner: resume, build, run
    (parity: e.g. train_cifar.py:44-53)."""
    snapshots, continue_run = load_setup(args.load, args, train_specs, test_specs)
    print("Program started with:\n", vars(args))
    trainer = create_trainer(
        args.objective, args.comment, args.dataset, args.oe_dataset, args.epochs,
        args.learning_rate, args.weight_decay, args.milestones, args.batch_size,
        args.ad_mode, args.devices, model, train_specs, test_specs,
        oe_limit_samples=args.oe_size, continue_run=continue_run,
        superdir=args.superdir, dataset_path=args.datapath,
        compute_dtype=getattr(args, "compute_dtype", None))
    return trainer.run(args.classes, args.iterations, snapshots,
                       vmap_seeds=getattr(args, 'vmap_seeds', None))


# ---------------------------------------------------------------- resume


def load_setup(path: Optional[str], args: Namespace, check_train_specs,
               check_test_specs) -> Tuple[Optional[List[List[Optional[str]]]], Optional[str]]:
    """Load a previous run's configuration + snapshot matrix
    (parity: main/__init__.py:551-625)."""
    if path is None:
        return None, None
    if path.startswith("sftp://"):
        path = path[7:][path[7:].index("/"):]
    print(f"Load setup from {path}")
    with open(pt.join(path, "setup.json")) as r:
        setup = json.load(r)
    v1 = pt.join(path, "setup_v1.json")
    run_meta = {}
    if pt.exists(v1):
        with open(v1) as r:
            run_meta = json.load(r)

    assert specs_repr(setup.pop("train_specs")) == specs_repr(check_train_specs), \
        "The loaded train transformation pipeline does not match the set one. " \
        "Please match manually."
    assert specs_repr(setup.pop("test_specs")) == specs_repr(check_test_specs), \
        "The loaded test transformation pipeline does not match the set one. " \
        "Please match manually."
    assert setup.pop("dataset") == args.dataset, \
        f"It seems like the set dataset ({args.dataset}) is not the one found in the " \
        f"loaded experiment. Please match manually."
    assert setup.pop("objective") == args.objective, \
        f"It seems like the set objective ({args.objective}) is not the one found in " \
        f"the loaded experiment. Please match manually."
    args.oe_dataset = setup.pop("oe_dataset")
    args.epochs = setup.pop("epochs")
    args.learning_rate = setup.pop("lr")
    args.weight_decay = setup.pop("wdk")
    args.milestones = setup.pop("milestones")
    args.batch_size = setup.pop("batch_size")
    args.ad_mode = setup.pop("ad_mode")
    oe_size = setup.pop("oe_limit_samples", INF)
    args.oe_size = INF if oe_size in (None, "inf", "Infinity") else oe_size
    msms = setup.pop("msms", None)
    args.ms_mode = [MSM.load(m) for m in msms] if msms else []
    args.classes = run_meta.get("run_classes", getattr(args, "classes", None))
    args.iterations = run_meta.get("run_seeds", getattr(args, "iterations", 1))
    args.compute_dtype = setup.pop("compute_dtype", None)
    for known in ("model", "datapath", "oe_limit_classes", "seed", "nominal_label"):
        setup.pop(known, None)
    assert len(setup) == 0, f"There are unexpected arguments in the loaded setup: {setup.keys()}."

    classes = args.classes if args.classes is not None else range(no_classes(args.dataset))
    snapshots: List[List[Optional[str]]] = []
    for c in range(no_classes(args.dataset)):
        snapshots.append([])
        for i in range(args.iterations):
            snap = pt.join(path, "snapshots", f"snapshot_cls{c}_it{i}.msgpack")
            snapshots[-1].append(snap if c in classes and pt.exists(snap) else None)
    return snapshots, path


def load_evolve(path: Optional[str], tree: Tree, history: dict, pop: list, gen: int,
                logger: Logger, trainer: Trainer, dataset, args: Namespace,
                check_train_specs, check_test_specs):
    """Resume an evolution experiment (parity: main/__init__.py:628-712)."""
    if path is None:
        return history, pop, gen, logger, None

    print(f"Load evolve setup from {path}")
    with open(pt.join(path, "results.json")) as r:
        loaded_history = json.load(r)
    setup = deepcopy(loaded_history["setup"])
    for k in setup:
        assert k in history["setup"], f"{k} is in loaded setup but not in setup!"
    for k in history["setup"]:
        # ev_seed is optional: runs recorded before it existed can still resume
        assert k in setup or k == "ev_seed", f"{k} is in setup but not in loaded setup!"
    args.ev_seed = setup.pop("ev_seed", getattr(args, "ev_seed", None))
    args.ev_oesize = setup.pop("oesize")
    args.ev_generation_pool = setup.pop("geneation_pool")
    args.ev_mutation_pool = setup.pop("mutation_pool")
    args.ev_mutation_indp = setup.pop("mutation_indp")
    args.ev_mutation_oneofkbest = setup.pop("mutation_oneofkbest")
    args.ev_mutation_chance = setup.pop("mutation_chance")
    args.ev_mate_chance = setup.pop("mate_chance")
    args.ev_generations = setup.pop("generations")
    setup.pop("oeds")
    args.ev_select_toursize = setup.pop("select_toursize")
    assert len(setup) == 0, f"setup contains unexpected keys ({setup.keys()})"
    history = loaded_history

    inner = [d for d in os.listdir(path)
             if pt.isdir(pt.join(path, d)) and d.startswith("log_")]
    if inner:
        # a ---CNTD continuation creates a SECOND inner run dir; resume from
        # the most-continued (and then newest) one, not listdir order
        inner.sort(key=lambda d: (d.count("---CNTD"), d))
        load_setup(pt.join(path, inner[-1]), args, check_train_specs, check_test_specs)

    tree.load(pt.join(path, "evolution.json"))
    nodes = tree.bfs()[1:]
    if len(history["pop"]) > 0:
        nodes = [[n for n in nodes if n.content.values == val][0].content
                 for val in history["pop"][-1]]
    else:
        raise ValueError(f"The loaded experiment at {path} has no finished generation "
                         f"that can be used to continue it.")
    weight = -1.0 if args.ev_minimize_fitness else 1.0
    pop = []
    for n in nodes:
        ind = Individual(n.values, weight)
        ind.fitness.values = (n.fitness,)
        ind.file = n.file
        pop.append(ind)
    gen = len(history["pop"])

    _, _, toolbox, _, _ = evolve_setup(
        args.ev_oesize, args.ev_generation_pool, args.ev_mutation_pool,
        args.ev_mutation_indp, args.ev_mutation_oneofkbest, args.ev_mutation_chance,
        args.ev_mate_chance, args.ev_generations, args.ev_select_toursize, trainer,
        dataset, args, not args.ev_minimize_fitness,
        vmap_candidates=getattr(args, "ev_vmap", False), seed=args.ev_seed)
    return history, pop, gen, logger, toolbox
