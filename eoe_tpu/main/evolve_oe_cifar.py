"""CLI runner: evolutionary search for the single best/worst OE sample on CIFAR-10.

Parity target: /root/reference/src/eoe/main/evolve_oe_cifar.py.
Run: python -m eoe_tpu.main.evolve_oe_cifar [flags]
"""

import os
import os.path as pt

from eoe_tpu.evolve import evaluate, evolve
from eoe_tpu.main import (evolve_argsparse, evolve_setup, evolve_trainer, load_evolve,
                          load_setup)

DEFAULTS = dict(
    comment='{obj}_cifar10_cl{classes}_its{its}',
    objective='hsc',
    dataset='cifar10',
    oe_dataset='tinyimages',
    epochs=30,
    learning_rate=0.001,
    weight_decay=0,
    milestones=[25],
    batch_size=128,
    classes=[0],
    iterations=2,
    ev_oesize=1,
    ev_generation_pool=64,
    ev_mutation_pool=10000,
    ev_mutation_indp=1,
    ev_mutation_oneofkbest=50,
    ev_mutation_chance=0.55,
    ev_mate_chance=0.05,
    ev_generations=50,
    ev_select_toursize=3,
)

TRAIN_SPECS = ['normalize']
TEST_SPECS = ['normalize']


def build_model(args):
    from eoe_tpu.models.cnn import CNN32
    return CNN32(bias=True, clf=args.objective in ("bce", "focal"))


def init(argv=None):
    def modify_parser(parser):
        parser.set_defaults(**DEFAULTS)

    args = evolve_argsparse(
        lambda s: f"{s} This specific script comes with a default configuration for "
                  f"finding optimal OE subsets for CIFAR-10.", modify_parser, argv=argv)
    args.comment = args.comment.format(
        obj=args.objective, admode=args.ad_mode,
        classes="+".join(str(c) for c in args.classes), its=args.iterations)
    if args.ev_continue_run is not None:
        dirs = [pt.join(args.ev_continue_run, f) for f in os.listdir(args.ev_continue_run)
                if pt.isdir(pt.join(args.ev_continue_run, f)) and f.startswith("log_")]
        if not dirs:
            raise ValueError(f"Could not find a training log directory in "
                             f"{args.ev_continue_run}.")
        load_setup(dirs[0], args, TRAIN_SPECS, TEST_SPECS)
    print("Program started with:\n", vars(args))
    trainer, oeds, logger = evolve_trainer(
        args.objective, "", args.dataset, args.oe_dataset, args.epochs,
        args.learning_rate, args.weight_decay, args.milestones, args.batch_size,
        args.ad_mode, args.devices, build_model(args), TRAIN_SPECS, TEST_SPECS,
        evolve_tag=args.comment, classes=args.classes, msms=args.ms_mode,
        superdir=args.superdir, continue_run=args.ev_continue_run,
        dataset_path=args.datapath)
    return trainer, oeds, args, logger


def main(argv=None):
    trainer, ds, args, logger = init(argv)
    pop, start_gen, toolbox, history, tree = evolve_setup(
        args.ev_oesize, args.ev_generation_pool, args.ev_mutation_pool,
        args.ev_mutation_indp, args.ev_mutation_oneofkbest, args.ev_mutation_chance,
        args.ev_mate_chance, args.ev_generations, args.ev_select_toursize, trainer, ds,
        args, not args.ev_minimize_fitness, vmap_candidates=args.ev_vmap,
        seed=args.ev_seed)
    if args.ev_continue_run is not None:
        history, pop, start_gen, logger, toolbox = load_evolve(
            args.ev_continue_run, tree, history, pop, start_gen, logger, trainer, ds,
            args, trainer.train_specs, trainer.test_specs)
    try:
        if start_gen == 0:
            evaluate(pop, pop, start_gen, toolbox, history, tree, ds, logger)
            start_gen += 1
        for gen in range(start_gen, args.ev_generations):
            evolve(pop, gen, toolbox, args.ev_mate_chance, args.ev_mutation_chance,
                   history, tree, ds, logger, seed=args.ev_seed)
    finally:
        logger.logjson("results", history)
        tree.save(pt.join(logger.dir, "evolution"))
        tree.render(pt.join(logger.dir, "genealogy.png"), oeds=ds)
        tree.imsave_collection_best(logger, args.ms_mode, oeds=ds)
        logger.drain()  # background preview/plot writes complete before exit
    return history, tree


if __name__ == "__main__":
    main()
