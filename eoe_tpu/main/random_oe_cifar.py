"""CLI runner: random-search baseline for OE-subset selection on CIFAR-10.

Parity target: /root/reference/src/eoe/main/random_oe_cifar.py.
Run: python -m eoe_tpu.main.random_oe_cifar [flags]
"""

import os.path as pt

from eoe_tpu.datasets.bases import INF
from eoe_tpu.evolve import evaluate
from eoe_tpu.main import evolve_trainer, ms_argsparse, rand_pick_setup

DEFAULTS = dict(
    comment='RANDPICK_{obj}_cifar10_cl{classes}_its{its}',
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
)

TRAIN_SPECS = ['normalize']
TEST_SPECS = ['normalize']


def build_model(args):
    from eoe_tpu.models.cnn import CNN32
    return CNN32(bias=True, clf=args.objective in ("bce", "focal"))


def main(argv=None):
    def modify_parser(parser):
        parser.add_argument("--ev-oesize", type=int, default=1,
                            help="The size of the OE subsets.")
        parser.add_argument("--ev-samples", type=int, default=2000,
                            help="The number of OE subsets that are randomly chosen.")
        parser.add_argument("--ev-seed", type=int, default=0,
                            help="Seed for the random subset draws (reproducible).")
        parser.set_defaults(**DEFAULTS)

    args = ms_argsparse(
        lambda s: f"{s} Repeats this complete procedure with different randomly chosen "
                  f"OE subsets. This specific script comes with a default configuration "
                  f"for CIFAR-10.", modify_parser, argv=argv)
    if args.oe_size != INF:
        raise ValueError("For finding random OE subsets, `--oe-size` has no impact. "
                         "Use `--ev-oesize` instead.")
    args.comment = args.comment.format(
        obj=args.objective, admode=args.ad_mode, classes=args.classes,
        its=args.iterations)
    print("Program started with:\n", vars(args))
    trainer, ds, logger = evolve_trainer(
        args.objective, "", args.dataset, args.oe_dataset, args.epochs,
        args.learning_rate, args.weight_decay, args.milestones, args.batch_size,
        args.ad_mode, args.devices, build_model(args), TRAIN_SPECS, TEST_SPECS,
        evolve_tag=args.comment, classes=args.classes, msms=args.ms_mode,
        superdir=args.superdir, dataset_path=args.datapath)
    pop, start_gen, toolbox, history, tree = rand_pick_setup(
        args.ev_oesize, args.ev_samples, trainer, ds, args,
        not getattr(args, "ev_minimize_fitness", False), seed=args.ev_seed)
    try:
        evaluate(pop, pop, start_gen, toolbox, history, tree, ds, logger)
    finally:
        logger.logjson("results", history)
        tree.save(pt.join(logger.dir, "evolution"))
        tree.render(pt.join(logger.dir, "genealogy.png"), oeds=ds)
        tree.imsave_collection_best(logger, args.ms_mode, oeds=ds)
    return history, tree


if __name__ == "__main__":
    main()
