"""Evolutionary search for optimal (best/worst) Outlier Exposure samples.

Parity target: /root/reference/src/eoe/evolve/__init__.py. The reference
builds on DEAP; DEAP is not available here, so a minimal in-repo toolbox with
IDENTICAL operator semantics replaces it (SURVEY.md §7.1 sanctions this):

  * an Individual is a list of indices into the OE train subset, carrying a
    fitness (mean test AUC of a full trainer.run) and an image-file pointer,
  * mutation: sample ``poolsize`` random candidates, keep the ``oneofkbest``
    nearest in pixel L2 (self excluded via distance > 100), pick one
    (:131-157); TPU-native: the candidate distances are ONE jitted
    matmul-style reduction on device instead of a torch CPU loop,
  * mating: size-1 subsets search an image "inbetween" both parents (nearest
    to both); larger subsets swap elements (:81-128),
  * selection: tournament of ``tournsize`` with replacement (:167-185), or
    pure random replacement for the random-search baseline (:160-164),
  * evaluation: ``trainer.ds.oe.train_set.indices`` is pinned to the
    individual and a full ``trainer.run`` provides fitness = mean AUC
    (:55-78); the driver ``evolve`` = select -> mate -> mutate -> evaluate
    (:252-357) with selection/mating/mutation visualization grids.
"""

import copy
import os
import os.path as pt
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from eoe_tpu.evolve.tree import EvolNode, Individual as TreeIndividual, Tree

SELF_DIST = 100.0  # distance threshold excluding the sample itself (evolve/__init__.py:144)

# All stochastic GA decisions draw from this explicit generator rather than
# global random/np.random state (the reference leaves evolution unseeded —
# SURVEY.md §7.3 flags it; here two same-seed runs reproduce byte-identically).
# ``evolve_setup``/``rand_pick_setup`` reseed it from --ev-seed.
_rng: np.random.Generator = np.random.default_rng()


def seed_evolution(seed) -> np.random.Generator:
    """Reset the evolution PRNG. ``seed`` is an int or a sequence of ints
    (np.random.SeedSequence entropy); ``None`` draws OS entropy."""
    global _rng
    _rng = np.random.default_rng(seed)
    return _rng


class Fitness:
    def __init__(self, weight: float = 1.0):
        self.weight = weight
        self._values: Optional[Tuple[float, ...]] = None

    @property
    def values(self):
        return self._values

    @values.setter
    def values(self, v):
        self._values = tuple(v)

    @values.deleter
    def values(self):
        self._values = None

    @property
    def valid(self):
        return self._values is not None

    @property
    def weighted(self):
        return self._values[0] * self.weight if self.valid else None


class Individual(list):
    """A list of OE-subset indices with DEAP-like fitness bookkeeping."""

    def __init__(self, values, weight: float = 1.0):
        super().__init__(values)
        self.fitness = Fitness(weight)
        self.file = None


class Toolbox:
    """Minimal DEAP-toolbox replacement: named operator registry."""

    def __init__(self):
        self._ops = {}

    def register(self, name, fn, **fixed):
        self._ops[name] = (fn, fixed)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        fn, fixed = self._ops[name]
        return lambda *a, **k: fn(*a, **{**fixed, **k})

    def clone(self, obj):
        if isinstance(obj, Individual):
            new = Individual(list(obj), obj.fitness.weight)
            new.fitness._values = obj.fitness._values
            new.file = obj.file
            return new
        return copy.deepcopy(obj)


# ---------------------------------------------------------------- samples


def _gather_f32(oeds, ids: Sequence[int]) -> jnp.ndarray:
    """OE-subset samples as device float arrays in [0, 1], flattened."""
    imgs = oeds.gather(np.asarray(list(ids), dtype=np.int64) % len(oeds))
    x = jnp.asarray(imgs, jnp.float32)
    if imgs.dtype == np.uint8:
        x = x / 255.0
    return x.reshape(x.shape[0], -1)


def _nearest_excl_self(dists: np.ndarray, oneofkbest: int) -> int:
    """Position of a random pick among the k nearest with dist > SELF_DIST
    (parity: evolve/__init__.py:142-146)."""
    order = np.argsort(dists)
    vals = dists[order]
    start = next((a for a in range(len(vals)) if vals[a] > SELF_DIST), 0)
    c = int(_rng.integers(start, start + oneofkbest))
    return int(order[min(c, len(order) - 1)])


# ---------------------------------------------------------------- operators


def init_individual(oeds) -> int:
    """A random position into the OE subset; remembers the subset's original
    indices for later pinning (evolve/__init__.py:42-52)."""
    ensure_valid_indices(oeds)
    return int(_rng.integers(0, len(oeds.valid_indices)))


def ensure_valid_indices(oeds):
    """Pin the full OE index set once (evolve/__init__.py:42-52): individuals
    index into this frozen snapshot while ``indices`` is swapped per run."""
    if not hasattr(oeds, "valid_indices"):
        oeds.valid_indices = np.asarray(oeds.indices).copy()


def evaluate_individual(individual, trainer, args, toolbox) -> float:
    """Full training run with the individual as the only OE; fitness = mean
    test AUC (evolve/__init__.py:55-78)."""
    if trainer.logger.active and len(os.listdir(trainer.logger.dir)) > 5:
        trainer.logger.active = False  # avoid log spam after the first run
    trainer.oe_limit_samples = list(individual)
    if trainer.ds is not None:
        oeds = trainer.ds.oe.train_set
        oeds.indices = np.asarray([oeds.valid_indices[i] for i in individual], np.int64)
    res = trainer.run(args.classes, args.iterations)[1]["mean_auc"]
    if trainer.ds is not None:
        trainer.ds.oe.train_set.indices = np.asarray(
            trainer.ds.oe.train_set.valid_indices).copy()
    return float(res)


def mutate_individual(ind, oeds, poolsize: int, indp: float, oneofkbest: int):
    """Nearest-candidate replacement mutation (evolve/__init__.py:131-157)."""
    if poolsize <= 0:
        return (ind,)
    samples = _gather_f32(oeds, ind)
    new_ids = [int(_rng.integers(0, len(oeds))) for _ in range(poolsize)]
    new_samples = _gather_f32(oeds, new_ids)
    # all pairwise distances in one device op
    d = np.asarray(((samples[:, None, :] - new_samples[None, :, :]) ** 2).sum(-1))
    for n in range(len(ind)):
        if _rng.random() < indp:
            ind[n] = new_ids[_nearest_excl_self(d[n], oneofkbest)]
    return (ind,)


def _match_samples(samples1: jnp.ndarray, samples2: jnp.ndarray) -> List[int]:
    """Exhaustive min-cost assignment of parent samples (evolve/__init__.py:19-39)."""
    d = np.asarray(((samples1[:, None, :] - samples2[None, :, :]) ** 2).sum(-1))

    def ms(dm):
        n = dm.shape[0]
        if n == 1:
            return float(dm[0, 0]), [0]
        results = []
        for b in range(dm.shape[1]):
            sub = np.concatenate([dm[1:, :b], dm[1:, b + 1:]], axis=1)
            cost, picks = ms(sub)
            results.append((float(dm[0, b]) + cost,
                            [b] + [p if p < b else p + 1 for p in picks]))
        return min(results, key=lambda r: r[0])

    return ms(d)[1]


def mate_individuals(ind1, ind2, oeds, poolsize: int, indp: float, oneofkbest: int):
    """Size-1: replace with an image 'inbetween' both parents; larger: swap
    elements (evolve/__init__.py:81-128)."""
    if poolsize <= 0:
        return ind1, ind2
    if len(ind1) == 1:
        s1 = _gather_f32(oeds, ind1)
        s2 = _gather_f32(oeds, ind2)
        match = _match_samples(s1, s2)
        for n, b in zip(range(s1.shape[0]), match):
            pair = jnp.stack([s1[n], s2[b]])
            for ind in (ind1, ind2):
                if _rng.random() < indp:
                    new_ids = [int(_rng.integers(0, len(oeds))) for _ in range(poolsize)]
                    cand = _gather_f32(oeds, new_ids)
                    # sum of distances to BOTH parents
                    d = np.asarray(((pair[:, None, :] - cand[None, :, :]) ** 2).sum(-1).sum(0))
                    ind[n] = new_ids[_nearest_excl_self(d, oneofkbest)]
    else:
        for i in range(len(ind1)):
            if _rng.random() < indp:
                ind1[i], ind2[i] = ind2[i], ind1[i]
    return ind1, ind2


def replace_individuals_randomly(individuals, k=None, oeds=None):
    """Random-search baseline 'selection' (evolve/__init__.py:160-164)."""
    for n in range(len(individuals)):
        individuals[n] = Individual(
            [int(_rng.integers(0, len(oeds.valid_indices)))
             for _ in range(len(individuals[n]))],
            individuals[n].fitness.weight)
    return individuals


def select_individual(individuals, k, tournsize, replace=False):
    """Tournament selection with replacement across tournaments
    (evolve/__init__.py:167-185)."""
    chosen = []
    for _ in range(k):
        aspirants = [individuals[i] for i in
                     _rng.choice(len(individuals), tournsize, replace)]
        chosen.append(max(aspirants, key=lambda ind: ind.fitness.weighted))
    return chosen


# ---------------------------------------------------------------- drivers


def _pop_grid(oeds, pop) -> np.ndarray:
    ids = [i for ind in pop for i in ind]
    return oeds.gather(np.asarray(ids, np.int64) % len(oeds))


def evaluate(offspring, pop, gen: int, toolbox, history: dict, tree: Tree, oeds, logger):
    """Evaluate all not-yet-evaluated offspring, update history + tree
    (evolve/__init__.py:188-249). When the toolbox carries a vectorized
    ``evaluate_population`` (eoe_tpu.evolve.vmapped), the whole invalid set
    trains as vmapped chunks instead of sequential runs."""
    invalid = [ind for ind in offspring if not ind.fitness.valid]
    # identity, not value equality: Individual subclasses list, and a valid
    # clone with EQUAL values must not be re-evaluated
    invalid_ids = {id(ind) for ind in invalid}
    vectorized = "evaluate_population" in getattr(toolbox, "_ops", {})
    prefits = {}
    if vectorized and invalid:
        logger.print(f"Evaluate {len(invalid)} individuals (vmapped)..")
        fits = toolbox.evaluate_population([list(ind) for ind in invalid])
        prefits = {id(ind): f for ind, f in zip(invalid, fits)}
    for i, ind in [(i, ind) for i, ind in enumerate(offspring) if id(ind) in invalid_ids]:
        if vectorized:
            fit = prefits[id(ind)]
        else:
            logger.print(f"Evaluate ind{i:03}..")
            fit = toolbox.evaluate(ind)
        name = f"gen{gen:03}_ind{i:03}_fit{fit * 100:06.3f}"
        logger.logimg(pt.join("individuals", name), oeds.gather(
            np.asarray(list(ind), np.int64) % len(oeds)), nrow=16)
        logger.logtxt(f"{name} with ids {list(ind)}")
        ind.fitness.values = [fit]
        node = tree.get(ind)
        if node is not None:
            node.content.file = pt.join(logger.dir, "individuals", f"{name}.png")
            node.content.fitness = fit

    pop[:] = offspring
    fits = [ind.fitness.values[0] for ind in pop]
    mean, std = float(np.mean(fits)), float(np.std(fits))
    minf, maxf = float(np.min(fits)), float(np.max(fits))
    history["pop"].append([list(ind) for ind in pop])
    history["fit"].append(fits)
    history["mean_fit"].append(mean)
    history["std_fit"].append(std)
    history["min_fit"].append(minf)
    history["max_fit"].append(maxf)
    logger.logimg(pt.join("raw_gen", f"gen{gen:03}"), _pop_grid(oeds, pop),
                  nrow=max(len(pop[0]), 1))
    logger.print(f"GENERATION {gen:03}")
    logger.print(f"  Min {minf * 100:06.3f}")
    logger.print(f"  Max {maxf * 100:06.3f}")
    logger.print(f"  Avg {mean * 100:06.3f}")
    logger.print(f"  Std {std * 100:06.3f}")
    logger.add_scalar("avg_fit", mean * 100, gen)
    logger.add_scalar("max_fit", maxf * 100, gen)
    tree.save(pt.join(logger.dir, "evolution"))


def evolve(pop, gen: int, toolbox, mate_chance: float, mutation_chance: float,
           history: dict, tree: Tree, oeds, logger, log_mutations: bool = True,
           seed: Optional[int] = None):
    """One generation: select -> mate -> mutate -> evaluate
    (evolve/__init__.py:252-357). With ``seed``, the generation's PRNG stream
    is derived from (seed, gen) — so a --ev-continue-run resume draws exactly
    what the uninterrupted run would have drawn."""
    if seed is not None:
        seed_evolution((seed, gen))
    logger.print("-------------------------------------------------------")
    logger.print(f"-------------------GENERATION {gen:03}----------------------")
    logger.print("-------------------------------------------------------")

    offspring = toolbox.select(pop, len(pop))
    offspring = list(map(toolbox.clone, offspring))
    if log_mutations:
        logger.logimg(pt.join("selection", f"gen{gen:03}"),
                      np.concatenate([_pop_grid(oeds, pop), _pop_grid(oeds, offspring)]),
                      nrow=max(len(pop[0]), 1) if len(pop[0]) > 1 else len(pop))

    before = list(map(toolbox.clone, offspring))
    picked = []
    for i, (c1, c2) in enumerate(zip(offspring[::2], offspring[1::2])):
        if _rng.random() < mate_chance:
            n1, n2 = tree.get(c1), tree.get(c2)
            toolbox.mate(c1, c2)
            del c1.fitness.values
            del c2.fitness.values
            picked.append(i)
            cn1, cn2 = EvolNode(TreeIndividual(list(c1))), EvolNode(TreeIndividual(list(c2)))
            if n1 is not None:
                n1.add_children(cn1, cn2)
            if n2 is not None and n2 is not n1:
                n2.add_children(cn1, cn2)
    if log_mutations and picked:
        logger.logimg(pt.join("mating", f"gen{gen:03}"),
                      np.concatenate([_pop_grid(oeds, before), _pop_grid(oeds, offspring)]),
                      nrow=max(len(pop[0]), 1) if len(pop[0]) > 1 else len(pop))

    before = list(map(toolbox.clone, offspring))
    picked = []
    for i, mutant in enumerate(offspring):
        if _rng.random() < mutation_chance:
            node = tree.get(mutant)
            toolbox.mutate(mutant)
            del mutant.fitness.values
            picked.append(i)
            child = EvolNode(TreeIndividual(list(mutant)))
            if node is not None:
                node.add_children(child)
    if log_mutations and picked:
        logger.logimg(pt.join("mutation", f"gen{gen:03}"),
                      np.concatenate([_pop_grid(oeds, before), _pop_grid(oeds, offspring)]),
                      nrow=max(len(pop[0]), 1) if len(pop[0]) > 1 else len(pop))

    evaluate(offspring, pop, gen, toolbox, history, tree, oeds, logger)
