"""Vectorized (vmapped) fitness evaluation for the evolutionary OE search.

The reference evaluates one individual at a time: each candidate OE subset
triggers a FULL sequential training run (evolve/__init__.py:55-78 — the hot
loop of the whole experiment: 64 individuals x 50 generations x epochs).
TPU-native redesign (the BASELINE.json north star): K candidates train
SIMULTANEOUSLY as one vmapped program —

  * the model parameters get a leading candidate axis (vmap over init with
    the SAME key: all candidates start from identical weights, which removes
    init noise from the fitness comparison),
  * every candidate sees the same normal-half batches; only the OE half
    differs (each candidate's OE indices), so the batch gather adds one
    candidate axis on the OE side only,
  * evaluation vmaps the forward over candidates on shared test batches and
    computes AUROC on device (ops.metrics.auroc_jax), so a whole
    generation's fitness is a handful of device launches instead of K
    sequential trainings.

Requires a device-resident pinned dataset (the evolve_trainer always pins
one) and a feature-space objective; CLIP/AE also work since the step reuses
Trainer._train_step_core.
"""

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from eoe_tpu.datasets.bases import BalancedEpochSampler, CombinedDataset
from eoe_tpu.ops.metrics import auroc_jax


class VmappedEvaluator:
    """Evaluates a population of OE-index individuals in vmapped chunks."""

    def __init__(self, trainer, args, chunk: int = 16):
        assert trainer.ds is not None, "vmapped evaluation needs the pinned dataset"
        self.trainer = trainer
        self.args = args
        self.chunk = chunk
        # compiled (train_fn, eval_fn) pairs keyed by the _seed_axis_sharded
        # flag: the flag gates Trainer._constrain_batch at TRACE time, so it
        # must be part of the compiled-function identity — a single jit cache
        # keyed only on avals/shardings would silently reuse a trace made
        # under the other flag value (advisor finding, round 3)
        self._fns = {}
        # per-iteration centers: DSVDD's center depends on the iteration's
        # init weights (the sequential path recomputes per seed,
        # trainer.py train_cls), so one center per `it`, NOT one per
        # evaluator. Keyed by it — init_state(key(it)) is deterministic, so
        # the cache stays valid across generations.
        self._centers = {}

    # ------------------------------------------------------------- build

    def _build(self, oesize: int, n_train: int, steps: int):
        trainer = self.trainer
        ds = trainer.ds
        has_oe = True
        tx = trainer.make_optimizer(steps)
        core = trainer._train_step_core(ds, tx, has_oe)

        def train_one_step(state, Xn, Ln, Xo_cand, i_n, i_o, w_s, key, center, rt_stats):
            lo = jnp.full((i_n.shape[-1],), ds.anomalous_label, jnp.int32)
            xn = jnp.take(Xn, i_n, axis=0)
            ln = jnp.take(Ln, i_n, axis=0)
            xo = jnp.take(Xo_cand, i_o, axis=0)
            state, out = core(state, xn, ln, xo, lo, w_s, key, center, rt_stats)
            return state, out[0]

        from eoe_tpu.training.trainer import scan_ok
        if scan_ok():
            def train_full(state, Xn, Ln, Xo_cand, idx_n, idx_o, w, keys, center, rt_stats):
                """Full training of ONE candidate: scan over all (epoch, step)
                pairs; Xo_cand (oesize, h, w, c) is this candidate's OE pool."""
                def step_body(state, per_step):
                    i_n, i_o, w_s, key = per_step
                    return train_one_step(state, Xn, Ln, Xo_cand, i_n, i_o, w_s,
                                          key, center, rt_stats)

                flat_n = idx_n.reshape(-1, idx_n.shape[-1])
                flat_o = idx_o.reshape(-1, idx_o.shape[-1])
                flat_w = w.reshape(-1, w.shape[-1])
                flat_k = keys.reshape(-1)
                state, losses = jax.lax.scan(step_body, state,
                                             (flat_n, flat_o, flat_w, flat_k))
                return state, losses

            # vmap: candidate axis on (state, Xo_cand); shared everything else
            train_fn = jax.jit(jax.vmap(
                train_full, in_axes=(0, None, None, 0, None, None, None, None, None, None)))
        else:
            # CPU fallback: per-step dispatch of the vmapped core
            # (conv backward in scan bodies is pathological on XLA:CPU —
            # see eoe_tpu.training.trainer.scan_ok)
            step_vmapped = jax.jit(jax.vmap(
                train_one_step,
                in_axes=(0, None, None, 0, None, None, None, None, None, None)))

            def train_loop(states, Xn, Ln, Xo, idx_n, idx_o, w, keys, center, rt_stats):
                flat_n = idx_n.reshape(-1, idx_n.shape[-1])
                flat_o = idx_o.reshape(-1, idx_o.shape[-1])
                flat_w = w.reshape(-1, w.shape[-1])
                flat_k = keys.reshape(-1)
                losses = []
                for s in range(flat_n.shape[0]):
                    states, l = step_vmapped(states, Xn, Ln, Xo, flat_n[s], flat_o[s],
                                             flat_w[s], flat_k[s], center, rt_stats)
                    losses.append(l)
                stacked = (jnp.stack(losses, axis=1) if losses
                           else jnp.zeros((idx_n.shape[0], 0), jnp.float32))
                return states, stacked

            train_fn = train_loop

        def fwd(state, x, labels, center, rt_stats):
            x = trainer._preprocess(ds, x, labels, None, False, "normal", rt_stats)
            x = x.astype(trainer.compute_dtype)
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            feats = trainer.model.apply(variables, x, train=False).astype(jnp.float32)
            return trainer.objective.score(
                feats, center, **trainer._loss_kwargs(x)).reshape(-1)

        return train_fn, jax.jit(jax.vmap(fwd, in_axes=(0, None, None, None, None)))

    # ------------------------------------------------------------- evaluate

    def evaluate_population(self, individuals: Sequence[Sequence[int]]) -> List[float]:
        """Fitness (mean test AUC over the configured seeds) per individual."""
        trainer = self.trainer
        ds = trainer.ds
        assert isinstance(ds, CombinedDataset)
        oeds = ds.oe.train_set
        valid = np.asarray(getattr(oeds, "valid_indices", oeds.indices))
        train_set = ds.train_set
        normal_ds = ds.normal
        oesize = len(individuals[0])
        iterations = self.args.iterations

        n = len(train_set)
        Xn = jnp.asarray(train_set.gather_all())
        Ln = jnp.asarray(normal_ds.binary_targets(train_set))
        test_set = ds.test_set
        test_labels = normal_ds.binary_targets(test_set)
        rt_stats = trainer._rt_stats(ds)

        # SURVEY §2.7(b): the candidate axis is embarrassingly parallel, so on
        # a data mesh full chunks shard candidates across devices (replicated
        # data, no collectives); remainder chunks run replicated. The batch
        # constraint is disabled for the whole vmapped program (the data axis
        # belongs to candidates here — see Trainer._constrain_batch).
        mesh = trainer.mesh
        cand_sh = repl = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from eoe_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
            dv = mesh.shape.get(DATA_AXIS, 1)
            repl = NamedSharding(mesh, PartitionSpec())
            if dv > 1 and mesh.shape.get(MODEL_AXIS, 1) == 1:
                cand_sh = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
            Xn, Ln = jax.device_put(Xn, repl), jax.device_put(Ln, repl)
            if rt_stats is not None:
                rt_stats = jax.device_put(rt_stats, repl)

        # upload the padded test split ONCE for the whole population (the
        # pinned evolve dataset is resident); per-batch gather+upload and a
        # blocking download per batch would pay the fixed tunnel transfer
        # latency K*steps times per generation
        B = trainer.batch_size
        nt = len(test_set)
        steps_t = -(-nt // B)
        Xt = np.asarray(test_set.gather_all())
        lbt = test_labels
        if steps_t * B > nt:
            pad = steps_t * B - nt
            Xt = np.concatenate([Xt, np.repeat(Xt[-1:], pad, axis=0)])
            lbt = np.concatenate([test_labels, np.repeat(test_labels[-1:], pad)])
        Xt_d = jnp.asarray(Xt)
        lbt_d = jnp.asarray(lbt)
        if repl is not None:
            Xt_d, lbt_d = jax.device_put(Xt_d, repl), jax.device_put(lbt_d, repl)

        # per-candidate OE images: (K, oesize, h, w, c)
        def oe_images(ind):
            return oeds.source.gather(valid[np.asarray(list(ind), np.int64) % len(valid)])

        fitness = np.zeros((len(individuals), iterations), np.float64)
        # the _seed_axis_sharded flag gates Trainer._constrain_batch at TRACE
        # time and is set PER CHUNK below: sharded chunks trace without the
        # batch constraint (the data axis carries candidates), replicated
        # remainder chunks trace WITH it, keeping their per-candidate batch
        # data-parallelism. Each flag value gets its OWN jitted functions
        # (self._fns) so equal-aval calls can never reuse a trace made under
        # the other flag value.
        try:
            for it in range(iterations):
                key = jax.random.fold_in(jax.random.fold_in(
                    jax.random.key(trainer.seed), self.args.classes[0]), it)
                sampler = BalancedEpochSampler(
                    n, oesize, trainer.batch_size,
                    int(jax.random.randint(jax.random.fold_in(key, 1), (), 0, 2 ** 31 - 1)))
                # one shared epoch plan for all candidates
                idx_n, idx_o, w = [], [], []
                for _ in range(trainer.epochs):
                    a, b, c = sampler.epoch()
                    idx_n.append(a)
                    idx_o.append(b)
                    w.append(c)
                if trainer.epochs > 0:
                    idx_n = jnp.asarray(np.stack(idx_n))
                    idx_o = jnp.asarray(np.stack(idx_o))
                    wj = jnp.asarray(np.stack(w), jnp.float32)
                else:
                    shape = (0, sampler.steps, trainer.batch_size)
                    idx_n = idx_o = jnp.zeros(shape, jnp.int32)
                    wj = jnp.zeros(shape, jnp.float32)
                n_keys = trainer.epochs * sampler.steps
                keys = jax.random.split(jax.random.fold_in(key, 2), max(n_keys, 1))[:n_keys]

                # init + center once per iteration (chunk-independent): all
                # candidates of an iteration share the init weights, and the
                # DSVDD center is a function of those weights
                base = trainer.init_state(key, ds, max(sampler.steps, 1))
                center = None
                if trainer.objective.needs_center:
                    if it not in self._centers:
                        from eoe_tpu.datasets import str_labels
                        clsstr = str_labels(trainer.dsstr)[self.args.classes[0]]
                        self._centers[it] = trainer.prepare_metric(clsstr, ds, base, it)
                    center = trainer.center = self._centers[it]

                for start in range(0, len(individuals), self.chunk):
                    chunk = individuals[start:start + self.chunk]
                    k = len(chunk)
                    dv = cand_sh.mesh.shape[cand_sh.spec[0]] if cand_sh is not None else 1
                    chunk_sh = cand_sh if (cand_sh is not None and k % dv == 0) else repl
                    # per-chunk trace gate (see the comment above the try);
                    # the flag selects the matching compiled-function pair
                    sharded = chunk_sh is cand_sh and cand_sh is not None
                    trainer._seed_axis_sharded = sharded
                    if sharded not in self._fns:
                        self._fns[sharded] = self._build(oesize, n, sampler.steps)
                    train_fn, eval_fn = self._fns[sharded]
                    Xo = jnp.asarray(np.stack([oe_images(ind) for ind in chunk]))
                    if chunk_sh is not None:
                        Xo = jax.device_put(Xo, chunk_sh)
                    states = jax.tree_util.tree_map(
                        lambda x: jnp.broadcast_to(x, (k, *x.shape)), base)
                    if chunk_sh is not None:
                        states = jax.device_put(states, chunk_sh)
                    if trainer.epochs > 0:
                        states, _ = train_fn(
                            states, Xn, Ln, Xo, idx_n, idx_o, wj,
                            keys, center, rt_stats)
                    # vmapped eval over shared device-resident test batches;
                    # scores concatenate on device -> one download per chunk
                    outs = [eval_fn(states,
                                          jax.lax.slice_in_dim(Xt_d, i, i + B),
                                          jax.lax.slice_in_dim(lbt_d, i, i + B),
                                          center, rt_stats)
                            for i in range(0, steps_t * B, B)]
                    scores = np.asarray(jnp.concatenate(outs, axis=1)
                                        if len(outs) > 1 else outs[0])[:, :nt]
                    keep = test_labels >= 0
                    aucs = jax.vmap(lambda s: auroc_jax(
                        jnp.asarray(test_labels[keep]), jnp.asarray(s[..., keep])))(
                        jnp.asarray(scores))
                    fitness[start:start + k, it] = np.asarray(aucs)
        finally:
            trainer._seed_axis_sharded = False
        return fitness.mean(axis=1).tolist()
