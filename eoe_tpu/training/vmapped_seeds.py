"""Seed-vmapped grid training: all random seeds of one class train as ONE
vmapped program.

SURVEY.md §2.7(b): the reference's embarrassingly-parallel axes are the
class×seed experiment grid (run sequentially, ad_trainer.py:222-305). Here
the seed axis becomes a vmap axis — per-seed init keys, per-seed epoch index
plans, shared device-resident data — so `--iterations 10` costs roughly one
training instead of ten for models that fit K-fold in HBM.

Used by ``Trainer.run(..., vmap_seeds=True)`` for device-resident datasets
without snapshot resume; falls back to the sequential path otherwise.

Best for from-scratch models on many-epoch configs: for 8 CNN32 seeds on one
v5e the train phase measured 3.1x over sequential at 25 epochs (3.7s vs
11.6s) with a ~15x lower marginal per-epoch cost — the sequential path syncs
per epoch for its live loss/AUC log line, the vmapped path only downloads the
last epoch. Fixed per-run costs (stacked CPU-side init shipped as one
batched transfer, one packed plan upload, one packed result download) are
small enough that the vmapped path is never slower; at toy epoch counts the
class grid is dominated by per-seed eval/snapshot/plot costs common to both
paths. NOT useful for CLIP: the pretrained weights make all seed replicas
identical (only the data order differs).
"""

import os
import time as _time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eoe_tpu.datasets.bases import BalancedEpochSampler, CombinedDataset
from eoe_tpu.ops import metrics as M


def train_cls_vmapped_seeds(trainer, ds, cls: int, clsstr: str, n_seeds: int,
                            keys: List[jax.Array]
                            ) -> List[Tuple[object, Optional[M.ROC]]]:
    """Train ``n_seeds`` models for one class simultaneously. Returns per-seed
    (TrainState, train ROC) with semantics matching sequential train_cls:
    per-seed init keys, per-seed samplers, same loss/score math."""
    combined = isinstance(ds, CombinedDataset)
    train_set = ds.train_set
    normal_ds = ds.normal if combined else ds
    oe_set = ds.oe.train_set if combined else None
    has_oe = combined and len(oe_set) > 0
    B = trainer.batch_size

    # EOE_TPU_TIMING=1 prints the host-side phase breakdown that drove the
    # packed-download work (init / upload / dispatch / download costs).
    _tlog = (lambda tag, t0: print(f"    [vmap-seeds] {tag}: {_time.time() - t0:.2f}s",
                                   flush=True)) \
        if os.environ.get("EOE_TPU_TIMING") else (lambda tag, t0: None)
    _t = _time.time()
    # all per-seed key derivations in ONE dispatch each (a per-seed
    # jax.random.randint loop cost ~150ms/seed in tunnel round-trips)
    keys_d = jnp.stack(keys)
    derive_keys = trainer._cached(
        ("vmap_seed_keys", n_seeds, trainer.epochs),
        lambda: jax.jit(lambda ks: (
            jax.vmap(lambda k: jax.random.randint(
                jax.random.fold_in(k, 1), (), 0, 2 ** 31 - 1))(ks),
            jax.vmap(lambda ep: jax.vmap(lambda k: jax.random.fold_in(
                jax.random.fold_in(k, 2), ep))(ks))(
                    jnp.arange(max(trainer.epochs, 1))))))
    sampler_seeds, ekeys_all = derive_keys(keys_d)
    sampler_seeds = np.asarray(sampler_seeds)
    samplers = [BalancedEpochSampler(
        len(train_set), len(oe_set) if has_oe else 0, B, int(s))
        for s in sampler_seeds]
    steps = samplers[0].steps
    tx = trainer.make_optimizer(steps)

    _tlog("samplers+tx", _t); _t = _time.time()
    # per-seed model replicas (different init keys) — CPU init, host stack,
    # one batched upload (the per-seed init/upload loop cost ~250ms/seed)
    states = trainer.init_states_stacked(keys, ds, steps)
    _tlog(f"init_states_stacked x{n_seeds}", _t); _t = _time.time()
    # per-SEED centers: the DSVDD center is a function of each seed's init
    # weights (sequential parity: train_cls recomputes per seed), so the
    # stacked center carries a seed axis and rides the vmap with the states.
    # (CLIP prompt features are init-independent, so its K copies coincide.)
    center = trainer.center = None
    if trainer.objective.needs_center:
        center = trainer.center = jnp.stack([
            trainer.prepare_metric(
                clsstr, ds, jax.tree_util.tree_map(lambda x: x[s], states), s)
            for s in range(n_seeds)])
    rt_stats = trainer._rt_stats(ds)
    _tlog("prepare_metric", _t); _t = _time.time()

    Xn = jnp.asarray(train_set.gather_all())
    Ln = jnp.asarray(normal_ds.binary_targets(train_set))
    Xo = jnp.asarray(oe_set.gather_all()) if has_oe else None
    Lo = jnp.asarray(ds.oe.binary_targets(oe_set)) if has_oe else None
    _tlog("data upload", _t); _t = _time.time()

    # SURVEY §2.7(b): the seed grid is an embarrassingly parallel axis, so on
    # a data mesh the stacked SEED axis shards across chips (each device
    # trains its share of the seeds on the replicated resident data; no
    # collectives — per-seed BN/grads never cross seeds). Tensor-parallel
    # meshes keep the single-shard behavior (params are already sharded on
    # 'model'); so do seed counts that don't divide the data axis.
    shard_seeds = False
    mesh = trainer.mesh
    # multi-process meshes (pods): the same SPMD program works — host-side
    # values (init states, plans, keys) are identical on every process, so
    # device_put to global shardings is well-defined — but eager indexing of
    # packed global uploads is not; those stay per-epoch host slices below.
    multiproc = jax.process_count() > 1
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        from eoe_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS, put_global,
                                           put_global_tree)
        dv = mesh.shape.get(DATA_AXIS, 1)
        shard_seeds = (dv > 1 and n_seeds % dv == 0
                       and mesh.shape.get(MODEL_AXIS, 1) == 1)
        repl = NamedSharding(mesh, PartitionSpec())
        # sharded grid: seeds split over the data axis; otherwise everything
        # replicates on the mesh and each per-seed BATCH data-parallelizes
        # through the step's sharding constraint instead. put_global handles
        # multi-process meshes (device_put can't target non-addressable
        # shardings; every process holds the same host values).
        seed_sh = (NamedSharding(mesh, PartitionSpec(DATA_AXIS))
                   if shard_seeds else repl)
        states = put_global_tree(states, seed_sh)
        Xn, Ln = put_global(Xn, repl), put_global(Ln, repl)
        if has_oe:
            Xo, Lo = put_global(Xo, repl), put_global(Lo, repl)
        if center is not None:
            center = put_global(center, seed_sh)  # leading seed axis
        if rt_stats is not None:
            rt_stats = put_global_tree(rt_stats, repl)
        ekey_sh = NamedSharding(
            mesh, PartitionSpec(DATA_AXIS if shard_seeds else None))
        if not multiproc:
            # one placement for the whole run; multi-process keeps the LOCAL
            # key array (global arrays can't be indexed eagerly) and places
            # each epoch's slice at loop time instead
            ekeys_all = jax.device_put(ekeys_all, NamedSharding(
                mesh, PartitionSpec(None, DATA_AXIS if shard_seeds else None)))
        _tlog(f"mesh placement (seed axis {'sharded' if shard_seeds else 'replicated'} "
              f"over {dv} devices)", _t); _t = _time.time()
    trainer._last_vmap_sharded = shard_seeds  # introspection for tests/logs

    def build_epoch_vmapped():
        from eoe_tpu.training.trainer import scan_ok
        core = trainer._train_step_core(ds, tx, has_oe)

        def train_step(state, Xn, Ln, Xo, Lo, i_n, i_o, w_s, key, center, rt_stats):
            xn = jnp.take(Xn, i_n, axis=0)
            ln = jnp.take(Ln, i_n, axis=0)
            xo = jnp.take(Xo, i_o, axis=0) if has_oe else None
            lo = jnp.take(Lo, i_o, axis=0) if has_oe else None
            return core(state, xn, ln, xo, lo, w_s, key, center, rt_stats)

        if scan_ok():
            def train_epoch(state, Xn, Ln, Xo, Lo, idx_n, idx_o, w, key, center, rt_stats):
                def body(state, per_step):
                    i_n, i_o, w_s = per_step
                    return train_step(state, Xn, Ln, Xo, Lo, i_n, i_o, w_s, key,
                                      center, rt_stats)

                dummy = jnp.zeros((idx_n.shape[0], 1), jnp.int32)
                state, outs = jax.lax.scan(body, state,
                                           (idx_n, idx_o if has_oe else dummy, w))
                return state, outs

            # seeds on axis 0 of (state, plans, keys, center); data is shared
            return jax.jit(jax.vmap(
                train_epoch,
                in_axes=(0, None, None, None, None, 0, 0, 0, 0, 0, None)))

        # CPU fallback: per-step dispatch of the vmapped core (see scan_ok)
        step_vmapped = jax.jit(jax.vmap(
            train_step, in_axes=(0, None, None, None, None, 0, 0, 0, 0, 0, None)))

        def epoch_loop(states, Xn, Ln, Xo, Lo, idx_n, idx_o, w, keys, center, rt_stats):
            outs = []
            for s in range(idx_n.shape[1]):
                states, out = step_vmapped(states, Xn, Ln, Xo, Lo, idx_n[:, s],
                                           idx_o[:, s], w[:, s], keys, center, rt_stats)
                outs.append(out)
            # stack on a step axis to match the scan output layout
            last = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=1), *outs)
            return states, last

        return epoch_loop

    # the flag gates _constrain_batch at TRACE time; every trace below
    # (epoch-fn build, per-epoch dispatch) runs under the try so any failure
    # (plan-pack assert, OOM) cannot leak the disabled constraint to later
    # sequential runs on the same trainer
    trainer._seed_axis_sharded = shard_seeds
    last = None
    try:
        epoch_vmapped = trainer._cached(
            ("vmap_seeds", type(ds).__name__, has_oe, tuple(Xn.shape[1:]), B,
             steps, n_seeds, shard_seeds), build_epoch_vmapped)

        # pre-sample every epoch's per-seed index plans and pack them into as
        # few uploads as possible (fixed per-transfer latency on tunneled
        # chips; the weight mask is {0,1} -> int-exact). One upload for the
        # whole run when it fits in 64MB, one per epoch otherwise; the upload
        # carries the seed-axis sharding directly so the in-loop slicing
        # never reshards.
        def pack_epoch():
            plans = [s.epoch() for s in samplers]
            assert all(np.array_equal(p[2], p[2].astype(np.int32)) for p in plans), \
                "non-integer sampler weights cannot ride the packed int32 plan"
            return np.stack([
                np.stack([p[0] for p in plans]).astype(np.int32),
                (np.stack([p[1] for p in plans]).astype(np.int32) if has_oe
                 else np.zeros((n_seeds, steps, B), np.int32)),
                np.stack([p[2] for p in plans]).astype(np.int32)])

        def put_plan(arr, lead_axes):
            if mesh is None:
                return jnp.asarray(arr)
            spec = PartitionSpec(*([None] * lead_axes),
                                 DATA_AXIS if shard_seeds else None)
            return put_global(arr, NamedSharding(mesh, spec))

        _tlog("build/jit epoch fn", _t); _t = _time.time()
        per_epoch = [pack_epoch() for _ in range(trainer.epochs)]
        all_plans = np.stack(per_epoch) if per_epoch else None
        # multi-process: the packed whole-run upload would be a GLOBAL array,
        # and plans_d[ep] / ekeys_all[ep] can't be sliced eagerly — upload
        # per epoch instead (pods don't pay the tunneled-chip latency the
        # packing exists for)
        plans_d = (put_plan(all_plans, 2)
                   if all_plans is not None and not multiproc
                   and all_plans.nbytes <= 64 * 2 ** 20
                   else None)
        _tlog("plan sampling + upload", _t); _t = _time.time()

        for ep in range(trainer.epochs):
            plan = (plans_d[ep] if plans_d is not None
                    else put_plan(per_epoch[ep], 1))
            idx_n = plan[0]
            idx_o = plan[1] if has_oe else plan[1][:, :, :1]
            w = plan[2].astype(jnp.float32)
            ek = (put_global(ekeys_all[ep], ekey_sh)
                  if (mesh is not None and multiproc) else ekeys_all[ep])
            states, last = epoch_vmapped(states, Xn, Ln, Xo, Lo, idx_n, idx_o, w,
                                         ek, center, rt_stats)
        jax.block_until_ready(states)
    finally:
        trainer._seed_axis_sharded = False
    _tlog(f"epoch dispatches x{trainer.epochs}", _t); _t = _time.time()

    # ONE packed download for every seed's last-epoch outputs (per-seed
    # np.asarray paid the fixed per-transfer latency 3*n_seeds times);
    # trainer._fetch all-gathers non-addressable (multi-process) outputs
    last_h = (tuple(trainer._fetch(x) for x in (last[1], last[2], last[3]))
              if last is not None else None)
    rocs = []
    for s in range(n_seeds):
        roc = None
        if last is not None:
            scores = np.asarray(last_h[0][s]).reshape(-1)
            labels = np.asarray(last_h[1][s]).reshape(-1)
            weights = np.asarray(last_h[2][s]).reshape(-1)
            keep = weights > 0
            if np.isnan(scores[keep]).any():
                from eoe_tpu.training.trainer import NanGradientsError
                raise NanGradientsError()
            if (labels[keep] == 1).sum() > 0:
                roc = M.roc_curve(labels[keep], scores[keep])
        rocs.append(roc)
    _tlog("results download + rocs", _t)
    # states stay STACKED on device: eval vmaps over the seed axis
    # (eval_scores_vmapped) and the snapshot fetch is one packed device_get
    # of the whole grid — per-seed slicing/downloads cost 3*n_seeds fixed
    # transfer latencies on tunneled chips (PARITY.md:156-158)
    return states, rocs


def eval_scores_vmapped(trainer, ds, states, n_seeds: int) -> np.ndarray:
    """Anomaly scores of ALL seeds' test splits as ONE vmapped dispatch set:
    (n_seeds, n_test) in one device-side concat + one download. Eval is
    scoring-only (no BN mutation), so it vmaps trivially over the stacked
    seed states; batches are shared across seeds (same test split)."""
    combined = isinstance(ds, CombinedDataset)
    normal_ds = ds.normal if combined else ds
    test_set = ds.test_set
    labels = normal_ds.binary_targets(test_set)
    n = len(test_set)
    B = trainer.batch_size
    steps = -(-n // B)
    total = steps * B
    shard_seeds = getattr(trainer, "_last_vmap_sharded", False)
    # the flag gates _constrain_batch at TRACE time; the cache key carries it
    # so equal-aval calls never reuse a trace made under the other value
    trainer._seed_axis_sharded = shard_seeds
    try:
        eval_fn = trainer._cached(
            ("vmap_seeds_eval", type(ds).__name__, tuple(ds.raw_shape), B,
             n_seeds, shard_seeds),
            lambda: jax.jit(jax.vmap(trainer._eval_step_core(ds),
                                     in_axes=(0, None, None, 0, None))))
        rt_stats = trainer._rt_stats(ds)
        center = trainer.center
        from eoe_tpu.training.trainer import _is_resident
        if _is_resident(test_set):
            # shared device-resident test images (same caching contract as the
            # sequential eval_cls, so mixed vmapped/sequential runs reuse it)
            cached = getattr(test_set, "_eval_device_cache", None)
            if cached is None or cached[0] != total:
                X = np.asarray(test_set.gather_all())
                if total > n:
                    X = np.concatenate([X, np.repeat(X[-1:], total - n, axis=0)])
                test_set._eval_device_cache = (total, jnp.asarray(X))
                cached = test_set._eval_device_cache
            X_d = cached[1]
            lb = labels if total == n else np.concatenate(
                [labels, np.repeat(labels[-1:], total - n)])
            lb_d = jnp.asarray(lb)
            if trainer.mesh is not None and jax.process_count() == 1:
                # multi-process keeps LOCAL test arrays: global replicated
                # arrays can't be sliced eagerly (same pattern as eval_cls)
                from jax.sharding import NamedSharding, PartitionSpec
                repl = NamedSharding(trainer.mesh, PartitionSpec())
                X_d, lb_d = jax.device_put(X_d, repl), jax.device_put(lb_d, repl)
            outs = [eval_fn(states, jax.lax.slice_in_dim(X_d, i, i + B),
                            jax.lax.slice_in_dim(lb_d, i, i + B), center, rt_stats)
                    for i in range(0, total, B)]
        else:
            outs = []
            for i in range(0, n, B):
                pos = np.arange(i, min(i + B, n))
                x = np.asarray(test_set.gather(pos))
                lb = labels[pos]
                if len(pos) < B:
                    pad = B - len(pos)
                    x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
                    lb = np.concatenate([lb, np.repeat(lb[-1:], pad)])
                outs.append(eval_fn(states, jnp.asarray(x), jnp.asarray(lb),
                                    center, rt_stats))
        if (len(outs) > 1 and isinstance(outs[0], jax.Array)
                and not outs[0].is_fully_addressable):
            # multi-process: device-side concat of global arrays is an eager
            # op on non-addressable shards; gather per batch instead
            scores = np.concatenate([trainer._fetch(o) for o in outs], axis=1)
        else:
            scores = np.asarray(jnp.concatenate(outs, axis=1)
                                if len(outs) > 1 else trainer._fetch(outs[0]))
    finally:
        trainer._seed_axis_sharded = False
    return scores[:, :n]
