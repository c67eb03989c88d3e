"""Seed-vmapped grid training: all random seeds of one class train as ONE
vmapped program.

SURVEY.md §2.7(b): the reference's embarrassingly-parallel axes are the
class×seed experiment grid (run sequentially, ad_trainer.py:222-305). Here
the seed axis becomes a vmap axis — per-seed init keys, per-seed epoch index
plans, shared device-resident data — so `--iterations 10` costs roughly one
training instead of ten for models that fit K-fold in HBM.

Used by ``Trainer.run(..., vmap_seeds=True)`` for device-resident datasets
without snapshot resume; falls back to the sequential path otherwise.

Best for from-scratch models (measured 1.52x for 8 CNN32 seeds on one v5e).
NOT useful for CLIP: the pretrained weights make all seed replicas identical
(only the data order differs), and per-seed model init dominates short runs.
"""

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

    samplers = [BalancedEpochSampler(
        len(train_set), len(oe_set) if has_oe else 0, B,
        int(jax.random.randint(jax.random.fold_in(k, 1), (), 0, 2 ** 31 - 1)))
        for k in keys]
    steps = samplers[0].steps
    tx = trainer.make_optimizer(steps)

    # per-seed model replicas (different init keys)
    states = [trainer.init_state(k, ds, steps) for k in keys]
    states = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    center = trainer.center = trainer.prepare_metric(
        clsstr, ds, jax.tree_util.tree_map(lambda x: x[0], states), 0)
    rt_stats = trainer._rt_stats(ds)

    Xn = jnp.asarray(train_set.gather_all())
    Ln = jnp.asarray(normal_ds.binary_targets(train_set))
    Xo = jnp.asarray(oe_set.gather_all()) if has_oe else None
    Lo = jnp.asarray(ds.oe.binary_targets(oe_set)) if has_oe else None

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

            # seeds on axis 0 of (state, plans, keys); the data arrays are shared
            return jax.jit(jax.vmap(
                train_epoch,
                in_axes=(0, None, None, None, None, 0, 0, 0, 0, None, None)))

        # CPU fallback: per-step dispatch of the vmapped core (see scan_ok)
        step_vmapped = jax.jit(jax.vmap(
            train_step, in_axes=(0, None, None, None, None, 0, 0, 0, 0, None, None)))

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

    epoch_vmapped = trainer._cached(
        ("vmap_seeds", type(ds).__name__, has_oe, tuple(Xn.shape[1:]), B, steps,
         n_seeds), build_epoch_vmapped)

    # pre-sample every epoch's per-seed index plans and pack them into as few
    # uploads as possible (fixed per-transfer latency on tunneled chips; the
    # weight mask is {0,1} -> int-exact). One upload for the whole run when it
    # fits in 64MB, one per epoch otherwise.
    def pack_epoch():
        plans = [s.epoch() for s in samplers]
        assert all(np.array_equal(p[2], p[2].astype(np.int32)) for p in plans), \
            "non-integer sampler weights cannot ride the packed int32 plan"
        return np.stack([
            np.stack([p[0] for p in plans]).astype(np.int32),
            (np.stack([p[1] for p in plans]).astype(np.int32) if has_oe
             else np.zeros((n_seeds, steps, B), np.int32)),
            np.stack([p[2] for p in plans]).astype(np.int32)])

    per_epoch = [pack_epoch() for _ in range(trainer.epochs)]
    all_plans = np.stack(per_epoch) if per_epoch else None
    plans_d = (jnp.asarray(all_plans)
               if all_plans is not None and all_plans.nbytes <= 64 * 2 ** 20 else None)

    last = None
    for ep in range(trainer.epochs):
        plan = plans_d[ep] if plans_d is not None else jnp.asarray(per_epoch[ep])
        idx_n = plan[0]
        idx_o = plan[1] if has_oe else plan[1][:, :, :1]
        w = plan[2].astype(jnp.float32)
        ekeys = jnp.stack([jax.random.fold_in(jax.random.fold_in(k, 2), ep)
                           for k in keys])
        states, last = epoch_vmapped(states, Xn, Ln, Xo, Lo, idx_n, idx_o, w,
                                     ekeys, center, rt_stats)

    results = []
    for s in range(n_seeds):
        state = jax.tree_util.tree_map(lambda x: x[s], states)
        roc = None
        if last is not None:
            scores = np.asarray(last[1][s]).reshape(-1)
            labels = np.asarray(last[2][s]).reshape(-1)
            weights = np.asarray(last[3][s]).reshape(-1)
            keep = weights > 0
            if np.isnan(scores[keep]).any():
                from eoe_tpu.training.trainer import NanGradientsError
                raise NanGradientsError()
            if (labels[keep] == 1).sum() > 0:
                roc = M.roc_curve(labels[keep], scores[keep])
        results.append((state, roc))
    return results
