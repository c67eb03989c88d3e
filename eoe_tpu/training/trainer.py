"""Training engine: jitted train/eval steps + the class×seed experiment grid.

TPU-native redesign of the reference's ADTrainer (behavioral parity target:
/root/reference/src/eoe/training/ad_trainer.py). What the reference does with
a stateful torch loop — DataLoader workers, `.to(device)` per batch, per-label
boolean indexing for GPU transforms (:406-444) — is here one pure jitted
``(state, batch, key) -> (state, metrics)`` function:

  * preprocessing (augmentation + label-conditional MSM filters + normalize)
    runs INSIDE the step, fused by XLA with the model forward,
  * the normal and OE halves are preprocessed as fixed-shape halves and
    concatenated (no dynamic boolean indexing),
  * for device-resident datasets (CIFAR/MNIST/MVTec blobs), the whole train
    split lives in HBM and one ``lax.scan`` runs a full epoch without host
    round-trips; otherwise a host loop feeds raw uint8 halves,
  * multi-chip: batches carry a `data`-axis sharding constraint; with
    replicated params XLA derives the gradient all-reduce over ICI,
  * the class×seed grid, NaN-retry (5 attempts, parity ad_trainer.py:257-280),
    snapshotting, resume, and the results.json contract mirror `ADTrainer.run`
    (:177-354).
"""

import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization
from flax import struct

from eoe_tpu.datasets import MSM, load_dataset, no_classes, str_labels
from eoe_tpu.datasets.bases import INF, ADDataset, BalancedEpochSampler, CombinedDataset, Subset
from eoe_tpu.ops import metrics as M
from eoe_tpu.ops.losses import OBJECTIVES, Objective, dsvdd_center
from eoe_tpu.parallel import mesh as meshlib
from eoe_tpu.training.optim import make_optimizer
from eoe_tpu.utils.logger import Logger

AD_MODES = ("one_vs_rest", "leave_one_out", "fifty_fifty")


def scan_ok() -> bool:
    """Whether multi-step ``lax.scan`` training programs are worthwhile on
    this backend. The device-resident whole-epoch/chunked scan is a TPU
    optimization: XLA:CPU executes convolution BACKWARD ops inside while-loop
    bodies ~40x slower than as top-level ops (measured: CNN32 grad step 39x,
    pure conv-grad 38x; fwd convs and matmuls in scan are fine), so the CPU
    backend (tests, virtual meshes) takes per-step paths instead.
    EOE_TPU_CPU_SCAN=1 forces the scan path for coverage tests."""
    return (jax.default_backend() != "cpu"
            or os.environ.get("EOE_TPU_CPU_SCAN") == "1")


class NanGradientsError(RuntimeError):
    """Anomaly scores turned NaN during an epoch (ad_trainer.py:23,447-449)."""


class Result:
    """Per-class lists of per-seed metrics + class means (ad_trainer.py:40-91)."""

    def __init__(self, n_classes: int):
        self.values: List[list] = [[] for _ in range(n_classes)]
        self.mean_values: List[Any] = [None] * n_classes

    def __getitem__(self, cls: int) -> list:
        return self.values[cls]

    def set_mean(self, cls: int, value):
        self.mean_values[cls] = value

    def mean(self, cls: int, on_none_return_latest=False):
        mean = self.mean_values[cls]
        latest = self.values[cls][-1] if len(self.values[cls]) > 0 else None
        return mean if mean is not None else (latest if on_none_return_latest else None)

    def means(self, on_none_return_latest=False) -> list:
        return [self.mean(c, on_none_return_latest) for c in range(len(self.mean_values))]

    def __iter__(self):
        return iter(self.values)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    def replace_params(self, params, opt_state, batch_stats):
        return self.replace(params=params, opt_state=opt_state, batch_stats=batch_stats,
                            step=self.step + 1)


def _is_resident(subset: Subset) -> bool:
    return subset is not None and (subset.source.resident
                                   or subset.source.fits_resident(len(subset)))


class Trainer:
    """The experiment-grid trainer for all feature-space objectives
    (hsc/bce/focal/dsvdd/dsad/ae). CLIP overrides the metric-preparation and
    model handling in :class:`eoe_tpu.training.clip.ClipTrainer`.

    Mirrors ADTrainer's constructor surface (ad_trainer.py:93-144) with JAX
    idioms: ``model`` is a Flax module (re-initialized per class-seed instead
    of deep-copied + weight_reset), ``devices`` becomes a mesh config.
    """

    # whether to return trained states from run() (ad_trainer.py:95-97)
    KEEP_SNAPSHOT_IN_RAM = False

    def __init__(self, model, train_specs: Sequence, test_specs: Sequence,
                 dataset: str, oe_dataset: Optional[str], datapath: str, logger: Logger,
                 epochs: int, lr: float, wdk: float, milestones: Sequence[int], batch_size: int,
                 objective: str = "hsc", ad_mode: str = "one_vs_rest",
                 oe_limit_samples: Union[int, float, Sequence[int]] = INF,
                 oe_limit_classes: Union[int, float] = INF,
                 msms: Sequence[MSM] = (), workers: int = 0, seed: int = 0,
                 mesh: Optional[Any] = None, nominal_label: int = 0,
                 compute_dtype=jnp.float32):
        assert ad_mode in AD_MODES, f"AD mode {ad_mode} unknown. Known modes are {AD_MODES}."
        if (compute_dtype != jnp.float32 and model is not None
                and getattr(model, "dtype", False) is None):
            # mixed precision: the conv models carry a flax compute-dtype attr
            # (params stay f32); a model left at dtype=None would silently
            # promote every matmul/conv back to f32 against its f32 params,
            # halving MXU throughput — wire --compute-dtype through
            model = model.clone(dtype=compute_dtype)
        self.model = model
        self.objective: Objective = OBJECTIVES[objective] if isinstance(objective, str) else objective
        self.train_specs = list(train_specs or ())
        self.test_specs = list(test_specs or ())
        self.dsstr = dataset
        self.oe_dsstr = oe_dataset
        self.datapath = datapath
        self.logger = logger if logger is not None else Logger("/tmp/eoe_tpu_logs", active=False)
        self.epochs = epochs
        self.lr = lr
        self.wdk = wdk
        self.milestones = list(milestones or ())
        self.batch_size = batch_size
        self.ad_mode = ad_mode
        self.oe_limit_samples = oe_limit_samples
        self.oe_limit_classes = oe_limit_classes
        self.msms = list(msms or ())
        self.workers = workers
        self.seed = seed
        self.mesh = mesh
        self.nominal_label = nominal_label
        self.compute_dtype = compute_dtype
        self.center = None
        self.ds = None  # pin a pre-loaded dataset (evolution runs, main/__init__.py:350-360)
        self._jit_cache: Dict[Any, Callable] = {}
        # throughput accounting (the reference has no such metric; SURVEY.md §5.1)
        self.images_seen = 0
        self.train_seconds = 0.0
        self.epoch_rates: List[float] = []  # img/s per epoch (compute-only window)

        self.logger.logsetup(self.setup_dict(), step=0)

    # ------------------------------------------------------------- config

    def setup_dict(self) -> dict:
        return {
            "model": type(self.model).__name__, "objective": self.objective.name,
            "train_specs": self.train_specs, "test_specs": self.test_specs,
            "dataset": self.dsstr, "oe_dataset": self.oe_dsstr, "datapath": self.datapath,
            "epochs": self.epochs, "lr": self.lr, "wdk": self.wdk, "milestones": self.milestones,
            "batch_size": self.batch_size, "ad_mode": self.ad_mode,
            "oe_limit_samples": (self.oe_limit_samples if not isinstance(self.oe_limit_samples, (list, np.ndarray))
                                 else list(map(int, self.oe_limit_samples))),
            "oe_limit_classes": self.oe_limit_classes,
            "msms": [str(m) for m in self.msms], "seed": self.seed,
            "nominal_label": self.nominal_label,
            "compute_dtype": np.dtype(self.compute_dtype).name,
        }

    def get_nominal_classes(self, cur_class: int) -> List[int]:
        """Normal-class set per AD mode (ad_trainer.py:166-175)."""
        if self.ad_mode == "one_vs_rest":
            return [cur_class]
        elif self.ad_mode == "leave_one_out":
            return [c for c in range(no_classes(self.dsstr)) if c != cur_class]
        elif self.ad_mode == "fifty_fifty":
            n = no_classes(self.dsstr)
            return [c % n for c in range(cur_class, n // 2 + cur_class)]
        raise NotImplementedError(f"AD mode {self.ad_mode} unknown.")

    # ------------------------------------------------------------- model state

    def init_state(self, key: jax.Array, ds, steps_per_epoch: int) -> TrainState:
        import contextlib

        # init on the PIPELINE OUTPUT shape (crops/resizes change it from the
        # raw shape); the test pipeline is deterministic and defines eval shape.
        # Initialization runs on CPU: compiling the full forward on the TPU
        # just to draw initial weights costs minutes for ViT-sized models.
        cpu = next(iter(jax.local_devices(backend="cpu")), None)
        ctx = (jax.default_device(cpu) if cpu is not None
               and jax.default_backend() != "cpu" else contextlib.nullcontext())
        with ctx:
            sample = jnp.zeros((1, *ds.raw_shape), jnp.float32)
            pipe = (ds.normal if isinstance(ds, CombinedDataset) else ds).test_pipeline
            if pipe is not None:
                sample = pipe(sample, jax.random.key(0), self._rt_stats(ds))
            # jit the init: eager op-by-op init measured ~0.9s per CNN32 seed
            # (pure dispatch overhead) — multi-seed grids pay it per seed.
            # Compiled for the CPU device via the active default_device ctx.
            init_fn = self._cached(
                ("model_init", tuple(sample.shape), str(sample.dtype)),
                lambda: jax.jit(lambda k, s: self.model.init(k, s, train=False)))
            variables = init_fn(key, sample)
        device = jax.local_devices()[0]
        params = variables.get("params", {})
        params = (self.place_params(params) if self.mesh is not None
                  else jax.device_put(params, device))
        batch_stats = variables.get("batch_stats", {})
        if batch_stats:
            batch_stats = (jax.device_put(batch_stats, meshlib.replicated(self.mesh))
                           if self.mesh is not None
                           else jax.device_put(batch_stats, device))
        tx = self.make_optimizer(steps_per_epoch)
        trainable, _ = self._split_trainable(params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=tx.init(trainable), step=jnp.zeros((), jnp.int32))

    def init_states_stacked(self, keys: Sequence[jax.Array], ds,
                            steps_per_epoch: int) -> TrainState:
        """All seeds' initial states with ~one device transfer: per-seed init
        runs on CPU (cached jit), the trees are stacked on the host, shipped
        as ONE batched device_put, and the optimizer state comes from a single
        vmapped tx.init dispatch. The per-seed init_state loop measured ~250ms
        PER SEED warm on tunneled chips (device_put + tx.init round-trips)."""
        import contextlib
        cpu = next(iter(jax.local_devices(backend="cpu")), None)
        ctx = (jax.default_device(cpu) if cpu is not None
               and jax.default_backend() != "cpu" else contextlib.nullcontext())
        with ctx:
            sample = jnp.zeros((1, *ds.raw_shape), jnp.float32)
            pipe = (ds.normal if isinstance(ds, CombinedDataset) else ds).test_pipeline
            if pipe is not None:
                sample = pipe(sample, jax.random.key(0), self._rt_stats(ds))
            init_fn = self._cached(
                ("model_init", tuple(sample.shape), str(sample.dtype)),
                lambda: jax.jit(lambda k, s: self.model.init(k, s, train=False)))
            variables = [init_fn(k, sample) for k in keys]
            stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *variables)
        # local_devices: under multi-process meshes jax.devices()[0] can be
        # ANOTHER process's device, and a cross-process single-device commit
        # poisons every downstream placement
        device = jax.local_devices()[0]
        stacked = jax.device_put(stacked, device)
        params = stacked.get("params", {})
        batch_stats = stacked.get("batch_stats", {})
        tx = self.make_optimizer(steps_per_epoch)
        trainable, _ = self._split_trainable(params)
        opt_state = self._cached(
            ("vmap_tx_init", steps_per_epoch, len(keys)),
            lambda: jax.jit(jax.vmap(tx.init)))(trainable)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state,
                          step=jnp.zeros((len(keys),), jnp.int32))

    def trainable_param_keys(self, params) -> Optional[frozenset]:
        """Top-level param-tree keys the training loss reaches; None = all.
        CLIP trains only the image tower: the text tower gets no gradients, and
        torch leaves None-grad params untouched (the reference's SGD never
        updates or decays the text encoder, ad_trainer.py:380-384) — excluding
        it here reproduces that AND removes ~63M params of zero-grad buffers,
        optimizer state, and per-step update traffic."""
        from eoe_tpu.models.clip.model import CLIP as ClipModel
        if isinstance(self.model, ClipModel) and "visual" in params:
            return frozenset(["visual"])
        return None

    def _split_trainable(self, params):
        """(trainable, frozen) top-level split of the param tree."""
        keys = self.trainable_param_keys(params)
        if keys is None:
            return params, {}
        return ({k: v for k, v in params.items() if k in keys},
                {k: v for k, v in params.items() if k not in keys})

    def place_params(self, params):
        """Place parameters on the mesh: TP sharding rules (Megatron-style
        column/row split of qkv/mlp) where a model axis > 1 applies them,
        replicated otherwise; the optimizer state inherits the placement via
        tx.init."""
        if self.mesh is not None:
            return jax.device_put(params, meshlib.param_shardings(self.mesh, params))
        return params

    def make_optimizer(self, steps_per_epoch: int) -> optax.GradientTransformation:
        """Adam for all models, SGD+nesterov for CLIP — the reference switches
        on the model type (ad_trainer.py:380-384); ClipTrainer also overrides.
        A frozen CustomNet feature model gets zero updates (the functional
        equivalent of the reference's requires_grad_(False), custom_base.py:35-40)."""
        from eoe_tpu.models.clip.model import CLIP as ClipModel
        from eoe_tpu.models.custom_base import CustomNet

        kind = "sgd" if isinstance(self.model, ClipModel) else "adam"
        tx = make_optimizer(kind, self.lr, self.wdk, self.milestones, steps_per_epoch)
        if isinstance(self.model, CustomNet) and self.model.freeze:
            from eoe_tpu.models.custom_base import frozen_param_labels
            tx = optax.multi_transform(
                {"trainable": tx, "frozen": optax.set_to_zero()},
                lambda params: frozen_param_labels(params, True))
        return tx

    # ------------------------------------------------------------- jitted steps

    def _fetch(self, x):
        """Device -> host for step/eval OUTPUTS. Under a multi-process mesh
        the jitted programs return GLOBAL arrays whose shards live on other
        processes' devices; np.asarray raises on those, so gather this
        process's full view first (SURVEY.md §2.7 trainer-level multi-host:
        every process runs the same SPMD program and sees identical epoch
        metrics). Single-process arrays take the plain download path."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    def _put_batch(self, x):
        """Host -> device for batch-shaped INPUTS. Multi-process meshes build
        the global batch from process-local shards (each process uploads only
        its own rows — mesh.shard_batch); otherwise a plain local upload that
        the jitted step's sharding constraint distributes."""
        if self.mesh is not None and jax.process_count() > 1 \
                and not getattr(self, "_seed_axis_sharded", False):
            return meshlib.shard_batch(self.mesh, x)
        return jnp.asarray(x)

    def _constrain_batch(self, x):
        # under a seed-sharded vmapped grid the mesh's data axis is occupied
        # by the SEED axis; constraining the per-seed batch onto it too would
        # double-book the axis (each seed's batch stays whole on its shard)
        if self.mesh is not None and not getattr(self, "_seed_axis_sharded", False):
            return jax.lax.with_sharding_constraint(
                x, meshlib.batch_sharding(self.mesh, x.ndim))
        return x

    def _preprocess(self, ds, x, labels, key, train: bool, part: str, rt_stats=None):
        """One half-batch through (conditional ->) pipeline. ``part`` selects the
        normal vs OE dataset of a CombinedDataset (train only). ``rt_stats`` are
        traced (mean, std) arrays: per-class statistics enter as step INPUTS so
        one compiled step serves every class/seed (no recompilation).

        (A bf16-input fast path was measured on v5e and showed no gain over
        letting XLA fuse the f32 chain — the pipelines therefore stay f32 and
        the step casts to the compute dtype at the model boundary.)"""
        if isinstance(ds, CombinedDataset):
            sub = ds.oe if part == "oe" else ds.normal
        else:
            sub = ds
        pipe = sub.train_pipeline if train else sub.test_pipeline
        cond = sub.train_conditional_pipeline if train else sub.test_conditional_pipeline
        k1, k2 = (jax.random.split(key) if key is not None else (None, None))
        x = cond(x, labels, k1, rt_stats)
        return pipe(x, k2, rt_stats)

    def _transformed_preview(self, ds, percls: int, train: bool) -> np.ndarray:
        """Pipeline-output preview grid: what the model actually SEES — raw
        images through the same (conditional ->) pipelines the jitted step
        applies, normal/OE parts through their own pipelines (reference
        bases.py:246-291 previews loader output after all transforms).
        Rows are min-max normalized for display (outputs are mean/std
        normalized floats)."""
        combined = isinstance(ds, CombinedDataset)
        normal_ds = ds.normal if combined else ds
        rt = self._rt_stats(ds)
        rows = []
        if train:
            parts = [("normal", ds.train_set, self.nominal_label)]
            if combined and len(ds.oe.train_set) > 0:
                parts.append(("oe", ds.oe.train_set, ds.anomalous_label))
            # group order matches n_normal_anomalous()'s sorted binary keys
            parts.sort(key=lambda p: p[2])
            for ki, (part, subset, label) in enumerate(parts):
                pos = np.arange(min(percls, len(subset)))
                x = np.asarray(subset.gather(pos)).astype(np.float32) / 255.0
                lbl = jnp.full((len(pos),), label, jnp.int32)
                rows.append(self._preprocess(ds, jnp.asarray(x), lbl,
                                             jax.random.key(ki), True, part, rt))
        else:
            subset = ds.test_set
            binary = normal_ds.binary_targets(subset)
            for c in sorted(set(binary.tolist())):
                pos = np.argwhere(binary == c).flatten()[:percls]
                x = np.asarray(subset.gather(pos)).astype(np.float32) / 255.0
                lbl = jnp.full((len(pos),), c, jnp.int32)
                rows.append(self._preprocess(ds, jnp.asarray(x), lbl,
                                             None, False, "normal", rt))
        n = min(r.shape[0] for r in rows)
        out = np.concatenate([np.asarray(r[:n], np.float32) for r in rows])
        lo = out.min(axis=(1, 2, 3), keepdims=True)
        hi = out.max(axis=(1, 2, 3), keepdims=True)
        return (out - lo) / np.maximum(hi - lo, 1e-9)

    def _rt_stats(self, ds) -> Optional[Tuple[jax.Array, jax.Array]]:
        stats = (ds.normal if isinstance(ds, CombinedDataset) else ds).stats
        if stats is None:
            return None
        return (jnp.asarray(stats.mean, jnp.float32), jnp.asarray(stats.std, jnp.float32))

    def _loss_kwargs(self, inputs):
        kw = {"nominal_label": self.nominal_label}
        if self.objective.uses_inputs:
            kw["inputs"] = inputs
        return kw

    def make_train_step(self, ds, tx, has_oe: bool):
        """Jitted single train step: normal half (+ OE half) with preprocessing
        fused in. Used for non-resident (host-fed) datasets."""
        return jax.jit(self._train_step_core(ds, tx, has_oe), donate_argnums=(0,))

    def _train_step_core(self, ds, tx, has_oe: bool):
        """Un-jitted step body shared by the per-step and per-epoch paths."""
        objective = self.objective

        def step(state, xn, ln, xo, lo, w, key, center, rt_stats):
            trainable0, frozen0 = self._split_trainable(state.params)
            kn, ko = jax.random.split(jax.random.fold_in(key, state.step))
            xn = self._constrain_batch(xn)
            xn = self._preprocess(ds, xn, ln, kn, True, "normal", rt_stats)
            if has_oe:
                xo = self._constrain_batch(xo)
                xo = self._preprocess(ds, xo, lo, ko, True, "oe", rt_stats)
                x = jnp.concatenate([xn, xo], axis=0)
                labels = jnp.concatenate([ln, lo], axis=0)
                weights = jnp.concatenate([w, w], axis=0)
            else:
                x, labels, weights = xn, ln, w
            weights = weights * (labels >= 0)
            x = x.astype(self.compute_dtype)

            def loss_fn(trainable):
                variables = {"params": {**trainable, **frozen0}}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    feats, mut = self.model.apply(variables, x, train=True, mutable=["batch_stats"])
                    new_bs = mut["batch_stats"]
                else:
                    feats = self.model.apply(variables, x, train=True)
                    new_bs = state.batch_stats
                feats = feats.astype(jnp.float32)
                loss = objective.loss(feats, labels, center, weights=weights, **self._loss_kwargs(x))
                return loss, (feats, new_bs)

            (loss, (feats, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable0)
            updates, new_opt = tx.update(grads, state.opt_state, trainable0)
            new_params = {**optax.apply_updates(trainable0, updates), **frozen0}
            scores = objective.score(feats, center, **self._loss_kwargs(x)).reshape(-1)
            new_state = state.replace(params=new_params, opt_state=new_opt,
                                      batch_stats=new_bs, step=state.step + 1)
            return new_state, (loss, scores, labels, weights)

        return step

    def _eval_step_core(self, ds):
        """Unjitted eval step; the seed-vmapped grid wraps it in vmap."""
        objective = self.objective

        def step(state: TrainState, x, labels, center, rt_stats):
            x = self._constrain_batch(x)
            x = self._preprocess(ds, x, labels, None, False, "normal", rt_stats)
            x = x.astype(self.compute_dtype)
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            feats = self.model.apply(variables, x, train=False)
            feats = feats.astype(jnp.float32)
            return objective.score(feats, center, **self._loss_kwargs(x)).reshape(-1)

        return step

    def make_eval_step(self, ds):
        return jax.jit(self._eval_step_core(ds))

    # ------------------------------------------------------------- metric prep

    def prepare_metric(self, clsstr: str, ds, state: TrainState, seed: int) -> Optional[jax.Array]:
        """DSVDD center: mean feature of the normal train samples under the
        initial model (dsvdd.py:10-21; deviation: global mean instead of
        mean-of-batch-means, and BN running stats are not updated)."""
        if not self.objective.needs_center:
            return None
        if self.objective.name != "dsvdd":
            return None
        train_set = ds.train_set
        B = self.batch_size
        n = len(train_set)
        feat_sum = None
        count = 0.0
        normal_ds = ds.normal if isinstance(ds, CombinedDataset) else ds
        rt_stats = self._rt_stats(ds)

        def fwd(st, x, labels, mask, key, rt_stats):
            x = normal_ds.train_conditional_pipeline(x, labels, key, rt_stats)
            x = normal_ds.train_pipeline(x, key, rt_stats)
            variables = {"params": st.params}
            if st.batch_stats:
                variables["batch_stats"] = st.batch_stats
            feats = self.model.apply(variables, x.astype(self.compute_dtype), train=False)
            return (feats.astype(jnp.float32) * mask[:, None]).sum(axis=0)

        fwd = self._cached(("center_fwd", type(ds).__name__, tuple(ds.raw_shape), B),
                           lambda: jax.jit(fwd))
        # resident train sets upload once; batches are device-side slices
        # (same transfer-latency rationale as eval_cls)
        X_dev = (jnp.asarray(train_set.gather_all())
                 if _is_resident(train_set) else None)
        for bi, i in enumerate(range(0, n, B)):
            pos = np.arange(i, min(i + B, n))
            mask = np.ones(B, np.float32)
            if X_dev is not None and len(pos) == B:
                x = jax.lax.slice_in_dim(X_dev, i, i + B)
            else:
                x = np.asarray(train_set.gather(pos))
                if len(pos) < B:
                    x = np.concatenate([x, np.zeros((B - len(pos), *x.shape[1:]), x.dtype)])
                    mask[len(pos):] = 0.0
                x = jnp.asarray(x)
            labels = jnp.full((B,), self.nominal_label)
            s = fwd(state, x.astype(jnp.float32) / 255.0, labels,
                    jnp.asarray(mask), jax.random.key(bi), rt_stats)
            feat_sum = s if feat_sum is None else feat_sum + s
            count += len(pos)
        return dsvdd_center(feat_sum, jnp.asarray(count))

    # ------------------------------------------------------------- grid driver

    def run(self, run_classes: Optional[List[int]] = None, run_seeds: int = 1,
            load: Optional[List[List[str]]] = None, test: bool = True,
            train: bool = True,
            vmap_seeds: Optional[bool] = None) -> Tuple[Optional[list], dict]:
        """Iterate classes × seeds: build dataset, train, evaluate, snapshot
        (parity: ad_trainer.py:177-354). ``vmap_seeds`` trains all seeds of a
        class as one vmapped program on device-resident datasets (SURVEY.md
        §2.7(b)); deviation: the seeds then share one dataset build.
        ``None`` (default) auto-enables it whenever the heuristic is safe:
        training multiple seeds from scratch (non-CLIP — pretrained init
        makes seed replicas identical) without snapshot resume; the
        device-residency requirement is checked by _try_vmap_seeds, which
        falls back to the sequential path when unmet. True/False override."""
        if vmap_seeds is None:
            vmap_seeds = train and run_seeds > 1 and load is None \
                and not self.objective.is_clip
        self.logger.logsetup({"run_classes": run_classes, "run_seeds": run_seeds,
                              "load": load}, step=1)
        classes = str_labels(self.dsstr)
        run_classes = run_classes if run_classes is not None else list(range(len(classes)))
        train_cls_rocs = Result(len(classes))
        eval_cls_rocs = Result(len(classes))
        eval_cls_prcs = Result(len(classes))
        states: List[list] = [[] for _ in range(len(classes))]
        assert self.ds is None or len(run_classes) == 1, \
            "pre-loading DS (setting trainer.ds) only allowed for one class"

        for c in run_classes:
            cstr = classes[c]
            vmapped_results = None
            vmapped_scores = vmapped_host_states = None
            if vmap_seeds and train and run_seeds > 1 and load is None:
                vmapped_results = self._try_vmap_seeds(c, cstr, run_seeds)
            self._last_grid_vmapped = vmapped_results is not None
            if vmapped_results is not None:
                ds_v, stacked, _ = vmapped_results
                if test:
                    # ALL seeds' test scores in one vmapped dispatch set
                    # (VERDICT r3 item 5; per-seed eval paid the dispatch +
                    # download ladder n_seeds times)
                    from eoe_tpu.training.vmapped_seeds import eval_scores_vmapped
                    vmapped_scores = eval_scores_vmapped(self, ds_v, stacked, run_seeds)
                # ONE packed download of the whole grid for snapshots;
                # multi-process meshes all-gather the non-addressable leaves
                if any(isinstance(l, jax.Array) and not l.is_fully_addressable
                       for l in jax.tree_util.tree_leaves(stacked)):
                    vmapped_host_states = jax.tree_util.tree_map(self._fetch, stacked)
                else:
                    vmapped_host_states = jax.device_get(stacked)
            for it in range(run_seeds):
                self.logger.print(f'------ start training cls {c} "{cstr}" (seed {it}) ------')
                cur_load = None
                if load is not None and len(load) > c and len(load[c]) > it:
                    cur_load = load[c][it]

                rng = np.random.default_rng([max(self.seed, 0), c, it])
                key = jax.random.fold_in(jax.random.fold_in(
                    jax.random.key(self.seed), c), it)
                if vmapped_results is not None:
                    ds, roc = vmapped_results[0], vmapped_results[2][it]
                    # host slice of the already-downloaded grid: no transfer
                    state = jax.tree_util.tree_map(lambda x: x[it],
                                                   vmapped_host_states)
                    states[c].append(state)
                    train_cls_rocs[c].append(roc)
                    if test and state is not None:
                        eroc, eprc = self.eval_cls(state, ds, c, cstr, it,
                                                   scores=vmapped_scores[it])
                    else:
                        eroc, eprc = None, None
                    eval_cls_rocs[c].append(eroc)
                    eval_cls_prcs[c].append(eprc)
                    if state is not None:
                        self.snapshot(f"snapshot_cls{c}_it{it}", state, self.epochs,
                                      ds.ds_statistics)
                        if not Trainer.KEEP_SNAPSHOT_IN_RAM:
                            states[c][-1] = None
                    continue
                ds = self._build_dataset(c, rng, cur_load)

                state = roc = None
                for attempt in range(5):
                    try:
                        if train:
                            state, roc = self.train_cls(ds, c, cstr, it, key, cur_load)
                        else:
                            state, _ = self._init_or_load(ds, key, cur_load, steps_per_epoch=1)
                            roc = None
                        break
                    except NanGradientsError:
                        self.logger.warning(
                            f'Gradients got NaN for class {c} "{cstr}" and seed {it}. '
                            f'Happened {attempt} times so far. Try once more.')
                        key = jax.random.fold_in(key, 7 + attempt)
                        ds = self._build_dataset(c, rng, None)
                        if attempt == 4:
                            state, roc = None, None
                            self.logger.warning(
                                f'Gradients got NaN for class {c} "{cstr}" and seed {it}. Giving up.')
                states[c].append(state)
                train_cls_rocs[c].append(roc)
                self.logger.plot_many(train_cls_rocs.means(True), classes,
                                      name="training_intermediate_roc")

                if test and state is not None:
                    eroc, eprc = self.eval_cls(state, ds, c, cstr, it)
                else:
                    eroc, eprc = None, None
                eval_cls_rocs[c].append(eroc)
                eval_cls_prcs[c].append(eprc)
                self.logger.plot_many(eval_cls_rocs.means(True), classes,
                                      name="eval_intermediate_roc")

                if state is not None:
                    self.snapshot(f"snapshot_cls{c}_it{it}", state, self.epochs, ds.ds_statistics)
                    if not Trainer.KEEP_SNAPSHOT_IN_RAM:
                        states[c][-1] = None
                del ds

            train_cls_rocs.set_mean(c, self.logger.plot_many(
                train_cls_rocs[c], None, name=f"training_cls{c}-{cstr}_roc"))
            eval_cls_rocs.set_mean(c, self.logger.plot_many(
                eval_cls_rocs[c], None, name=f"eval_cls{c}-{cstr}_roc"))
            eval_cls_prcs.set_mean(c, self.logger.plot_many(
                eval_cls_prcs[c], None, name=f"eval_cls{c}-{cstr}_prc"))

        # overview + results.json (parity: ad_trainer.py:315-354)
        if any(t is not None for t in train_cls_rocs.means()):
            aucs = [m.auc for m in train_cls_rocs.means() if m is not None]
            self.logger.logtxt(f"Training: Overall {np.mean(aucs) * 100:04.2f}% "
                               f"+- {np.std(aucs) * 100:04.2f} AUC.")
            self.logger.plot_many(train_cls_rocs.means(), classes, name="training_roc")

        if test:
            e_aucs = [m.auc for m in eval_cls_rocs.means() if m is not None]
            e_aps = [m.avg_prec for m in eval_cls_prcs.means() if m is not None]
            mean_auc = float(np.mean(e_aucs)) if e_aucs else float("nan")
            std_auc = float(np.std(e_aucs)) if e_aucs else float("nan")
            mean_ap = float(np.mean(e_aps)) if e_aps else float("nan")
            std_ap = float(np.std(e_aps)) if e_aps else float("nan")
            self.logger.plot_many(eval_cls_rocs.means(), classes, name="eval_roc")
            self.logger.plot_many(eval_cls_prcs.means(), classes, name="eval_prc")
            self.logger.logtxt("--------------- OVERVIEW ------------------")
            self.logger.logtxt(f"Eval: Overall {mean_ap * 100:04.2f}% +- {std_ap * 100:04.2f}% AvgPrec.")
            for m, cs in zip(eval_cls_rocs.means(), classes):
                if m is not None:
                    self.logger.logtxt(f'Eval: Class "{cs}" yields {m.auc * 100:04.2f}% '
                                       f'+- {getattr(m, "std", 0.0) * 100:04.2f}% AUC.')
            self.logger.logtxt(f"Eval: Overall {mean_auc * 100:04.2f}% +- {std_auc * 100:04.2f}% AUC.")
        else:
            mean_auc = std_auc = mean_ap = float("nan")

        self.logger.logjson("results", {
            "eval_mean_auc": mean_auc, "eval_std_auc": std_auc, "eval_mean_avg_prec": mean_ap,
            "eval_cls_rocs": [[r.get_score() if r is not None else None for r in cr]
                              for cr in eval_cls_rocs],
            "classes": classes,
        })
        self.logger.flush_scalars()
        # wait for the logger's background artifact writes (plots, previews,
        # snapshots): the on-disk contract is complete when run() returns
        self.logger.drain()
        ret_states = states if Trainer.KEEP_SNAPSHOT_IN_RAM else None
        return ret_states, {
            "mean_auc": mean_auc, "mean_avg_prec": mean_ap, "std_auc": std_auc,
            "cls_aucs": [[r.get_score() if r is not None else None for r in cr]
                         for cr in eval_cls_rocs],
        }

    def _try_vmap_seeds(self, c: int, cstr: str, run_seeds: int):
        """Train all seeds of class c as one vmapped program when the dataset
        is device-resident; None -> caller falls back to the sequential path."""
        from eoe_tpu.training.vmapped_seeds import train_cls_vmapped_seeds
        rng = np.random.default_rng([max(self.seed, 0), c, 0])
        ds = self._build_dataset(c, rng, None)
        train_set = ds.train_set
        oe_set = ds.oe.train_set if isinstance(ds, CombinedDataset) else None
        if not (_is_resident(train_set) and (oe_set is None or _is_resident(oe_set))):
            return None
        keys = [jax.random.fold_in(jax.random.fold_in(
            jax.random.key(self.seed), c), it) for it in range(run_seeds)]
        try:
            stacked, rocs = train_cls_vmapped_seeds(self, ds, c, cstr, run_seeds, keys)
        except NanGradientsError:
            self.logger.warning(
                f'Gradients got NaN in the vmapped-seed run for class {c} "{cstr}"; '
                f"falling back to sequential training.")
            return None
        sharded = " (seed axis sharded over the data mesh)" \
            if getattr(self, "_last_vmap_sharded", False) else ""
        self.logger.print(f"trained {run_seeds} seeds of cls {c} vmapped{sharded}")
        return ds, stacked, rocs

    def _build_dataset(self, c: int, rng: np.random.Generator, cur_load: Optional[str]):
        if self.ds is not None:
            return self.ds
        return load_dataset(
            self.dsstr, self.datapath, self.get_nominal_classes(c), self.nominal_label,
            self.train_specs, self.test_specs, self.logger, self.oe_dsstr,
            self.oe_limit_samples, self.oe_limit_classes, self.msms,
            ds_statistics=self.load_ds_statistics(cur_load), rng=rng)

    def _init_or_load(self, ds, key: jax.Array, cur_load: Optional[str],
                      steps_per_epoch: int) -> Tuple[TrainState, int]:
        state = self.init_state(key, ds, steps_per_epoch)
        start_epoch = 0
        if cur_load is not None:
            state, start_epoch = self.load(cur_load, state)
        return self._commit_state(state), start_epoch

    def _commit_state(self, state: TrainState) -> TrainState:
        """Place every state leaf with an EXPLICIT device/sharding. Fresh
        init/load states carry uncommitted leaves (host constants, msgpack
        arrays), while the train step's donated output is fully committed —
        the differing argument signatures made jit compile the epoch program
        a second time on epoch 2 (minutes for ViT/WRN-sized models). Mesh
        runs keep their placement as built (tx.init already inherits the TP
        shardings; forcing a sharding here would re-shard the optimizer
        state)."""
        if self.mesh is not None:
            return state
        return jax.device_put(state, jax.local_devices()[0])

    # ------------------------------------------------------------- train one cls

    def train_cls(self, ds, cls: int, clsstr: str, it: int, key: jax.Array,
                  cur_load: Optional[str] = None) -> Tuple[TrainState, Optional[M.ROC]]:
        train_set = ds.train_set
        combined = isinstance(ds, CombinedDataset)
        oe_set = ds.oe.train_set if combined else None
        has_oe = combined and len(oe_set) > 0
        sampler = BalancedEpochSampler(
            len(train_set), len(oe_set) if has_oe else 0, self.batch_size,
            int(jax.random.randint(jax.random.fold_in(key, 1), (), 0, 2 ** 31 - 1)))
        steps_per_epoch = sampler.steps

        state, start_epoch = self._init_or_load(ds, key, cur_load, steps_per_epoch)
        tx = self.make_optimizer(steps_per_epoch)

        if it == 0 and self.logger.active:
            prev = self._transformed_preview(ds, 40, train=True)
            stats_counts = ds.n_normal_anomalous()
            self.logger.logimg(f"training_cls{cls}-{clsstr}_preview", prev,
                               rowheaders=[str(stats_counts[k])
                                           for k in sorted(stats_counts)])

        center = self.center = self.prepare_metric(clsstr, ds, state, it)
        rt_stats = self._rt_stats(ds)

        normal_ds = ds.normal if combined else ds
        resident = (_is_resident(train_set) and (not has_oe or _is_resident(oe_set))
                    and scan_ok())
        if resident:
            Xn = jnp.asarray(train_set.gather_all())
            Ln = jnp.asarray(normal_ds.binary_targets(train_set))
            Xo = jnp.asarray(oe_set.gather_all()) if has_oe else None
            Lo = jnp.asarray(ds.oe.binary_targets(oe_set)) if has_oe else None
            # one lax.scan dispatch per epoch: scan length doesn't change
            # compile time, and with the index plans pre-uploaded and outputs
            # packed (below) fewer dispatches also means fewer epoch-array
            # relayout copies and device->host round trips (whole-epoch
            # measured +2% over 4-step chunks for CLIP ViT-B/32 on v5e;
            # EOE_TPU_CHUNK overrides for experiments)
            chunk = (int(os.environ.get("EOE_TPU_CHUNK", "0"))
                     or steps_per_epoch)
            if steps_per_epoch % chunk:
                chunk = steps_per_epoch  # override must divide the epoch
            # steps_per_epoch is part of the key: the LR schedule baked into tx
            # depends on it (milestone boundaries are epoch*steps)
            epoch_fn = self._cached(
                ("scan", type(ds).__name__, has_oe, Xn.shape[1:], self.batch_size,
                 steps_per_epoch, chunk),
                lambda: self.make_train_epoch_resident(ds, tx, has_oe, chunk))
        else:
            Ln_all = normal_ds.binary_targets(train_set)
            Lo_all = ds.oe.binary_targets(oe_set) if has_oe else None
            step_fn = self._cached(
                ("step", type(ds).__name__, has_oe, tuple(ds.raw_shape), self.batch_size, steps_per_epoch),
                lambda: self.make_train_step(ds, tx, has_oe))
            # mixed residency (e.g. a resident normal class + a huge streaming
            # OE pool): resident halves live on device once; their batches are
            # device-side takes instead of per-step re-uploads
            Xn_dev = Ln_dev = Xo_dev = Lo_dev = None
            if _is_resident(train_set):
                Xn_dev = jnp.asarray(train_set.gather_all())
                Ln_dev = jnp.asarray(Ln_all)
            if has_oe and _is_resident(oe_set):
                Xo_dev = jnp.asarray(oe_set.gather_all())
                Lo_dev = jnp.asarray(Lo_all)

        cls_roc = None
        epoch_key = jax.random.fold_in(key, 2)
        plans_d = None
        plans_base = start_epoch
        if resident and self.epochs > start_epoch:
            # pre-sample every epoch's index plan and ship it as ONE packed
            # int32 upload: host->device transfers have a fixed ~40ms latency
            # on tunneled chips, and 3 uploads/epoch dominated the gap between
            # device-busy time and wall time (w is a {0,1} mask -> int-exact)
            packed = []
            for _ in range(start_epoch, self.epochs):
                e_idx_n, e_idx_o, e_w = sampler.epoch()
                # int packing is only lossless for the sampler's {0,1} mask;
                # fail loudly if a fractional weighting scheme ever appears
                assert np.array_equal(e_w, e_w.astype(np.int32)), \
                    "non-integer sampler weights cannot ride the packed int32 plan"
                packed.append(np.stack([
                    e_idx_n.astype(np.int32),
                    (e_idx_o if has_oe else np.zeros_like(e_idx_n)).astype(np.int32),
                    e_w.astype(np.int32)], axis=0))
            all_plans = np.concatenate(packed, axis=1)  # (3, E*steps, B)
            if all_plans.nbytes <= 64 * 2 ** 20:
                plans_d = jnp.asarray(all_plans)
                # chunk starts as a device array: a fresh host scalar per
                # dispatch would pay the upload latency all over again
                starts_d = jnp.arange(0, all_plans.shape[1], chunk, dtype=jnp.int32)
            else:  # huge grids: upload per epoch, still packed
                plans_per_epoch = packed
                starts_d = jnp.arange(0, sampler.steps, chunk, dtype=jnp.int32)
        for ep in range(start_epoch, self.epochs):
            t0 = time.time()
            if not resident:
                idx_n, idx_o, w = sampler.epoch()
            ekey = jax.random.fold_in(epoch_key, ep)
            if resident:
                if plans_d is None:
                    ep_plan = jnp.asarray(plans_per_epoch[ep - plans_base])
                    chunk0 = 0
                else:
                    ep_plan = plans_d
                    chunk0 = (ep - plans_base) * (sampler.steps // chunk)
                n_chunks = sampler.steps // chunk
                outs = []
                for c in range(n_chunks):
                    state, out = epoch_fn(
                        state, Xn, Ln, Xo, Lo, ep_plan,
                        starts_d[chunk0 + c], ekey, center, rt_stats)
                    outs.append(out)
                outs = [self._fetch(o) for o in outs]  # one download per chunk
                arr = np.concatenate(outs, axis=0)    # (steps, 1 + 3L)
                L = (arr.shape[1] - 1) // 3
                ep_losses = arr[:, 0]
                ep_scores = arr[:, 1:1 + L].reshape(-1)
                ep_labels = arr[:, 1 + L:1 + 2 * L].reshape(-1).astype(np.int64)
                ep_weights = arr[:, 1 + 2 * L:].reshape(-1)
            else:
                outs = []
                for s in range(sampler.steps):
                    if Xn_dev is not None:
                        pos = jnp.asarray(idx_n[s])
                        xn = jnp.take(Xn_dev, pos, axis=0)
                        ln = jnp.take(Ln_dev, pos, axis=0)
                    else:
                        xn = self._put_batch(train_set.gather(idx_n[s]))
                        ln = self._put_batch(Ln_all[idx_n[s]])
                    if has_oe:
                        if Xo_dev is not None:
                            pos = jnp.asarray(idx_o[s])
                            xo = jnp.take(Xo_dev, pos, axis=0)
                            lo = jnp.take(Lo_dev, pos, axis=0)
                        else:
                            xo = self._put_batch(oe_set.gather(idx_o[s]))
                            lo = self._put_batch(Lo_all[idx_o[s]])
                    else:
                        xo = lo = None
                    state, out = step_fn(state, xn, ln, xo, lo, self._put_batch(w[s]), ekey, center, rt_stats)
                    outs.append(out)  # keep on device: a per-step np.asarray
                    # would block each step on the download round trip and
                    # destroy host/device pipelining
                outs = [jax.tree_util.tree_map(self._fetch, o) for o in outs]
                ep_losses = np.asarray([o[0] for o in outs])
                ep_scores = np.concatenate([o[1] for o in outs])
                ep_labels = np.concatenate([o[2] for o in outs])
                ep_weights = np.concatenate([o[3] for o in outs])

            # throughput accounting (after blocking on the epoch's arrays)
            dt = time.time() - t0
            n_imgs = int(ep_weights.sum())
            self.images_seen += n_imgs
            self.train_seconds += dt
            self.epoch_rates.append(n_imgs / max(dt, 1e-9))

            keep = ep_weights > 0
            ep_scores, ep_labels = ep_scores[keep], ep_labels[keep]
            if np.isnan(ep_scores).sum() > 0:
                raise NanGradientsError()
            # per-epoch anomaly-score histograms (ad_trainer.py:458-465)
            self.logger.hist(f"Training: CLS{cls} SEED{it} anomaly_scores normal",
                             ep_scores[ep_labels == 0], ep)
            if (ep_labels == 1).sum() > 0:
                self.logger.hist(
                    f"Training: CLS{cls} SEED{it} anomaly_scores anomalous",
                    ep_scores[ep_labels == 1], ep)
                cls_roc = M.roc_curve(ep_labels, ep_scores)
                self.logger.add_scalar(f"Training: CLS{cls} SEED{it} AUC", cls_roc.auc * 100, ep)
            self.logger.add_scalar(f"training_cls{cls}_seed{it}_loss", float(ep_losses.mean()), ep)
            self.logger.print(
                f"cls {cls} seed {it} epoch {ep + 1}/{self.epochs}: loss {ep_losses.mean():.5f}"
                + (f", train AUC {cls_roc.auc * 100:.2f}%" if cls_roc is not None else "")
                + f", {n_imgs / max(time.time() - t0, 1e-9):.0f} img/s")

        # perf tooling: write the COMPILED epoch program's optimized HLO to a
        # file (experiments/copy_study.py). --xla_dump_to can't capture it on
        # tunneled chips — compilation happens on the remote PJRT server — but
        # compile().as_text() retrieves it through the client.
        dump = os.environ.get("EOE_TPU_DUMP_EPOCH_HLO")
        if dump and resident and self.epochs > start_epoch:
            try:
                txt = epoch_fn.lower(state, Xn, Ln, Xo, Lo, ep_plan,
                                     starts_d[0], ekey, center,
                                     rt_stats).compile().as_text()
                with open(dump, "w") as f:
                    f.write(txt)
                self.logger.print(f"epoch HLO written to {dump}")
            except Exception as e:  # never fail training over tooling
                self.logger.warning(f"epoch-HLO dump failed: {e}")
        return state, cls_roc

    def make_train_epoch_resident(self, ds, tx, has_oe: bool, chunk: int):
        core = self._train_step_core(ds, tx, has_oe)

        @partial(jax.jit, donate_argnums=(0,), static_argnums=())
        def epoch(state, Xn, Ln, Xo, Lo, plans, start, key, center, rt_stats):
            # plans: (3, total_steps, B) int32 — [normal idx, oe idx, weight];
            # slice this dispatch's chunk on device (the full plan is uploaded
            # once per class-seed run, not per epoch)
            B = plans.shape[2]
            blk = jax.lax.dynamic_slice(plans, (0, start, 0), (3, chunk, B))
            idx_n, idx_o, w = blk[0], blk[1], blk[2].astype(jnp.float32)

            def body(state, per_step):
                i_n, i_o, w_s = per_step
                xn = jnp.take(Xn, i_n, axis=0)
                ln = jnp.take(Ln, i_n, axis=0)
                xo = jnp.take(Xo, i_o, axis=0) if has_oe else None
                lo = jnp.take(Lo, i_o, axis=0) if has_oe else None
                state, out = core(state, xn, ln, xo, lo, w_s, key, center, rt_stats)
                return state, out

            state, (losses, scores, labels, weights) = jax.lax.scan(
                body, state, (idx_n, idx_o, w))
            # pack the per-step outputs into ONE f32 array: each distinct
            # device->host buffer costs a fixed ~30ms latency on tunneled
            # chips, so the epoch loop downloads one buffer per dispatch
            out = jnp.concatenate([
                losses.reshape(chunk, 1),
                scores.reshape(chunk, -1),
                labels.reshape(chunk, -1).astype(jnp.float32),
                weights.reshape(chunk, -1)], axis=1)
            return state, out

        return epoch

    def _cached(self, cache_key, builder):
        if cache_key not in self._jit_cache:
            self._jit_cache[cache_key] = builder()
        return self._jit_cache[cache_key]

    # ------------------------------------------------------------- eval

    def eval_cls(self, state: TrainState, ds, cls: int, clsstr: str, it: int,
                 scores: Optional[np.ndarray] = None
                 ) -> Tuple[Optional[M.ROC], Optional[M.PRC]]:
        """Evaluate on the full test split (parity: ad_trainer.py:473-550).
        ``scores``: precomputed per-sample anomaly scores (the seed-vmapped
        grid scores ALL seeds in one vmapped dispatch — vmapped_seeds.
        eval_scores_vmapped — and hands each seed's row here so the logging/
        metric contract stays identical); device work is skipped then."""
        test_set = ds.test_set
        normal_ds = ds.normal if isinstance(ds, CombinedDataset) else ds
        labels = normal_ds.binary_targets(test_set)
        n = len(test_set)
        B = self.batch_size
        eval_fn = self._cached(("eval", type(ds).__name__, tuple(ds.raw_shape), B),
                               lambda: self.make_eval_step(ds)) if scores is None else None
        rt_stats = self._rt_stats(ds)

        if it == 0 and self.logger.active:
            stats_counts = ds.n_normal_anomalous(False)
            self.logger.logimg(f"eval_cls{cls}-{clsstr}_preview",
                               self._transformed_preview(ds, 20, train=False),
                               rowheaders=[f"{k}: {v}" for k, v in
                                           sorted(stats_counts.items())])

        # async eval: dispatch all batches, sync once at the end. Per-batch
        # host work is minimized for tunneled chips (fixed ~40ms up / ~30ms
        # down per transfer): resident test sets upload ONCE and batches are
        # device-side slices; scores concatenate on device -> one download.
        steps = -(-n // B)
        total = steps * B
        if scores is not None:
            scores = np.asarray(scores).reshape(-1)[:n]
        elif _is_resident(test_set):
            cached = getattr(test_set, "_eval_device_cache", None)
            if cached is None or cached[0] != total:
                X = np.asarray(test_set.gather_all())
                if total > n:  # pad to the compiled batch shape, slice off below
                    X = np.concatenate([X, np.repeat(X[-1:], total - n, axis=0)])
                # cache the device copy on the subset: the test split is
                # re-evaluated once per seed (and its images once per class),
                # and each upload pays the full host->device transfer cost
                test_set._eval_device_cache = (total, jnp.asarray(X))
                cached = test_set._eval_device_cache
            X_d = cached[1]
            lb_all = labels
            if total > n:
                lb_all = np.concatenate([labels, np.repeat(labels[-1:], total - n)])
            lb_d = jnp.asarray(lb_all)
            outs = [eval_fn(state, jax.lax.slice_in_dim(X_d, i, i + B),
                            jax.lax.slice_in_dim(lb_d, i, i + B),
                            self.center, rt_stats)
                    for i in range(0, total, B)]
        else:
            outs = []
            for i in range(0, n, B):
                pos = np.arange(i, min(i + B, n))
                x = test_set.gather(pos)
                lb = labels[pos]
                if len(pos) < B:
                    pad = B - len(pos)
                    x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
                    lb = np.concatenate([lb, np.repeat(lb[-1:], pad)])
                outs.append(eval_fn(state, self._put_batch(x), self._put_batch(lb),
                                    self.center, rt_stats))
        if scores is not None:
            pass  # precomputed by the seed-vmapped grid
        elif len(outs) > 1 and isinstance(outs[0], jax.Array) \
                and not outs[0].is_fully_addressable:
            # multi-process mesh: device-side concat of global arrays is an
            # eager op on non-addressable shards; gather per batch instead
            scores = np.concatenate([self._fetch(o) for o in outs])[:n]
        elif len(outs) > 1:
            scores = np.asarray(jnp.concatenate(outs))[:n]
        else:
            scores = self._fetch(outs[0])[:n]

        keep = labels >= 0  # 'unlabeled' filtering (ad_trainer.py:517-521)
        # per-class eval-score histograms (ad_trainer.py:541-544)
        for lbl, tag in ((0, "nominal"), (1, "anomalous")):
            if (labels == lbl).sum() > 0:
                self.logger.hist(f"Eval: (SD{it}) anomaly_scores cls{cls} {tag}",
                                 scores[labels == lbl], 0)
        if (labels == 0).sum() > 0 and (labels == 1).sum() > 0:
            cls_roc = M.roc_curve(labels[keep], scores[keep])
            cls_prc = M.precision_recall_curve(labels[keep], scores[keep])
            self.logger.logtxt(
                f'Eval: class "{clsstr}" yields {cls_roc.auc * 100:04.2f}% AUC and '
                f"{cls_prc.avg_prec * 100:04.2f}% average precision (seed {it}).")
        else:
            cls_roc = cls_prc = None

        ascore_dict = self._anomaly_score_dict(ds, scores)
        self.logger.logjson(f"eval_cls{cls}_it{it}_anomaly_scores", ascore_dict)
        return cls_roc, cls_prc

    def _anomaly_score_dict(self, ds, scores: np.ndarray) -> dict:
        """Per-sample anomaly scores keyed by test index (custom datasets key by
        relative file path instead, handled by their subset)."""
        test_set = (ds.normal if isinstance(ds, CombinedDataset) else ds).test_set
        keys = getattr(test_set, "sample_keys", None)
        if keys is not None:
            return {str(k): float(v) for k, v in zip(keys, scores)}
        return {int(i): float(v) for i, v in zip(test_set.indices, scores)}

    # ------------------------------------------------------------- snapshots

    def snapshot(self, name: str, state: TrainState, epoch: int,
                 ds_statistics: Optional[dict]) -> str:
        # fetch the whole state in ONE packed transfer first: flax to_bytes
        # converts leaf-by-leaf, and per-leaf downloads through the tunnel
        # (fixed ~30ms each) measured 1.6s PER SNAPSHOT for CNN32 (12.9s of a
        # 26s eight-seed grid run)
        leaves = jax.tree_util.tree_leaves(state)
        if any(isinstance(l, jax.Array) and not l.is_fully_addressable
               for l in leaves):
            # multi-process TP mesh: params are sharded across processes'
            # devices; all-gather each leaf to its global value so every
            # process writes a complete (mesh-independent) snapshot
            state = jax.tree_util.tree_map(self._fetch, state)
        else:
            state = jax.device_get(state)
        payload = {
            "params": serialization.to_state_dict(state.params),
            "batch_stats": serialization.to_state_dict(state.batch_stats),
            "opt_state": serialization.to_bytes(state.opt_state),
            "epoch": epoch,
            "ds_statistics": ds_statistics or {},
            "setup": self.setup_dict(),
        }
        return self.logger.snapshot(name, payload)

    def load(self, path: str, state: TrainState) -> Tuple[TrainState, int]:
        """Load a snapshot into an initialized state; returns (state, epoch)
        (parity: ad_trainer.py:552-598). Feature-model-only snapshots for
        CustomNets are detected by the absence of the 'params' key."""
        self.logger.drain()  # the snapshot may still be on the async I/O queue
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        if "params" not in payload:
            # assume a feature-model-only snapshot of a CustomNet
            fparams = serialization.from_state_dict(
                jax.tree_util.tree_map(lambda x: x, payload), payload)
            params = dict(state.params)
            params["feature_model"] = fparams
            self.logger.print("Loaded pre-trained weights for feature model of CustomNet.")
            return state.replace(params=params), 0
        if set(payload["params"]) < set(state.params):
            # trunk-only snapshot (e.g. an imported torchvision backbone):
            # restore the stored modules, keep the fresh head init — the
            # reference replaces the fc head of pretrained backbones too
            # (resnet.py:17-19)
            params = dict(state.params)
            for k in payload["params"]:
                params[k] = serialization.from_state_dict(
                    state.params[k], payload["params"][k])
            batch_stats = dict(state.batch_stats)
            for k in payload.get("batch_stats", {}):
                batch_stats[k] = serialization.from_state_dict(
                    state.batch_stats[k], payload["batch_stats"][k])
            missing = sorted(set(state.params) - set(payload["params"]))
            self.logger.print(
                f"Loaded trunk-only snapshot; fresh init kept for {missing}")
            return state.replace(params=params, batch_stats=batch_stats), 0
        params = serialization.from_state_dict(state.params, payload["params"])
        batch_stats = serialization.from_state_dict(state.batch_stats, payload.get("batch_stats", {}))
        opt_state = state.opt_state
        if payload.get("opt_state"):
            opt_state = serialization.from_bytes(state.opt_state, payload["opt_state"])
        epoch = int(payload.get("epoch", 0))
        if self.mesh is not None:
            # restored leaves are host numpy: re-place them onto the
            # initialized state's shardings so TP-sharded params stay sharded
            # (a default placement would replicate them and, multi-process,
            # mismatch the compiled program's input shardings)
            from eoe_tpu.parallel.mesh import put_global

            def replace_leaf(new, ref):
                if isinstance(ref, jax.Array) and ref.sharding is not None:
                    return put_global(new, ref.sharding)
                return new
            params = jax.tree_util.tree_map(replace_leaf, params, state.params)
            batch_stats = jax.tree_util.tree_map(
                replace_leaf, batch_stats, state.batch_stats)
            opt_state = jax.tree_util.tree_map(replace_leaf, opt_state, state.opt_state)
        self.logger.print(f"Loaded snapshot at epoch {epoch}")
        return state.replace(params=params, batch_stats=batch_stats, opt_state=opt_state), epoch

    def load_ds_statistics(self, path: Optional[str]) -> Optional[dict]:
        if path is None:
            return None
        self.logger.drain()
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        stats = payload.get("ds_statistics") or None
        return {k: (v.tolist() if hasattr(v, "tolist") else v) for k, v in stats.items()} if stats else None

    def load_epochs_only(self, path: Optional[str]) -> int:
        if path is None:
            return 0
        self.logger.drain()
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        return int(payload.get("epoch", 0))

    # ------------------------------------------------------------- throughput

    @property
    def images_per_second(self) -> float:
        return self.images_seen / self.train_seconds if self.train_seconds > 0 else 0.0
