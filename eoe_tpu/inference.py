"""Serving API: batched anomaly scoring from a snapshot.

The reference's inference story is the ``inference_custom.py`` entry point
(a full trainer run with ``train=False``). For programmatic / production use
this module adds a direct scorer: load a snapshot once, compile the scoring
function once, then score arbitrary image batches — variable batch sizes are
padded to the compiled shape, preprocessing (incl. the dataset statistics
carried in the snapshot, ad_trainer.py:600-605 semantics) runs fused with the
forward on device.

    scorer = AnomalyScorer(snapshot_path, model=CNN32(), test_specs=["normalize"])
    scores = scorer.score(images)   # (n,) float32, larger = more anomalous
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from eoe_tpu.ops.losses import OBJECTIVES, Objective
from eoe_tpu.ops.preprocess import DatasetStats, compile_pipeline


class AnomalyScorer:
    def __init__(self, snapshot_path: str, model, objective: str = "hsc",
                 test_specs: Optional[Sequence] = None, batch_size: int = 128,
                 center=None, compute_dtype=jnp.float32):
        """
        @param snapshot_path: a Trainer snapshot ({params, batch_stats,
            ds_statistics, setup, ...}, flax msgpack).
        @param model: the Flax module matching the snapshot's architecture.
        @param objective: anomaly-score definition (OBJECTIVES key).
        @param test_specs: preprocessing spec list; defaults to the specs
            recorded in the snapshot's setup.
        @param center: objective reference tensor (DSVDD center / CLIP text
            features) when the objective needs one.
        """
        with open(snapshot_path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        if "params" not in payload:
            raise ValueError(
                f"{snapshot_path} is not a full EOE snapshot (feature-model-only "
                f"snapshots load through the CustomNet training entry points)")
        self.model = model
        self.objective: Objective = OBJECTIVES[objective]
        self.batch_size = batch_size
        self.compute_dtype = compute_dtype
        self.center = center
        if self.objective.needs_center and center is None:
            raise ValueError(
                f"objective '{objective}' needs a center (DSVDD feature center / "
                f"CLIP text-feature matrix); pass it via the `center` argument")

        setup = payload.get("setup") or {}
        specs = list(test_specs) if test_specs is not None else \
            list(setup.get("test_specs") or [])
        stats = DatasetStats.from_json(payload.get("ds_statistics") or None)
        self._pipeline = compile_pipeline(specs, stats)

        # snapshot trees restore as plain dicts; shapes must match the model.
        # eval_shape builds the target tree structure without compiling or
        # running the forward — snapshot loading stays sub-second even for
        # ViT-sized models on a remote chip
        sample = jnp.zeros((1, *self._infer_raw_shape(specs, setup)), jnp.float32)
        init = jax.eval_shape(
            lambda: self.model.init(jax.random.key(0), sample, train=False))
        self.params = serialization.from_state_dict(init["params"], payload["params"])
        self.batch_stats = serialization.from_state_dict(
            init.get("batch_stats", {}), payload.get("batch_stats", {}) or {})
        self._jit_score = jax.jit(self._score_batch)

    @staticmethod
    def _infer_raw_shape(specs, setup) -> tuple:
        from eoe_tpu.datasets import DS_CHOICES, get_raw_shape
        ds = setup.get("dataset")
        if ds in DS_CHOICES:
            return get_raw_shape(specs, ds)
        for s in specs:
            if isinstance(s, dict) and s.get("op") == "resize":
                size = s["size"]
                return (size, size, 3) if isinstance(size, int) else (*size, 3)
        return (224, 224, 3)

    def _score_batch(self, x):
        x = self._pipeline(x)
        x = x.astype(self.compute_dtype)
        variables = {"params": self.params}
        if self.batch_stats:
            variables["batch_stats"] = self.batch_stats
        feats = self.model.apply(variables, x, train=False).astype(jnp.float32)
        kw = {"inputs": x} if self.objective.uses_inputs else {}
        return self.objective.score(feats, self.center, **kw).reshape(-1)

    def score(self, images: np.ndarray) -> np.ndarray:
        """Score (n, h, w, c) uint8 or float images; any n (padded internally)."""
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        n = len(images)
        B = self.batch_size
        outs = []
        for i in range(0, n, B):
            chunk = images[i: i + B]
            if len(chunk) < B:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], B - len(chunk), axis=0)])
            outs.append(self._jit_score(jnp.asarray(chunk)))
        # concatenate on device: one download instead of one per batch
        # (device->host transfers have fixed latency on tunneled chips)
        out = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
        return np.asarray(out)[:n]
