"""CLIP AD trainer: zero-shot and fine-tuned prompt-based anomaly detection.

Behavioral parity target: /root/reference/src/eoe/training/clip.py —
  * always uses the pretrained CLIP model (``model`` arg must be None); model
    weights are NOT reset between class-seed runs (ad_trainer.py:237-241
    skips weight_reset for CLIP),
  * optimizer is SGD + nesterov momentum 0.9 (ad_trainer.py:380-381),
  * 'clip_pil_preprocessing' / 'clip_tensor_preprocessing' placeholders in the
    transform specs resolve to CLIP's canonical preprocessing (handled
    natively by ops.preprocess), empty specs -> the full canonical pipeline,
  * prepare_metric encodes text prompts — one-vs-rest: ["a photo of a {cls}",
    anom_tkn_ptn]; leave-one-out: all non-anomalous class prompts + the
    anomaly prompt — L2-normalized, as the "center" (clip.py:50-64),
  * loss/score = prompt-contrastive log-softmax over 100x cosine similarity
    (ops.losses.clip_loss/clip_score). Zero-shot = run with epochs=0.

Checkpoint: the OpenAI ``ViT-B/32`` weights are loaded from
``checkpoint_path`` (or $EOE_TPU_CLIP_CHECKPOINT, or ~/.cache/clip/ViT-B-32.pt)
via the converter; there is no downloader in this environment (zero egress) —
place the file there. Tests inject tiny random weights instead.
"""

import os
import os.path as pt
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from eoe_tpu.datasets import str_labels
from eoe_tpu.models.clip import CLIP, ClipConfig, VIT_B32, tokenize
from eoe_tpu.models.clip.convert import config_from_state_dict, load_checkpoint, to_flax
from eoe_tpu.training.optim import make_optimizer
from eoe_tpu.training.trainer import Trainer, TrainState

DEFAULT_CHECKPOINT = pt.expanduser("~/.cache/clip/ViT-B-32.pt")
CLIP_SPECS = [{"op": "clip_pil_preprocessing"}, {"op": "clip_tensor_preprocessing"}]


def _resolve_checkpoint(path: Optional[str]) -> Optional[str]:
    for cand in (path, os.environ.get("EOE_TPU_CLIP_CHECKPOINT"), DEFAULT_CHECKPOINT):
        if cand and pt.exists(cand):
            return cand
    return None


class ClipTrainer(Trainer):
    def __init__(self, model, train_specs, test_specs, *args,
                 anom_tkn_ptn: str = "a photo of something",
                 checkpoint_path: Optional[str] = None,
                 clip_config: Optional[ClipConfig] = None,
                 clip_variables: Optional[dict] = None,
                 compute_dtype=jnp.float32, **kwargs):
        assert model is None, "CLIP-AD always uses the CLIP model"
        assert not test_specs, "CLIP-AD always uses CLIP's test transform"
        if clip_variables is not None:
            config = clip_config or VIT_B32
            variables = clip_variables
        else:
            ckpt = _resolve_checkpoint(checkpoint_path)
            if ckpt is None:
                raise FileNotFoundError(
                    "No CLIP checkpoint found. Place the OpenAI ViT-B/32 weights at "
                    f"{DEFAULT_CHECKPOINT} or set EOE_TPU_CLIP_CHECKPOINT (no network "
                    "egress in this environment, so nothing can be downloaded).")
            sd = load_checkpoint(ckpt)
            config = config_from_state_dict(sd)
            variables = to_flax(sd)
        self._clip_variables = variables
        # Tensor-parallel meshes force the plain attention path: the Megatron
        # rules shard the qkv features (heads) over the model axis, which the
        # fused kernel cannot consume — einsum attention shards natively on
        # the head axis. Data-parallel meshes keep the kernel: it carries
        # custom_partitioning rules for the batch axis (ops/attention.py).
        attention_fn = None
        mesh = kwargs.get("mesh")
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            from eoe_tpu.models.clip.model import default_attention
            attention_fn = default_attention
        clip_model = CLIP(config, dtype=compute_dtype, attention_fn=attention_fn)
        # the RAW spec inputs are what setup.json must record: load_setup
        # compares the runner's specs against the logged ones, and the
        # resolution rewrite below is deterministic from the raw form
        self._raw_train_specs = list(train_specs) if train_specs else None
        self._raw_test_specs = list(test_specs) if test_specs else None
        # resolve placeholders: empty/None train specs -> canonical pipeline;
        # explicit specs keep their order with placeholders resolved natively
        train_specs = list(train_specs) if train_specs else list(CLIP_SPECS)
        res = config.image_resolution
        train_specs = [
            ({"op": "clip_pil_preprocessing", "resolution": res}
             if (s == "clip_pil_preprocessing" or (isinstance(s, dict) and s.get("op") == "clip_pil_preprocessing"))
             else s)
            for s in train_specs]
        test_specs = [{"op": "clip_pil_preprocessing", "resolution": res},
                      {"op": "clip_tensor_preprocessing"}]
        super().__init__(clip_model, train_specs, test_specs, *args,
                         objective="clip", compute_dtype=compute_dtype, **kwargs)
        self.anom_tkn_ptn = anom_tkn_ptn
        self.raw_texts: Sequence[str] = ()

    def setup_dict(self) -> dict:
        """setup.json records the RAW (pre-resolution) specs so load_setup's
        equality assertions hold against what the runner passes."""
        d = super().setup_dict()
        d["train_specs"] = self._raw_train_specs or []
        d["test_specs"] = self._raw_test_specs or []
        return d

    # CLIP keeps its pretrained weights for every class-seed (no weight reset).
    # COPY the buffers: the jitted train step donates its state argument, so
    # handing out the originals would delete the pretrained weights.
    def init_state(self, key: jax.Array, ds, steps_per_epoch: int) -> TrainState:
        params = self.place_params(
            jax.tree_util.tree_map(jnp.array, self._clip_variables["params"]))
        batch_stats = jax.tree_util.tree_map(
            jnp.array, self._clip_variables.get("batch_stats", {}))
        tx = self.make_optimizer(steps_per_epoch)
        trainable, _ = self._split_trainable(params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=tx.init(trainable), step=jnp.zeros((), jnp.int32))

    def init_states_stacked(self, keys, ds, steps_per_epoch: int) -> TrainState:
        # every seed starts from the SAME pretrained weights (no weight reset),
        # so the stacked state is a broadcast of one init — materialized via
        # repeat because the jitted epoch donates (and thus deletes) its input
        base = self.init_state(keys[0], ds, steps_per_epoch)
        return jax.tree_util.tree_map(
            lambda x: jnp.repeat(x[None], len(keys), axis=0), base)

    def make_optimizer(self, steps_per_epoch: int):
        return make_optimizer("sgd", self.lr, self.wdk, self.milestones, steps_per_epoch)

    def _loss_kwargs(self, inputs):
        return {"nominal_label": self.nominal_label, "ad_mode": self.ad_mode}

    def prepare_metric(self, clsstr: str, ds, state: TrainState, seed: int) -> jax.Array:
        """Encode the prompt set; the normalized text-feature matrix is the
        'center' (clip.py:50-64)."""
        if self.ad_mode == "one_vs_rest":
            raw_texts = [f"a photo of a {clsstr}", self.anom_tkn_ptn.format(clsstr)]
        elif self.ad_mode == "leave_one_out":
            raw_texts = [*[f"a photo of a {cs}" for cs in str_labels(self.dsstr) if cs != clsstr],
                         self.anom_tkn_ptn.format(clsstr)]
        else:
            raise NotImplementedError(f"AD mode {self.ad_mode} unknown.")
        self.raw_texts = raw_texts
        tokens = jnp.asarray(tokenize(raw_texts, self.model.config.context_length))
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        feats = self.model.apply(variables, tokens, method=self.model.encode_text)
        feats = feats.astype(jnp.float32)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
