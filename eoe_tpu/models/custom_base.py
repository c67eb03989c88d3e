"""Plug-in base for user-defined models.

Behavioral parity target: /root/reference/src/eoe/models/custom_base.py — a
CustomNet wraps a `feature_model` and optionally adds a final linear prediction
head (1 neuron for classification objectives, 256 otherwise), can freeze the
feature model, and can load feature-model-only weight snapshots. Subclasses
defined in :mod:`eoe_tpu.models.custom` are auto-discovered by the
train_only_custom / inference_custom entry points.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from eoe_tpu.models.cnn import torch_linear_bias_init, torch_linear_init


class CustomNet(nn.Module):
    """Base class for custom models.

    Subclasses must override :meth:`features` (the feature model) and set
    `feature_dim`. The trainer consults `freeze` to mask feature-model
    gradients via an optax mask (the functional equivalent of the reference's
    requires_grad_(False) loop, custom_base.py:35-40).
    """
    feature_dim: int = 256
    prediction_head: bool = True
    clf: bool = False
    freeze: bool = False

    # name of the parameter subtree holding the feature model; used both for
    # gradient freezing and for loading feature-model-only snapshots
    FEATURE_COLLECTION = "feature_model"

    def features(self, x, train: bool = True):
        raise NotImplementedError("CustomNet subclasses must implement features()")

    @nn.compact
    def __call__(self, x, train: bool = True):
        if not self.prediction_head and self.clf and self.feature_dim != 1:
            raise ValueError(
                f"{type(self).__name__} is used with a classification loss (BCE, focal, ...) without a "
                f"prediction head, but its feature model outputs {self.feature_dim} > 1 neurons. "
                f"Add a prediction head (--custom-model-add-prediction-head) or change the objective.")
        feats = self.features(x, train)
        if self.prediction_head:
            feats = feats.reshape(feats.shape[0], -1)
            feats = nn.Dense(1 if self.clf else 256, kernel_init=torch_linear_init(),
                             bias_init=torch_linear_bias_init(self.feature_dim),
                             name="final_linear")(feats)
        return feats


def frozen_param_labels(params, freeze: bool) -> dict:
    """optax.multi_transform labels: 'frozen' for the feature-model subtree when
    freeze is set, 'trainable' otherwise."""
    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return "frozen" if freeze and top == CustomNet.FEATURE_COLLECTION else "trainable"
    return jax.tree_util.tree_map_with_path(label, params)
