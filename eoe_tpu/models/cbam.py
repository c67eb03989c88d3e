"""CBAM attention (channel + spatial gates) in Flax/NHWC.

Behavioral parity target: /root/reference/src/eoe/models/cbam.py (channel gate:
shared MLP over avg- and max-pooled features, reduction 16; spatial gate: 7x7
conv over [channel-max, channel-mean] with BN(momentum 0.01, eps 1e-5) and no
relu). The reference zero-initializes the SpatialGate BN scale
(resnet.py:60-62), which we reproduce.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from eoe_tpu.models.cnn import torch_linear_bias_init, torch_linear_init


class ChannelGate(nn.Module):
    gate_channels: int
    reduction_ratio: int = 16
    pool_types: Sequence[str] = ("avg", "max")
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        n, h, w, c = x.shape
        hidden = nn.Dense(c // self.reduction_ratio, kernel_init=torch_linear_init(),
                          bias_init=torch_linear_bias_init(c), dtype=self.dtype, name="mlp_hidden")
        out = nn.Dense(c, kernel_init=torch_linear_init(),
                       bias_init=torch_linear_bias_init(c // self.reduction_ratio),
                       dtype=self.dtype, name="mlp_out")

        att_sum = None
        for pool_type in self.pool_types:
            if pool_type == "avg":
                pooled = x.mean(axis=(1, 2))
            elif pool_type == "max":
                pooled = x.max(axis=(1, 2))
            elif pool_type == "lse":
                flat = x.reshape(n, h * w, c)
                m = flat.max(axis=1, keepdims=True)
                pooled = (m + jnp.log(jnp.exp(flat - m).sum(axis=1, keepdims=True)))[:, 0, :]
            else:
                raise NotImplementedError(pool_type)
            att = out(nn.relu(hidden(pooled)))
            att_sum = att if att_sum is None else att_sum + att

        scale = nn.sigmoid(att_sum)[:, None, None, :]
        return x * scale


class SpatialGate(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        compress = jnp.concatenate([x.max(axis=-1, keepdims=True), x.mean(axis=-1, keepdims=True)], axis=-1)
        y = nn.Conv(1, (7, 7), padding=3, use_bias=False, dtype=self.dtype, name="spatial_conv")(compress)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-5,
                         scale_init=nn.initializers.zeros, dtype=self.dtype, name="spatial_bn")(y)
        return x * nn.sigmoid(y)


class CBAM(nn.Module):
    gate_channels: int
    reduction_ratio: int = 16
    pool_types: Sequence[str] = ("avg", "max")
    no_spatial: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ChannelGate(self.gate_channels, self.reduction_ratio, self.pool_types,
                        dtype=self.dtype, name="channel_gate")(x, train)
        if not self.no_spatial:
            x = SpatialGate(dtype=self.dtype, name="spatial_gate")(x, train)
        return x
