"""Small conv backbones for 28x28 grayscale and 32x32 RGB images.

Behavioral parity targets: /root/reference/src/eoe/models/cnn.py:5-86
(CNN28: 2 conv -> fc 64 -> rep 32; CNN32: 3 conv -> fc 512 -> rep 256; BN with
eps 1e-4 and affine tied to `bias`; leaky-ReLU; optional 1-neuron `clf` head
for BCE/focal). Implemented NHWC for TPU; xavier-normal conv/fc init with
leaky-relu gain like the reference.
"""

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch nn.init.calculate_gain('leaky_relu') with default neg slope 0.01
_LEAKY_GAIN = math.sqrt(2.0 / (1.0 + 0.01 ** 2))


def xavier_normal(gain: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        # works for conv HWIO and linear (in, out) kernels
        if len(shape) == 4:
            fan_in = shape[0] * shape[1] * shape[2]
            fan_out = shape[0] * shape[1] * shape[3]
        else:
            fan_in, fan_out = shape[0], shape[1]
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)
    return init


def torch_linear_init():
    """torch.nn.Linear default kernel init: kaiming-uniform(a=sqrt(5)) ==
    U(+-1/sqrt(fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] if len(shape) == 2 else shape[0] * shape[1] * shape[2]
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_linear_bias_init(fan_in: int):
    """torch.nn.Linear default bias init: U(+-1/sqrt(fan_in)) with the WEIGHT's
    fan-in (which a 1-D bias shape cannot convey, hence the explicit arg)."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _bn(affine: bool, name: str, dtype=None):
    return nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-4,
                        use_bias=affine, use_scale=affine, dtype=dtype, name=name)


def max_pool_2x2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class CNN28(nn.Module):
    """2-conv net for 28x28x1 inputs -> rep_dim features (default 32)."""
    rep_dim: int = 32
    bias: bool = True
    clf: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.reshape(-1, 28, 28, 1)
        x = nn.Conv(16, (5, 5), padding=2, use_bias=self.bias,
                    kernel_init=xavier_normal(_LEAKY_GAIN), dtype=self.dtype, name="conv1")(x)
        x = max_pool_2x2(nn.leaky_relu(_bn(self.bias, "bn2d1", self.dtype)(x, use_running_average=not train)))
        x = nn.Conv(32, (5, 5), padding=2, use_bias=self.bias,
                    kernel_init=xavier_normal(_LEAKY_GAIN), dtype=self.dtype, name="conv2")(x)
        x = max_pool_2x2(nn.leaky_relu(_bn(self.bias, "bn2d2", self.dtype)(x, use_running_average=not train)))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(64, use_bias=self.bias, kernel_init=xavier_normal(_LEAKY_GAIN), dtype=self.dtype, name="fc1")(x)
        x = nn.leaky_relu(_bn(self.bias, "bn1d1", self.dtype)(x, use_running_average=not train))
        x = nn.Dense(self.rep_dim, use_bias=self.bias, kernel_init=xavier_normal(), dtype=self.dtype, name="fc2")(x)
        if self.clf:
            x = nn.Dense(1, kernel_init=torch_linear_init(),
                         bias_init=torch_linear_bias_init(self.rep_dim), name="linear")(x)
        return x


class CNN32(nn.Module):
    """3-conv net for 32x32x3 (or x1) inputs -> rep_dim features (default 256)."""
    rep_dim: int = 256
    bias: bool = True
    clf: bool = False
    grayscale: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = 1 if self.grayscale else 3
        x = x.reshape(-1, 32, 32, c)
        for i, feats in enumerate((32, 64, 128), start=1):
            x = nn.Conv(feats, (5, 5), padding=2, use_bias=self.bias,
                        kernel_init=xavier_normal(_LEAKY_GAIN), dtype=self.dtype, name=f"conv{i}")(x)
            x = max_pool_2x2(nn.leaky_relu(_bn(self.bias, f"bn2d{i}", self.dtype)(x, use_running_average=not train)))
        x = x.reshape(x.shape[0], -1)  # 4*4*128
        x = nn.Dense(512, use_bias=self.bias, kernel_init=xavier_normal(_LEAKY_GAIN), dtype=self.dtype, name="fc1")(x)
        x = nn.leaky_relu(_bn(self.bias, "bn1d1", self.dtype)(x, use_running_average=not train))
        x = nn.Dense(self.rep_dim, use_bias=self.bias, kernel_init=xavier_normal(), dtype=self.dtype, name="fc2")(x)
        if self.clf:
            x = nn.Dense(1, kernel_init=torch_linear_init(),
                         bias_init=torch_linear_bias_init(self.rep_dim), name="linear")(x)
        return x
