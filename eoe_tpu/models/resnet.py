"""WideResNet (ResNet-18-style with CBAM) for 224x224 inputs, in Flax/NHWC.

Behavioral parity target: /root/reference/src/eoe/models/resnet.py:25-154
(hendrycks/ss-ood lineage): conv7x7 s2 -> BN/ReLU -> maxpool3x3 s2 -> four
stages of 2 BasicBlocks (64/128/256/512, stride 2 from stage 2) each with CBAM
before the residual add -> 7x7 avgpool -> fc to rep_dim (default 256), plus an
optional 1-neuron clf head. Conv weights kaiming-normal (fan_out), BN scale 1
except the CBAM SpatialGate BN which is zero-initialized (resnet.py:56-66).

The reference's `WideResNet50Pretrained` (torchvision wide_resnet50_2,
resnet.py:8-21) lives in :mod:`eoe_tpu.models.resnet50` together with its
torchvision-checkpoint converter.
"""

import math
import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from eoe_tpu.models.cbam import CBAM
from eoe_tpu.ops.stem import FUSED_STEM_AVAILABLE, fused_stem_train


def kaiming_normal_fan_out():
    def init(key, shape, dtype=jnp.float32):
        # HWIO conv kernels: fan_out = H*W*O
        fan_out = shape[0] * shape[1] * shape[3] if len(shape) == 4 else shape[1]
        std = math.sqrt(2.0 / fan_out)
        return std * jax.random.normal(key, shape, dtype)
    return init


def _bn(name: str, dtype=None):
    # dtype only affects the normalized output; flax computes the batch
    # statistics in f32 regardless (normalization._compute_stats)
    return nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-5,
                        dtype=dtype, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_cbam: bool = True
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False,
                      kernel_init=kaiming_normal_fan_out(), dtype=self.dtype, name="conv1")(x)
        out = nn.relu(_bn("bn1", self.dtype)(out, use_running_average=not train))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      kernel_init=kaiming_normal_fan_out(), dtype=self.dtype, name="conv2")(out)
        out = _bn("bn2", self.dtype)(out, use_running_average=not train)
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1), strides=self.stride, use_bias=False,
                               kernel_init=kaiming_normal_fan_out(), dtype=self.dtype, name="down_conv")(x)
            residual = _bn("down_bn", self.dtype)(residual, use_running_average=not train)
        if self.use_cbam:
            out = CBAM(self.planes, 16, dtype=self.dtype, name="cbam")(out, train)
        return nn.relu(out + residual)


class _StemKernel(nn.Module):
    """Parameter-only twin of the stem ``nn.Conv`` (same path: conv1/kernel)."""

    in_features: int = 3

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_normal_fan_out(),
                          (7, 7, self.in_features, 64))


class _StemBN(nn.Module):
    """Parameter/variable-only twin of the stem ``nn.BatchNorm`` (bn1/...)."""

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (64,))
        bias = self.param("bias", nn.initializers.zeros, (64,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((64,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((64,), jnp.float32))
        return scale, bias, ra_mean, ra_var


class WideResNet(nn.Module):
    rep_dim: int = 256
    clf: bool = False
    layers: Sequence[int] = (2, 2, 2, 2)
    use_cbam: bool = True
    # compute dtype for convs/BN outputs (params stay f32); None = promote
    # with the f32 params, i.e. full f32 compute. The Trainer clones the
    # model with its --compute-dtype when this is left None.
    dtype: Any = None
    # train-mode stem with the grid-stats fused backward (ops/stem.py):
    # identical forward, BN-backward reductions collapsed onto the pooled
    # grid, exact input gradients (DCE'd when images are leaves). Killable
    # via EOE_TPU_FUSED_STEM=0 without touching configs; auto-disabled if
    # the select-and-scatter primitive moves (stem.FUSED_STEM_AVAILABLE).
    fused_stem: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        # NHWC input of any spatial size (the reference targets 224x224 but the
        # custom entry points feed other crops); pooling below is global
        use_fused = (self.fused_stem and train and FUSED_STEM_AVAILABLE
                     and os.environ.get("EOE_TPU_FUSED_STEM", "1") != "0")
        if use_fused:
            w = _StemKernel(x.shape[-1], name="conv1")()
            scale, bias, ra_mean, ra_var = _StemBN(name="bn1")()
            dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
            x, mu, var = fused_stem_train(w, scale, bias, x.astype(dt))
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mu
                ra_var.value = 0.9 * ra_var.value + 0.1 * var
        else:
            x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                        kernel_init=kaiming_normal_fan_out(), dtype=self.dtype, name="conv1")(x)
            x = nn.relu(_bn("bn1", self.dtype)(x, use_running_average=not train))
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers), start=1):
            stride = 1 if stage == 1 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or inplanes != planes)
                x = BasicBlock(planes, s, self.use_cbam, down, dtype=self.dtype,
                               name=f"layer{stage}_block{b}")(x, train)
            inplanes = planes

        # 7x7 avg pool on the 7x7 feature map == global average pool
        x = x.mean(axis=(1, 2))
        x = nn.Dense(self.rep_dim, kernel_init=kaiming_normal_fan_out(),
                     bias_init=nn.initializers.zeros, dtype=self.dtype, name="fc")(x)
        if self.clf:
            x = nn.Dense(1, kernel_init=kaiming_normal_fan_out(),
                         bias_init=nn.initializers.zeros, dtype=self.dtype, name="linear")(x)
        return x
