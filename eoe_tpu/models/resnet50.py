"""torchvision-style (wide) ResNet-50 with an ImageNet-checkpoint converter.

Behavioral parity target: /root/reference/src/eoe/models/resnet.py:8-21
(`WideResNet50Pretrained`): torchvision ``wide_resnet50_2(pretrained=True)``
with the final fc replaced by a fresh ``rep_dim`` head. There is no network
egress here, so the ImageNet weights load from a user-provided torchvision
state dict (``load_torchvision_state_dict``); without one the model runs
randomly initialized.

Architecture (torchvision ResNet): 7x7 s2 stem -> BN/ReLU -> maxpool 3x3 s2
-> stages [3, 4, 6, 3] of Bottlenecks (width factor 2 for the wide variant,
stride-2 on the FIRST block's 3x3 conv) -> global average pool -> fc.
"""

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from eoe_tpu.models.cnn import torch_linear_bias_init, torch_linear_init
from eoe_tpu.models.resnet import kaiming_normal_fan_out


def _bn(name: str):
    return nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-5, name=name)


class TorchBottleneck(nn.Module):
    planes: int       # bottleneck width (already includes the wide factor)
    out_planes: int   # expansion output channels
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_fan_out(), name="conv1")(x)
        out = nn.relu(_bn("bn1")(out, use_running_average=not train))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False,
                      kernel_init=kaiming_normal_fan_out(), name="conv2")(out)
        out = nn.relu(_bn("bn2")(out, use_running_average=not train))
        out = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_fan_out(), name="conv3")(out)
        out = _bn("bn3")(out, use_running_average=not train)
        if self.downsample:
            identity = nn.Conv(self.out_planes, (1, 1), strides=self.stride,
                               use_bias=False, kernel_init=kaiming_normal_fan_out(),
                               name="down_conv")(x)
            identity = _bn("down_bn")(identity, use_running_average=not train)
        return nn.relu(out + identity)


class WideResNet50Pretrained(nn.Module):
    """wide_resnet50_2 trunk + fresh rep_dim head (+ optional 1-neuron clf)."""
    rep_dim: int = 256
    clf: bool = False
    width_factor: int = 2
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=kaiming_normal_fan_out(), name="conv1")(x)
        x = nn.relu(_bn("bn1")(x, use_running_average=not train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, blocks in enumerate(self.layers, start=1):
            base = 64 * (2 ** (stage - 1))
            # torchvision: bottleneck width = base * (width_per_group / 64),
            # width_per_group=128 for the wide variant -> base * 2
            planes = base * self.width_factor
            out_planes = base * 4
            for b in range(blocks):
                stride = 2 if (stage > 1 and b == 0) else 1
                down = b == 0
                x = TorchBottleneck(planes, out_planes, stride, down,
                                    name=f"layer{stage}_{b}")(x, train)
        x = x.mean(axis=(1, 2))
        x = nn.Dense(self.rep_dim, kernel_init=torch_linear_init(),
                     bias_init=torch_linear_bias_init(x.shape[-1]), name="fc")(x)
        if self.clf:
            x = nn.Dense(1, kernel_init=torch_linear_init(),
                         bias_init=torch_linear_bias_init(self.rep_dim), name="linear")(x)
        return x


# ---------------------------------------------------------------- converter


def _conv(sd, key):
    return {"kernel": np.asarray(sd[key + ".weight"], np.float32).transpose(2, 3, 1, 0)}


def _bn_params(sd, key) -> Tuple[dict, dict]:
    f32 = lambda k: np.asarray(sd[k], np.float32)
    return ({"scale": f32(key + ".weight"), "bias": f32(key + ".bias")},
            {"mean": f32(key + ".running_mean"), "var": f32(key + ".running_var")})


def load_torchvision_state_dict(sd: Dict[str, Any], layers=(3, 4, 6, 3)) -> Dict[str, Any]:
    """torchvision wide_resnet50_2 state dict -> Flax variables for
    :class:`WideResNet50Pretrained` (the fc head stays freshly initialized —
    the reference replaces it too, resnet.py:17-19)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    params: Dict[str, Any] = {"conv1": _conv(sd, "conv1")}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _bn_params(sd, "bn1")
    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            pfx = f"layer{stage}.{b}"
            name = f"layer{stage}_{b}"
            blk, bst = {}, {}
            for i in (1, 2, 3):
                blk[f"conv{i}"] = _conv(sd, f"{pfx}.conv{i}")
                blk[f"bn{i}"], bst[f"bn{i}"] = _bn_params(sd, f"{pfx}.bn{i}")
            if f"{pfx}.downsample.0.weight" in sd:
                blk["down_conv"] = _conv(sd, f"{pfx}.downsample.0")
                blk["down_bn"], bst["down_bn"] = _bn_params(sd, f"{pfx}.downsample.1")
            params[name] = blk
            stats[name] = bst
    return {"params": params, "batch_stats": stats}


def load_pretrained(path: str, rep_dim: int = 256, clf: bool = False):
    """Build the model + variables from a torchvision checkpoint file; the
    head params come from a fresh init merged over the trunk."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    model = WideResNet50Pretrained(rep_dim=rep_dim, clf=clf)
    init = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)
    trunk = load_torchvision_state_dict(sd)
    params = dict(init["params"])
    params.update({k: v for k, v in trunk["params"].items()})
    return model, {"params": params, "batch_stats": trunk["batch_stats"]}
