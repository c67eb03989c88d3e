"""Import REFERENCE (torch) snapshots into eoe_tpu msgpack snapshots.

The reference persists ``{'net': state_dict, 'opt', 'sched', 'epoch',
'ds_statistics'}`` via torch.save (logger.py:318-338) and also accepts bare
tensor dicts as CustomNet feature models (ad_trainer.py:607-615
unify_snapshot_style). This module converts those into the eoe_tpu snapshot
payload ``{params, batch_stats, opt_state, epoch, ds_statistics, setup}``
(training/trainer.py Trainer.snapshot) so ``--load`` works across frameworks.

Weight layout translation (torch -> Flax/NHWC):
  * conv kernels OIHW -> HWIO,
  * linear kernels (out, in) -> (in, out),
  * the FIRST fc after an NCHW flatten additionally permutes its input axis
    from c-major (c*H*W) to h-major (H*W*c) ordering,
  * BN weight/bias/running_mean/running_var -> scale/bias + batch_stats.

The optimizer/scheduler states are NOT translated (torch SGD/Adam layouts
don't map onto optax chains losslessly); the importing trainer keeps its
freshly initialized optimizer, like the reference does when ``opt=None``
(ad_trainer.py:586-588).

Architecture is sniffed from the state-dict keys: CNN28/CNN32 (cnn.py),
WideResNet+CBAM (resnet.py:25-154), CLIP (the OpenAI-style state dict the
reference trains, clip_official/clip/model.py) — the latter delegates to
:mod:`eoe_tpu.models.clip.convert`.
"""

from typing import Dict, Optional, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_k(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _lin_k(w) -> np.ndarray:
    return _np(w).T  # (out, in) -> (in, out)


def _flat_lin_k(w, c: int, h: int, ww: int) -> np.ndarray:
    """fc after an NCHW flatten: permute input ordering c*h*w -> h*w*c."""
    w = _np(w)
    out = w.shape[0]
    return w.reshape(out, c, h, ww).transpose(2, 3, 1, 0).reshape(h * ww * c, out)


def _bn(sd: Dict, key: str) -> Tuple[Optional[dict], dict]:
    """(affine params or None, batch stats) for a torch BatchNorm prefix."""
    stats = {"mean": _np(sd[f"{key}.running_mean"]), "var": _np(sd[f"{key}.running_var"])}
    if f"{key}.weight" in sd:
        return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}, stats
    return None, stats


def _conv(sd: Dict, key: str) -> dict:
    p = {"kernel": _conv_k(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        p["bias"] = _np(sd[f"{key}.bias"])
    return p


def _lin(sd: Dict, key: str) -> dict:
    p = {"kernel": _lin_k(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        p["bias"] = _np(sd[f"{key}.bias"])
    return p


# ----------------------------------------------------------------- CNNs


def cnn_variables_from_torch(sd: Dict) -> dict:
    """CNN28 or CNN32 state dict -> Flax variables (cnn.py:5-86). The two
    differ only in conv count and flatten geometry."""
    is32 = "conv3.weight" in sd
    convs = (1, 2, 3) if is32 else (1, 2)
    flat = (128, 4, 4) if is32 else (32, 7, 7)
    params, stats = {}, {}
    for i in convs:
        params[f"conv{i}"] = _conv(sd, f"conv{i}")
        p, s = _bn(sd, f"bn2d{i}")
        if p is not None:
            params[f"bn2d{i}"] = p
        stats[f"bn2d{i}"] = s
    params["fc1"] = {"kernel": _flat_lin_k(sd["fc1.weight"], *flat)}
    if "fc1.bias" in sd:
        params["fc1"]["bias"] = _np(sd["fc1.bias"])
    p, s = _bn(sd, "bn1d1")
    if p is not None:
        params["bn1d1"] = p
    stats["bn1d1"] = s
    params["fc2"] = _lin(sd, "fc2")
    if "linear.weight" in sd:
        params["linear"] = _lin(sd, "linear")
    return {"params": params, "batch_stats": stats}


# ----------------------------------------------------------------- CBAM


def cbam_variables_from_torch(sd: Dict, prefix: str = "") -> Tuple[dict, dict]:
    pre = f"{prefix}." if prefix else ""
    params = {
        "channel_gate": {
            "mlp_hidden": _lin(sd, f"{pre}ChannelGate.mlp.1"),
            "mlp_out": _lin(sd, f"{pre}ChannelGate.mlp.3"),
        },
        "spatial_gate": {
            "spatial_conv": _conv(sd, f"{pre}SpatialGate.spatial.conv"),
        },
    }
    p, s = _bn(sd, f"{pre}SpatialGate.spatial.bn")
    params["spatial_gate"]["spatial_bn"] = p
    return params, {"spatial_gate": {"spatial_bn": s}}


# ------------------------------------------------------------ WideResNet


def wideresnet_variables_from_torch(sd: Dict) -> dict:
    """hendrycks/ss-ood WideResNet+CBAM state dict (resnet.py:25-154)."""
    params = {"conv1": _conv(sd, "conv1"), "fc": _lin(sd, "fc")}
    stats = {}
    p, s = _bn(sd, "bn1")
    params["bn1"], stats["bn1"] = p, s
    stage = 1
    while f"layer{stage}.0.conv1.weight" in sd:
        block = 0
        while f"layer{stage}.{block}.conv1.weight" in sd:
            t = f"layer{stage}.{block}"
            name = f"layer{stage}_block{block}"
            bp = {"conv1": _conv(sd, f"{t}.conv1"), "conv2": _conv(sd, f"{t}.conv2")}
            bs = {}
            for bn in ("bn1", "bn2"):
                p, s = _bn(sd, f"{t}.{bn}")
                bp[bn], bs[bn] = p, s
            if f"{t}.downsample.0.weight" in sd:
                bp["down_conv"] = _conv(sd, f"{t}.downsample.0")
                p, s = _bn(sd, f"{t}.downsample.1")
                bp["down_bn"], bs["down_bn"] = p, s
            if f"{t}.cbam.ChannelGate.mlp.1.weight" in sd:
                bp["cbam"], bs["cbam"] = cbam_variables_from_torch(sd, f"{t}.cbam")
            params[name], stats[name] = bp, bs
            block += 1
        stage += 1
    if "linear.weight" in sd:
        params["linear"] = _lin(sd, "linear")
    return {"params": params, "batch_stats": stats}


# ----------------------------------------------------------------- dispatch


def variables_from_torch_state(sd: Dict) -> dict:
    """Sniff the architecture from the state-dict keys and convert."""
    if "visual.conv1.weight" in sd or "token_embedding.weight" in sd:
        from eoe_tpu.models.clip.convert import to_flax
        return to_flax({k: _np(v) for k, v in sd.items()})
    if "layer1.0.conv3.weight" in sd:
        # bottleneck blocks (conv3) = torchvision (wide_)resnet50-family, the
        # reference's WideResNet50Pretrained backbone (resnet.py:8-21); the
        # fc head is NOT converted — the reference replaces it too
        from eoe_tpu.models.resnet50 import load_torchvision_state_dict
        return load_torchvision_state_dict(
            {k: _np(v) for k, v in sd.items()},
            layers=_bottleneck_layout(sd))
    if "layer1.0.conv1.weight" in sd:
        return wideresnet_variables_from_torch(sd)
    if "conv1.weight" in sd and "fc1.weight" in sd:
        return cnn_variables_from_torch(sd)
    raise ValueError(
        f"Cannot sniff a known architecture from state-dict keys "
        f"(got {sorted(sd)[:8]}...). Supported: CNN28/CNN32, WideResNet+CBAM, "
        f"torchvision (wide_)resnet50, OpenAI-style CLIP.")


def _bottleneck_layout(sd: Dict) -> tuple:
    layout = []
    stage = 1
    while f"layer{stage}.0.conv1.weight" in sd:
        block = 0
        while f"layer{stage}.{block}.conv1.weight" in sd:
            block += 1
        layout.append(block)
        stage += 1
    return tuple(layout)


def import_torch_snapshot(in_path: str, out_path: str) -> str:
    """Convert a reference torch snapshot file (.pt) into an eoe_tpu msgpack
    snapshot at ``out_path``. Returns ``out_path``."""
    import torch
    from flax import serialization

    snapshot = torch.load(in_path, map_location="cpu", weights_only=False)
    if not ("net" in snapshot and isinstance(snapshot["net"], dict)):
        # unify_snapshot_style: a bare tensor dict is a CustomNet feature model
        if isinstance(snapshot, dict) and all(
                hasattr(t, "detach") for t in snapshot.values()):
            if "layer1.0.conv3.weight" in snapshot:
                # the one torchvision backbone this repo ships an architecture
                # for (wide_resnet50_2, models/resnet50.py): import it as a
                # trunk-only snapshot — the trainer merges a fresh head
                snapshot = {"net": snapshot}
            else:
                raise ValueError(
                    "This is a bare feature-model state dict (CustomNet style); "
                    "those depend on the torchvision architecture and are not "
                    "auto-convertible (only (wide_)resnet50-family backbones "
                    "are). Convert the full EOE-style snapshot instead.")
        else:
            raise ValueError("Cannot parse snapshot (no 'net' entry).")

    variables = variables_from_torch_state(snapshot["net"])
    ds_statistics = snapshot.get("ds_statistics") or {}
    ds_statistics = {k: _np(v).tolist() for k, v in ds_statistics.items()}
    payload = {
        "params": serialization.to_state_dict(variables["params"]),
        "batch_stats": serialization.to_state_dict(variables.get("batch_stats", {})),
        "opt_state": b"",  # fresh optimizer on load (see module docstring)
        "epoch": int(snapshot.get("epoch") or 0),
        "ds_statistics": ds_statistics,
        "setup": {"imported_from": in_path},
    }
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    return out_path
