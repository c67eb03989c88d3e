"""OpenAI CLIP checkpoint -> Flax params converter.

Parity target: the reference's shape-sniffing ``build_model``
(/root/reference/src/eoe/models/clip_official/clip/model.py:395-432) and jit
-archive loader (clip.py:73-161). Given the raw OpenAI ``state_dict`` (fp16
torch tensors, names like ``visual.transformer.resblocks.0.attn.in_proj_weight``)
this derives the :class:`ClipConfig` and emits
``{"params": ..., "batch_stats": ...}`` for :class:`eoe_tpu.models.clip.CLIP`:

  * conv OIHW -> HWIO, linear (out,in) -> (in,out),
  * fused in_proj -> 'qkv', out_proj -> 'attn_out', c_fc/c_proj ->
    'mlp_up'/'mlp_down',
  * BatchNorm running stats -> the 'batch_stats' collection.
"""

from typing import Any, Dict, Tuple

import numpy as np

from eoe_tpu.models.clip.model import ClipConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def config_from_state_dict(sd: Dict[str, Any]) -> ClipConfig:
    """Derive the architecture from tensor shapes (model.py:395-419)."""
    vit = "visual.proj" in sd
    if vit:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len([k for k in sd
                             if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")])
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid
    else:
        counts = [len(set(k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")))
                  for b in (1, 2, 3, 4)]
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_width = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        vision_patch_size = None
        image_resolution = out_width * 32
    return ClipConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=max(1, sd["ln_final.weight"].shape[0] // 64),
        transformer_layers=len(set(k.split(".")[2] for k in sd
                                   if k.startswith("transformer.resblocks"))),
    )


def _conv(sd, key):  # OIHW -> HWIO
    return {"kernel": _np(sd[key + ".weight"]).transpose(2, 3, 1, 0)}


def _linear(sd, key):  # (out,in) -> (in,out)
    p = {"kernel": _np(sd[key + ".weight"]).T}
    if key + ".bias" in sd:
        p["bias"] = _np(sd[key + ".bias"])
    return p


def _ln(sd, key):
    return {"ln": {"scale": _np(sd[key + ".weight"]), "bias": _np(sd[key + ".bias"])}}


def _bn(sd, key) -> Tuple[dict, dict]:
    params = {"scale": _np(sd[key + ".weight"]), "bias": _np(sd[key + ".bias"])}
    stats = {"mean": _np(sd[key + ".running_mean"]), "var": _np(sd[key + ".running_var"])}
    return params, stats


def _block(sd, prefix) -> dict:
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "attn": {
            "qkv": {"kernel": _np(sd[f"{prefix}.attn.in_proj_weight"]).T,
                    "bias": _np(sd[f"{prefix}.attn.in_proj_bias"])},
            "attn_out": _linear(sd, f"{prefix}.attn.out_proj"),
        },
        "mlp_up": _linear(sd, f"{prefix}.mlp.c_fc"),
        "mlp_down": _linear(sd, f"{prefix}.mlp.c_proj"),
    }


def to_flax(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Full variables dict for eoe_tpu.models.clip.CLIP."""
    sd = {k: v for k, v in sd.items()
          if k not in ("input_resolution", "context_length", "vocab_size")}
    cfg = config_from_state_dict(sd)
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    # ---- text side
    params["token_embedding"] = {"embedding": _np(sd["token_embedding.weight"])}
    params["positional_embedding"] = _np(sd["positional_embedding"])
    params["ln_final"] = _ln(sd, "ln_final")
    params["text_projection"] = _np(sd["text_projection"])
    params["logit_scale"] = _np(sd["logit_scale"])
    params["transformer"] = {
        f"block{i}": _block(sd, f"transformer.resblocks.{i}")
        for i in range(cfg.transformer_layers)}

    # ---- vision side
    visual: Dict[str, Any] = {}
    vstats: Dict[str, Any] = {}
    if cfg.is_vit:
        visual["patch_embed"] = _conv(sd, "visual.conv1")
        visual["class_embedding"] = _np(sd["visual.class_embedding"])
        visual["positional_embedding"] = _np(sd["visual.positional_embedding"])
        visual["ln_pre"] = _ln(sd, "visual.ln_pre")
        visual["ln_post"] = _ln(sd, "visual.ln_post")
        visual["proj"] = _np(sd["visual.proj"])
        visual["transformer"] = {
            f"block{i}": _block(sd, f"visual.transformer.resblocks.{i}")
            for i in range(cfg.vision_layers)}
    else:
        for i in (1, 2, 3):
            visual[f"conv{i}"] = _conv(sd, f"visual.conv{i}")
            p, s = _bn(sd, f"visual.bn{i}")
            visual[f"bn{i}"] = p
            vstats[f"bn{i}"] = s
        for stage, blocks in enumerate(cfg.vision_layers, start=1):
            for b in range(blocks):
                pfx = f"visual.layer{stage}.{b}"
                name = f"layer{stage}_{b}"
                blk: Dict[str, Any] = {}
                bst: Dict[str, Any] = {}
                for i in (1, 2, 3):
                    blk[f"conv{i}"] = _conv(sd, f"{pfx}.conv{i}")
                    p, s = _bn(sd, f"{pfx}.bn{i}")
                    blk[f"bn{i}"] = p
                    bst[f"bn{i}"] = s
                if f"{pfx}.downsample.0.weight" in sd:
                    blk["down_conv"] = _conv(sd, f"{pfx}.downsample.0")
                    p, s = _bn(sd, f"{pfx}.downsample.1")
                    blk["down_bn"] = p
                    bst["down_bn"] = s
                visual[name] = blk
                vstats[name] = bst
        visual["attnpool"] = {
            "positional_embedding": _np(sd["visual.attnpool.positional_embedding"]),
            "q_proj": _linear(sd, "visual.attnpool.q_proj"),
            "k_proj": _linear(sd, "visual.attnpool.k_proj"),
            "v_proj": _linear(sd, "visual.attnpool.v_proj"),
            "c_proj": _linear(sd, "visual.attnpool.c_proj"),
        }
    params["visual"] = visual
    if vstats:
        batch_stats["visual"] = vstats

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load an OpenAI CLIP checkpoint (.pt, either a jit archive or a plain
    state dict) and return its raw state_dict (clip.py:120-133 role)."""
    import torch
    with open(path, "rb") as f:
        try:
            model = torch.jit.load(f, map_location="cpu")
            sd = model.state_dict()
        except RuntimeError:
            f.seek(0)
            sd = torch.load(f, map_location="cpu")
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
    return sd
