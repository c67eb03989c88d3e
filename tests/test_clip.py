"""CLIP stack tests: tokenizer golden parity, Flax model vs an independent
torch implementation (HuggingFace CLIPModel with quick_gelu), converter
structure, and AttentionPool2d numerics vs torch.

The OpenAI checkpoints cannot be downloaded here (no egress); instead the
converter is validated end-to-end by building a RANDOM torch CLIP in HF,
re-keying its state dict into the OpenAI layout, running our converter, and
asserting encode_image/encode_text equality with the torch forward.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from eoe_tpu.models.clip import (CLIP, ClipConfig, ClipTokenizer,
                                 config_from_state_dict, to_flax, tokenize)

# ----------------------------------------------------------------- tokenizer

# golden ids verified against the vendored OpenAI tokenizer of the reference
GOLDEN = {
    "a photo of a cat": [320, 1125, 539, 320, 2368],
    "a photo of something": [320, 1125, 539, 2006],
    "a photo of a airplane": [320, 1125, 539, 320, 16451],
    "hello world": [3306, 1002],
}


@pytest.fixture(scope="module")
def tok():
    return ClipTokenizer()


def test_tokenizer_vocab_size(tok):
    assert tok.vocab_size == 49408
    assert tok.sot_token == 49406
    assert tok.eot_token == 49407


@pytest.mark.parametrize("text,ids", GOLDEN.items())
def test_tokenizer_golden(tok, text, ids):
    assert tok.encode(text) == ids


def test_tokenizer_cleanup(tok):
    # whitespace collapse + lowercase + double html unescape
    assert tok.encode("A   Photo  OF a CAT") == GOLDEN["a photo of a cat"]
    assert tok.encode("a photo of &amp;amp; a cat")[-1] == GOLDEN["a photo of a cat"][-1]


def test_tokenize_padding_and_specials(tok):
    arr = tokenize(["a photo of a cat"], context_length=77)
    assert arr.shape == (1, 77)
    assert arr[0, 0] == tok.sot_token
    assert arr[0, 6] == tok.eot_token
    assert (arr[0, 7:] == 0).all()


def test_tokenize_overflow_raises():
    with pytest.raises(RuntimeError):
        tokenize(["word " * 100], context_length=77)


def test_tokenizer_decode_roundtrip(tok):
    assert tok.decode(tok.encode("hello world")).strip() == "hello world"


# ----------------------------------------------------------------- HF parity


def tiny_hf_clip():
    from transformers import CLIPConfig as HFConfig, CLIPModel
    cfg = HFConfig(
        # eos_token_id=511 == the max id: HF pools at the first eos position,
        # the OpenAI model (and ours) at argmax -- same position this way
        text_config=dict(hidden_size=64, intermediate_size=256, num_hidden_layers=2,
                         num_attention_heads=2, max_position_embeddings=16,
                         vocab_size=512, hidden_act="quick_gelu", eos_token_id=511),
        vision_config=dict(hidden_size=64, intermediate_size=256, num_hidden_layers=2,
                           num_attention_heads=2, image_size=32, patch_size=8,
                           hidden_act="quick_gelu"),
        projection_dim=32)
    torch.manual_seed(0)
    return CLIPModel(cfg).eval()


def hf_to_openai_sd(model) -> dict:
    """Re-key a HF CLIPModel state dict into the OpenAI layout our converter
    consumes (mechanical renaming; fused qkv = cat(q, k, v))."""
    hf = {k: v.detach() for k, v in model.state_dict().items()}
    sd = {}

    def blocks(src, dst, n):
        for i in range(n):
            s, d = f"{src}.layers.{i}", f"{dst}.resblocks.{i}"
            sd[f"{d}.attn.in_proj_weight"] = torch.cat(
                [hf[f"{s}.self_attn.{p}_proj.weight"] for p in "qkv"])
            sd[f"{d}.attn.in_proj_bias"] = torch.cat(
                [hf[f"{s}.self_attn.{p}_proj.bias"] for p in "qkv"])
            sd[f"{d}.attn.out_proj.weight"] = hf[f"{s}.self_attn.out_proj.weight"]
            sd[f"{d}.attn.out_proj.bias"] = hf[f"{s}.self_attn.out_proj.bias"]
            sd[f"{d}.ln_1.weight"] = hf[f"{s}.layer_norm1.weight"]
            sd[f"{d}.ln_1.bias"] = hf[f"{s}.layer_norm1.bias"]
            sd[f"{d}.ln_2.weight"] = hf[f"{s}.layer_norm2.weight"]
            sd[f"{d}.ln_2.bias"] = hf[f"{s}.layer_norm2.bias"]
            sd[f"{d}.mlp.c_fc.weight"] = hf[f"{s}.mlp.fc1.weight"]
            sd[f"{d}.mlp.c_fc.bias"] = hf[f"{s}.mlp.fc1.bias"]
            sd[f"{d}.mlp.c_proj.weight"] = hf[f"{s}.mlp.fc2.weight"]
            sd[f"{d}.mlp.c_proj.bias"] = hf[f"{s}.mlp.fc2.bias"]

    blocks("text_model.encoder", "transformer", model.config.text_config.num_hidden_layers)
    blocks("vision_model.encoder", "visual.transformer",
           model.config.vision_config.num_hidden_layers)
    sd["visual.conv1.weight"] = hf["vision_model.embeddings.patch_embedding.weight"]
    sd["visual.class_embedding"] = hf["vision_model.embeddings.class_embedding"]
    sd["visual.positional_embedding"] = hf["vision_model.embeddings.position_embedding.weight"]
    sd["visual.ln_pre.weight"] = hf["vision_model.pre_layrnorm.weight"]
    sd["visual.ln_pre.bias"] = hf["vision_model.pre_layrnorm.bias"]
    sd["visual.ln_post.weight"] = hf["vision_model.post_layernorm.weight"]
    sd["visual.ln_post.bias"] = hf["vision_model.post_layernorm.bias"]
    sd["visual.proj"] = hf["visual_projection.weight"].t()
    sd["token_embedding.weight"] = hf["text_model.embeddings.token_embedding.weight"]
    sd["positional_embedding"] = hf["text_model.embeddings.position_embedding.weight"]
    sd["ln_final.weight"] = hf["text_model.final_layer_norm.weight"]
    sd["ln_final.bias"] = hf["text_model.final_layer_norm.bias"]
    sd["text_projection"] = hf["text_projection.weight"].t()
    sd["logit_scale"] = hf["logit_scale"]
    return sd


@pytest.fixture(scope="module")
def parity():
    hf = tiny_hf_clip()
    sd = hf_to_openai_sd(hf)
    cfg = config_from_state_dict(sd)
    # tiny dims below the /64 head heuristic: patch heads in explicitly
    cfg = ClipConfig(**{**cfg.__dict__, "transformer_heads": 2, "vision_heads_override": 2})
    variables = to_flax(sd)
    model = CLIP(cfg)
    return hf, sd, cfg, variables, model


def test_config_sniffing(parity):
    _, _, cfg, _, _ = parity
    assert cfg.is_vit
    assert cfg.vision_width == 64 and cfg.vision_patch_size == 8
    assert cfg.image_resolution == 32 and cfg.embed_dim == 32
    assert cfg.transformer_layers == 2 and cfg.context_length == 16


def test_encode_image_matches_torch(parity):
    hf, _, cfg, variables, model = parity
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), method=model.encode_image))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_encode_text_matches_torch(parity):
    hf, _, cfg, variables, model = parity
    rng = np.random.default_rng(1)
    # tokens: random ids, a "eot" = the largest id at a random position
    toks = rng.integers(1, 400, (4, 16))
    eot_pos = rng.integers(4, 16, 4)
    for i, p in enumerate(eot_pos):
        toks[i, p] = 511  # max id == argmax pooling target
        toks[i, p + 1:] = 0
    with torch.no_grad():
        t = torch.tensor(toks, dtype=torch.long)
        out = hf.text_model(input_ids=t).last_hidden_state
        pooled = out[torch.arange(4), t.argmax(dim=-1)]
        ref = (pooled @ hf.text_projection.weight.t()).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(toks, jnp.int32),
                                  method=model.encode_text))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_contrastive_logits_match_torch(parity):
    hf, _, cfg, variables, model = parity
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    toks = np.zeros((2, 16), np.int64)
    toks[:, 0] = 1
    toks[0, 1], toks[1, 1] = 10, 20
    toks[:, 2] = 511
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(toks),
                 pixel_values=torch.tensor(x.transpose(0, 3, 1, 2)))
        ref = out.logits_per_image.numpy()
    li, lt = model.apply(variables, jnp.asarray(x), jnp.asarray(toks, jnp.int32),
                         method=model.contrastive)
    np.testing.assert_allclose(np.asarray(li), ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lt), ref.T, atol=2e-3)


def test_bf16_compute_close_to_fp32(parity):
    _, _, cfg, variables, _ = parity
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    m32 = CLIP(cfg, dtype=jnp.float32)
    m16 = CLIP(cfg, dtype=jnp.bfloat16)
    a = np.asarray(m32.apply(variables, x, method=m32.encode_image))
    b = np.asarray(m16.apply(variables, x, method=m16.encode_image), np.float32)
    assert np.abs(a - b).max() < 0.1  # bf16 noise, same computation


# ----------------------------------------------------------------- attn pool


def test_attention_pool_matches_torch():
    """AttentionPool2d vs torch.nn.functional.multi_head_attention_forward
    with identical weights (the RN visual head, reference model.py:56-90)."""
    import torch.nn.functional as F
    from eoe_tpu.models.clip.model import AttentionPool2d

    rng = np.random.default_rng(0)
    N, H, W, C, heads, out_dim = 2, 4, 4, 32, 4, 16
    x = rng.normal(0, 1, (N, H, W, C)).astype(np.float32)
    pool = AttentionPool2d(C, heads, out_dim)
    variables = pool.init(jax.random.key(0), jnp.asarray(x))
    p = variables["params"]

    tx = torch.tensor(x.transpose(0, 3, 1, 2))  # NCHW
    t = tx.reshape(N, C, H * W).permute(2, 0, 1)
    t = torch.cat([t.mean(dim=0, keepdim=True), t], dim=0)
    t = t + torch.tensor(np.asarray(p["positional_embedding"]))[:, None, :]
    q_w = torch.tensor(np.asarray(p["q_proj"]["kernel"]).T)
    k_w = torch.tensor(np.asarray(p["k_proj"]["kernel"]).T)
    v_w = torch.tensor(np.asarray(p["v_proj"]["kernel"]).T)
    c_w = torch.tensor(np.asarray(p["c_proj"]["kernel"]).T)
    ref, _ = F.multi_head_attention_forward(
        query=t, key=t, value=t, embed_dim_to_check=C, num_heads=heads,
        q_proj_weight=q_w, k_proj_weight=k_w, v_proj_weight=v_w,
        in_proj_weight=None,
        in_proj_bias=torch.cat([torch.tensor(np.asarray(p[n]["bias"])) for n in
                                ("q_proj", "k_proj", "v_proj")]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
        out_proj_weight=c_w, out_proj_bias=torch.tensor(np.asarray(p["c_proj"]["bias"])),
        use_separate_proj_weight=True, training=False, need_weights=False)
    ours = np.asarray(pool.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref[0].detach().numpy(), atol=2e-5)


# ----------------------------------------------------------------- RN50 shape


def test_modified_resnet_forward_shapes():
    from eoe_tpu.models.clip.model import RN50
    cfg = ClipConfig(**{**RN50.__dict__, "image_resolution": 64})
    model = CLIP(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x, method=model.encode_image)
    assert out.shape == (2, cfg.embed_dim)


# ----------------------------------------------------------------- trainer


def tiny_clip_for_trainer():
    """A small randomly-initialized CLIP able to consume real token ids."""
    cfg = ClipConfig(embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
                     vision_patch_size=8, context_length=77, vocab_size=49408,
                     transformer_width=64, transformer_heads=2, transformer_layers=2,
                     vision_heads_override=2)
    model = CLIP(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 77), jnp.int32), method=model.contrastive)
    return cfg, dict(variables)


@pytest.fixture(scope="module")
def clip_trainer_parts(tmp_path_factory):
    cfg, variables = tiny_clip_for_trainer()
    return cfg, variables


def make_clip_trainer(tmp_path, cfg, variables, epochs, ad_mode="one_vs_rest"):
    from eoe_tpu.training import TRAINER
    from eoe_tpu.utils.logger import Logger
    return TRAINER["clip"](
        model=None, train_specs=None, test_specs=None, dataset="cifar10",
        oe_dataset="cifar100", datapath=str(tmp_path / "data"),
        logger=Logger(str(tmp_path), noname=True, archive_source=False),
        epochs=epochs, lr=1e-4, wdk=1e-3, milestones=[], batch_size=16,
        ad_mode=ad_mode, clip_config=cfg, clip_variables=variables)


def test_clip_zero_shot_run(tmp_path, clip_trainer_parts):
    cfg, variables = clip_trainer_parts
    trainer = make_clip_trainer(tmp_path, cfg, variables, epochs=0)
    _, res = trainer.run(run_classes=[0], run_seeds=1)
    assert np.isfinite(res["mean_auc"])
    # prompts recorded (ovr: normal prompt + anomaly prompt)
    assert trainer.raw_texts == ["a photo of a airplane", "a photo of something"]


def test_clip_finetune_run(tmp_path, clip_trainer_parts):
    cfg, variables = clip_trainer_parts
    trainer = make_clip_trainer(tmp_path, cfg, variables, epochs=2)
    _, res = trainer.run(run_classes=[0], run_seeds=1)
    assert np.isfinite(res["mean_auc"])


def test_clip_leave_one_out_prompts(tmp_path, clip_trainer_parts):
    cfg, variables = clip_trainer_parts
    trainer = make_clip_trainer(tmp_path, cfg, variables, epochs=0, ad_mode="leave_one_out")
    _, res = trainer.run(run_classes=[0], run_seeds=1)
    assert len(trainer.raw_texts) == 10  # 9 other classes + anomaly prompt
    assert trainer.raw_texts[-1] == "a photo of something"


def test_clip_vmap_seeds_keeps_pretrained_init(tmp_path, clip_trainer_parts):
    """Seed-vmapped CLIP: the stacked init must broadcast the PRETRAINED
    weights (the base-class stacked init draws fresh random weights), and a
    2-seed vmapped run trains end-to-end."""
    cfg, variables = clip_trainer_parts
    trainer = make_clip_trainer(tmp_path, cfg, variables, epochs=1)
    import numpy as _np
    ds = trainer._build_dataset(0, _np.random.default_rng(0), None)
    keys = [jax.random.fold_in(jax.random.key(0), i) for i in range(2)]
    stacked = trainer.init_states_stacked(keys, ds, steps_per_epoch=2)
    ref = variables["params"]["visual"]["patch_embed"]["kernel"]
    got = stacked.params["visual"]["patch_embed"]["kernel"]
    assert got.shape[0] == 2
    _np.testing.assert_allclose(_np.asarray(got[0]), _np.asarray(ref), rtol=0, atol=0)
    _np.testing.assert_allclose(_np.asarray(got[1]), _np.asarray(ref), rtol=0, atol=0)
    _, res = trainer.run(run_classes=[0], run_seeds=2, vmap_seeds=True)
    assert np.isfinite(res["mean_auc"])


def test_clip_requires_none_model(tmp_path, clip_trainer_parts):
    cfg, variables = clip_trainer_parts
    from eoe_tpu.models.cnn import CNN32
    with pytest.raises(AssertionError):
        make_clip_trainer(tmp_path, cfg, variables, epochs=0).__class__(
            model=CNN32(), train_specs=None, test_specs=None, dataset="cifar10",
            oe_dataset=None, datapath="/tmp", logger=None, epochs=0, lr=1e-4,
            wdk=0.0, milestones=[], batch_size=16,
            clip_config=cfg, clip_variables=variables)


def test_clip_missing_checkpoint_error(tmp_path):
    from eoe_tpu.training.clip import ClipTrainer
    with pytest.raises(FileNotFoundError, match="CLIP checkpoint"):
        ClipTrainer(model=None, train_specs=None, test_specs=None, dataset="cifar10",
                    oe_dataset=None, datapath="/tmp", logger=None, epochs=0, lr=1e-4,
                    wdk=0.0, milestones=[], batch_size=16,
                    checkpoint_path="/nonexistent/x.pt")


def test_clip_grayscale_dataset_rgb_expansion(tmp_path, clip_trainer_parts):
    """CLIP on MNIST-family datasets: the clip preprocessing expands 1-channel
    rasters to RGB (reference _convert_image_to_rgb, clip.py:61)."""
    from eoe_tpu.ops.preprocess import compile_pipeline
    fn = compile_pipeline([{"op": "clip_pil_preprocessing", "resolution": 32},
                           {"op": "clip_tensor_preprocessing"}])
    gray = jnp.zeros((2, 28, 28, 1))
    out = fn(gray)
    assert out.shape == (2, 32, 32, 3)
    # end-to-end: zero-shot CLIP on fake mnist
    cfg, variables = clip_trainer_parts
    from eoe_tpu.training import TRAINER
    from eoe_tpu.utils.logger import Logger
    trainer = TRAINER["clip"](
        model=None, train_specs=None, test_specs=None, dataset="mnist",
        oe_dataset="emnist", datapath=str(tmp_path / "data"),
        logger=Logger(str(tmp_path), noname=True, archive_source=False),
        epochs=0, lr=1e-4, wdk=0.0, milestones=[], batch_size=16,
        clip_config=cfg, clip_variables=variables)
    _, res = trainer.run(run_classes=[0], run_seeds=1)
    assert np.isfinite(res["mean_auc"])


def test_finetune_smoke_plumbing(tmp_path, clip_trainer_parts, capsys, monkeypatch):
    """experiments/finetune_smoke.py end-to-end with a tiny injected CLIP and
    fake cifar data: trains 1 epoch, prints the loss/AUC trajectory + final
    AUROC JSON (acceptance-config coverage, BASELINE.md CLIP fine-tune)."""
    import importlib.util
    import os.path as pt
    spec = importlib.util.spec_from_file_location(
        "finetune_smoke", pt.join(pt.dirname(pt.dirname(pt.abspath(__file__))),
                                  "experiments", "finetune_smoke.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    monkeypatch.setenv("EOE_TPU_FAKE_DATA", "1")
    rc = mod.main(["--dataset", "cifar10", "--epochs", "1", "--classes", "0",
                   "--batch-size", "16", "--datapath", str(tmp_path / "data"),
                   "--logpath", str(tmp_path / "log")],
                  clip_parts=clip_trainer_parts)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json as _json
    rec = _json.loads(out)
    assert rec["smoke"].startswith("CLIP ViT-B/32 fine-tune cifar10")
    assert np.isfinite(rec["mean_auc"])
    assert any(len(v) == 1 for v in rec["loss_trajectory"].values())

    # without a checkpoint and without injection it must skip cleanly
    monkeypatch.delenv("EOE_TPU_CLIP_CHECKPOINT", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))  # no ~/.cache/clip fallback
    rc = mod.main(["--dataset", "cifar10", "--datapath", str(tmp_path / "d2"),
                   "--logpath", str(tmp_path / "log2")])
    assert rc == 0
    assert "SKIP: no CLIP checkpoint" in capsys.readouterr().out
