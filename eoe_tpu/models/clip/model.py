"""CLIP in Flax (ViT-B/32 and the ModifiedResNet variants).

Behavioral parity target: the vendored OpenAI CLIP in the reference
(/root/reference/src/eoe/models/clip_official/clip/model.py): QuickGELU MLPs,
pre-LN residual blocks, fp32-computed LayerNorm (fp16-safe LayerNorm,
model.py:153-158), causal text mask (:324-330), EOT-token pooling by argmax
over token ids (:350), class-token pooling + projection for the ViT
(:202-236), 3-conv stem + blur-pooled Bottlenecks + AttentionPool2d for the
ResNets (:10-150).

TPU-first design decisions (not a port):
  * NHWC conv layouts, fused QKV projection, bfloat16 compute with float32
    params and float32 LayerNorm/softmax,
  * the attention inner product is pluggable (``attention_fn``) so the Pallas
    flash-attention kernel (eoe_tpu.ops.attention) can replace the jnp path,
  * parameter names ('qkv', 'attn_out', 'mlp_up', 'mlp_down') line up with the
    tensor-parallel sharding rules in eoe_tpu.parallel.mesh.
"""

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
AttentionFn = Callable[[Array, Array, Array, Optional[Array]], Array]


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    """Shape hyper-parameters, derivable from a checkpoint via
    :func:`eoe_tpu.models.clip.convert.config_from_state_dict`."""
    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: Union[int, Tuple[int, int, int, int]] = 12
    vision_width: int = 768
    vision_patch_size: Optional[int] = 32
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    # explicit head count for non-standard widths (default: width // 64)
    vision_heads_override: Optional[int] = None

    @property
    def is_vit(self) -> bool:
        return not isinstance(self.vision_layers, (tuple, list))

    @property
    def vision_heads(self) -> int:
        if self.vision_heads_override is not None:
            return self.vision_heads_override
        return max(1, self.vision_width // 64 if self.is_vit
                   else self.vision_width * 32 // 64)


VIT_B32 = ClipConfig()
RN50 = ClipConfig(embed_dim=1024, vision_layers=(3, 4, 6, 3), vision_width=64,
                  vision_patch_size=None)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormF32(nn.Module):
    """LayerNorm computed in float32 regardless of the activation dtype
    (parity with the reference's fp16-safe LayerNorm)."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dtype = x.dtype
        out = nn.LayerNorm(epsilon=self.epsilon, param_dtype=jnp.float32, name="ln")(
            x.astype(jnp.float32))
        return out.astype(dtype)


def default_attention(q: Array, k: Array, v: Array, mask: Optional[Array]) -> Array:
    """(n, heads, seq, hd) scaled dot-product attention; softmax in fp32."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("nhqk,nhkd->nhqd", probs, v)


class MultiHeadAttention(nn.Module):
    """Fused-QKV multi-head self-attention (torch nn.MultiheadAttention
    semantics: joint in-projection, separate out-projection)."""
    width: int
    heads: int
    attention_fn: Optional[AttentionFn] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 causal: bool = False) -> Array:
        n, s, d = x.shape
        hd = d // self.heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        if self.attention_fn is None:
            from eoe_tpu.ops.attention import fused_qkv_attention, fused_qkv_ok
            # Pallas fused path: consumes the un-transposed joint projection.
            # It only supports no-mask or the standard causal mask — callers
            # promise causality explicitly via ``causal`` (the text encoder);
            # any other additive mask takes the general einsum path.
            # (Measured negative result, v5e: pre-padding the projection at
            # the model level — pad between the qkv GEMM and its bias add so
            # the kernel's pad vanishes — LOSES 6% end-to-end: splitting the
            # bias out of nn.Dense costs the GEMM its fused epilogue and adds
            # a full extra HBM materialization per layer. The standalone pad
            # is cheaper; fused_qkv_attention keeps it internal.)
            if fused_qkv_ok(n, s, self.heads, hd, sample=x) and (mask is None or causal):
                attn = fused_qkv_attention(qkv, self.heads, causal)
                return nn.Dense(d, dtype=self.dtype, name="attn_out")(attn)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.attention_fn is None:
            # head axis stays in place (n, s, h, hd) and the batched dots
            # carry (n, h) as dot_general batch dims — materialized (0,2,1,3)
            # transposes cost ~25 layout copies per ViT-B step on TPU
            # (measured ~12ms/step of pure copy time; see PARITY.md roofline)
            q = q.reshape(n, s, self.heads, hd)
            k = k.reshape(n, s, self.heads, hd)
            v = v.reshape(n, s, self.heads, hd)
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                                preferred_element_type=jnp.float32) * (hd ** -0.5)
            if mask is not None:
                logits = logits + mask
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            attn = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(n, s, d)
        else:
            q = q.reshape(n, s, self.heads, hd).transpose(0, 2, 1, 3)
            k = k.reshape(n, s, self.heads, hd).transpose(0, 2, 1, 3)
            v = v.reshape(n, s, self.heads, hd).transpose(0, 2, 1, 3)
            attn = self.attention_fn(q, k, v, mask)
            attn = attn.transpose(0, 2, 1, 3).reshape(n, s, d)
        return nn.Dense(d, dtype=self.dtype, name="attn_out")(attn)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    attention_fn: Optional[AttentionFn] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 causal: bool = False) -> Array:
        x = x + MultiHeadAttention(self.width, self.heads, self.attention_fn,
                                   self.dtype, name="attn")(
                                       LayerNormF32(name="ln_1")(x), mask, causal)
        h = LayerNormF32(name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_up")(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_down")(quick_gelu(h))
        return x + h


class TransformerStack(nn.Module):
    width: int
    layers: int
    heads: int
    attention_fn: Optional[AttentionFn] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 causal: bool = False) -> Array:
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, self.attention_fn,
                                       self.dtype, name=f"block{i}")(x, mask, causal)
        return x


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding. The parameter keeps nn.Conv's tree
    path and HWIO kernel shape (so checkpoint converters are unaffected), but
    the op is patchify + einsum: a stride=kernel conv IS a matmul, and the
    GEMM form keeps both the forward and the kernel gradient on the MXU with
    clean layouts (the conv form cost ~1.5ms/step in fwd+grad on v5e)."""
    width: int
    patch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = self.patch
        n, h, w, c = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, c, self.width))
        x = x.reshape(n, h // p, p, w // p, p, c)
        return jnp.einsum("nhpwqc,pqcd->nhwd", x.astype(self.dtype),
                          kernel.astype(self.dtype))


class VisionTransformer(nn.Module):
    config: ClipConfig
    attention_fn: Optional[AttentionFn] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.config
        # x: NHWC in the CLIP-normalized range
        x = PatchEmbed(cfg.vision_width, cfg.vision_patch_size,
                       dtype=self.dtype, name="patch_embed")(x)
        n, gh, gw, w = x.shape
        x = x.reshape(n, gh * gw, w)
        cls_tok = self.param("class_embedding", nn.initializers.normal(w ** -0.5), (w,))
        x = jnp.concatenate([jnp.broadcast_to(cls_tok.astype(x.dtype), (n, 1, w)), x], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(w ** -0.5),
                         (gh * gw + 1, w))
        x = x + pos.astype(x.dtype)
        x = LayerNormF32(name="ln_pre")(x)
        x = TransformerStack(w, cfg.vision_layers, cfg.vision_heads,
                             self.attention_fn, self.dtype, name="transformer")(x)
        x = LayerNormF32(name="ln_post")(x[:, 0, :])
        proj = self.param("proj", nn.initializers.normal(w ** -0.5), (w, cfg.embed_dim))
        return x @ proj.astype(x.dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name)
        out = nn.relu(bn("bn1")(nn.Conv(self.planes, (1, 1), use_bias=False,
                                        dtype=self.dtype, name="conv1")(x)))
        out = nn.relu(bn("bn2")(nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                                        dtype=self.dtype, name="conv2")(out)))
        if self.stride > 1:  # blur-pool: avgpool before the expanding conv
            out = nn.avg_pool(out, (self.stride,) * 2, strides=(self.stride,) * 2)
        out = bn("bn3")(nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                                dtype=self.dtype, name="conv3")(out))
        identity = x
        if self.stride > 1 or x.shape[-1] != self.planes * self.expansion:
            identity = x
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2, strides=(self.stride,) * 2)
            identity = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                               dtype=self.dtype, name="down_conv")(identity)
            identity = bn("down_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    embed_dim: int
    heads: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        x = x.reshape(n, h * w, c)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)  # (n, hw+1, c)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.embed_dim ** -0.5),
                         (h * w + 1, self.embed_dim))
        x = x + pos.astype(x.dtype)
        # separate q/k/v projections (reference AttentionPool2d, model.py:56-90);
        # query = the mean token only
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(x[:, :1])
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(x)
        hd = self.embed_dim // self.heads
        q = q.reshape(n, 1, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(n, -1, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(n, -1, self.heads, hd).transpose(0, 2, 1, 3)
        out = default_attention(q, k, v, None)
        out = out.transpose(0, 2, 1, 3).reshape(n, 1, self.embed_dim)[:, 0]
        return nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(out)


class ModifiedResNet(nn.Module):
    config: ClipConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.config
        width = cfg.vision_width

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name)
        # 3-conv stem with avg-pool
        x = nn.relu(bn("bn1")(nn.Conv(width // 2, (3, 3), strides=2, padding=1,
                                      use_bias=False, dtype=self.dtype, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Conv(width // 2, (3, 3), padding=1,
                                      use_bias=False, dtype=self.dtype, name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Conv(width, (3, 3), padding=1,
                                      use_bias=False, dtype=self.dtype, name="conv3")(x)))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        for stage, blocks in enumerate(cfg.vision_layers, start=1):
            planes = width * (2 ** (stage - 1))
            for b in range(blocks):
                stride = 2 if (stage > 1 and b == 0) else 1
                x = Bottleneck(planes, stride, dtype=self.dtype,
                               name=f"layer{stage}_{b}")(x, train)
        return AttentionPool2d(width * 32, cfg.vision_heads, cfg.embed_dim,
                               self.dtype, name="attnpool")(x)


class CLIP(nn.Module):
    """Full CLIP with ``encode_image`` / ``encode_text`` / contrastive call.

    ``__call__(images)`` returns image features only — matching the
    reference trainer's ``model.forward = model.encode_image`` patch
    (training/clip.py:32-33) so the generic Trainer can drive it.
    """
    config: ClipConfig = VIT_B32
    dtype: Any = jnp.float32
    attention_fn: Optional[AttentionFn] = None

    def setup(self):
        cfg = self.config
        if cfg.is_vit:
            self.visual = VisionTransformer(cfg, self.attention_fn, self.dtype,
                                            name="visual")
        else:
            self.visual = ModifiedResNet(cfg, self.dtype, name="visual")
        self.text_transformer = TransformerStack(
            cfg.transformer_width, cfg.transformer_layers, cfg.transformer_heads,
            self.attention_fn, self.dtype, name="transformer")
        self.token_embedding = nn.Embed(cfg.vocab_size, cfg.transformer_width,
                                        embedding_init=nn.initializers.normal(0.02),
                                        name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.transformer_width))
        self.ln_final = LayerNormF32(name="ln_final")
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(cfg.transformer_width ** -0.5),
            (cfg.transformer_width, cfg.embed_dim))
        self.logit_scale = self.param(
            "logit_scale", lambda *_: jnp.asarray(np.log(1 / 0.07), jnp.float32), ())

    def _causal_mask(self) -> Array:
        n = self.config.context_length
        return jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)

    def encode_image(self, images: Array, train: bool = False) -> Array:
        return self.visual(images.astype(self.dtype), train)

    def encode_text(self, tokens: Array) -> Array:
        x = self.token_embedding(tokens).astype(self.dtype)
        x = x + self.positional_embedding.astype(x.dtype)
        x = self.text_transformer(x, self._causal_mask(), causal=True)
        x = self.ln_final(x)
        # EOT pooling: the eot token has the highest id in each row (model.py:350)
        eot = jnp.argmax(tokens, axis=-1)
        x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return x @ self.text_projection.astype(x.dtype)

    def contrastive(self, images: Array, tokens: Array, train: bool = False
                    ) -> Tuple[Array, Array]:
        vi = self.encode_image(images, train)
        vt = self.encode_text(tokens)
        vi = vi / jnp.linalg.norm(vi, axis=-1, keepdims=True)
        vt = vt / jnp.linalg.norm(vt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * vi @ vt.T
        return logits_per_image, logits_per_image.T

    def __call__(self, images: Array, train: bool = False) -> Array:
        return self.encode_image(images, train)
