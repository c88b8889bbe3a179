"""CLIP ViT-B/32 (image + text towers), TPU-native.

Behavioral reference: /root/reference/clip/model.py:150-335 (VisualTransformer,
Transformer/ResidualAttentionBlock, CLIP.encode_image/encode_text). Design
departures for TPU:

- Patch embedding is a reshape + one [B*49, 3072] x [3072, width] matmul
  instead of a strided conv (same arithmetic as the stride-32 conv at
  reference clip/model.py:206, but guaranteed MXU-shaped).
- The 12 transformer blocks are parameter-stacked and iterated with
  `lax.scan` (single block compilation, layer dim resident in HBM).
- Mixed precision mirrors the reference's fp16-weights/fp32-LayerNorm split
  (reference clip/model.py:152-158, 339-360) as bf16 compute / fp32 LN.
- Everything is batch-first; no NLD<->LND permutes are needed.

Weight import from the torch state_dict layout is in
weights/convert_clip.py; tests/test_clip_parity.py checks both towers
against the reference module within float tolerance.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_glass_tpu.core.dtypes import Policy, FP32
from clip_glass_tpu.ops.attention import multi_head_attention
from clip_glass_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    # vit: int block count; rn: per-stage bottleneck counts, e.g. (3, 4, 6, 3)
    vision_layers: object = 12
    vision_width: int = 768
    vision_patch_size: int = 32  # vit only; unused when vision_kind == "rn"
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    # visual tower family: "vit" (patch transformer, reference
    # clip/model.py:222-269) or "rn" (ModifiedResNet, clip/model.py:9-149)
    vision_kind: str = "vit"

    @property
    def vision_heads(self) -> int:
        return self.vision_width // 64  # reference clip/model.py:270

    @property
    def grid(self) -> int:
        return self.image_resolution // self.vision_patch_size

    def rn_config(self):
        """The ModifiedResNet view of this config (vision_kind == 'rn')."""
        from clip_glass_tpu.models.clip.resnet import RNConfig
        return RNConfig(layers=tuple(self.vision_layers),
                        output_dim=self.embed_dim,
                        input_resolution=self.image_resolution,
                        width=self.vision_width)


VIT_B_32 = CLIPConfig()
# RN50 (reference clip/clip.py:18-21 `_MODELS`; hyperparameters from
# clip/model.py:371-379 state-dict inference on the official checkpoint)
RN50 = CLIPConfig(embed_dim=1024, vision_layers=(3, 4, 6, 3),
                  vision_width=64, vision_kind="rn")

# tiny variant for CPU tests / dryrun
TINY = CLIPConfig(embed_dim=64, image_resolution=32, vision_layers=2,
                  vision_width=128, vision_patch_size=8, context_length=77,
                  vocab_size=49408, transformer_width=64, transformer_heads=2,
                  transformer_layers=2)


def preprocess_sizes(cfg: CLIPConfig):
    return (cfg.image_resolution, cfg.image_resolution)


# ---------------------------------------------------------------- init

def _init_block(key, width: int):
    k = jax.random.split(key, 4)
    s_attn = width ** -0.5
    s_mlp = (4 * width) ** -0.5
    return {
        "ln_1": {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))},
        "attn": {
            "in_proj_weight": s_attn * jax.random.normal(k[0], (width, 3 * width)),
            "in_proj_bias": jnp.zeros((3 * width,)),
            "out_proj_weight": s_attn * jax.random.normal(k[1], (width, width)),
            "out_proj_bias": jnp.zeros((width,)),
        },
        "ln_2": {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))},
        "mlp": {
            "c_fc_weight": s_attn * jax.random.normal(k[2], (width, 4 * width)),
            "c_fc_bias": jnp.zeros((4 * width,)),
            "c_proj_weight": s_mlp * jax.random.normal(k[3], (4 * width, width)),
            "c_proj_bias": jnp.zeros((width,)),
        },
    }


def _stack_blocks(blocks):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init(key, cfg: CLIPConfig = VIT_B_32):
    """Random-init parameter pytree (layout mirrors the torch state_dict
    modulo transposes; see weights/convert_clip.py for the exact mapping)."""
    kv, kt, ke, kp, kc, kpe, ktp = jax.random.split(key, 7)
    w, tw = cfg.vision_width, cfg.transformer_width
    scale_v, scale_t = w ** -0.5, tw ** -0.5
    if cfg.vision_kind == "rn":
        from clip_glass_tpu.models.clip import resnet
        visual = resnet.init(kv, cfg.rn_config())
    else:
        n_tok = cfg.grid ** 2 + 1
        patch_dim = 3 * cfg.vision_patch_size ** 2
        visual = {
            "patch_embed": {"weight": scale_v * jax.random.normal(kc, (patch_dim, w))},
            "class_embedding": scale_v * jax.random.normal(ke, (w,)),
            "positional_embedding": scale_v * jax.random.normal(kp, (n_tok, w)),
            "ln_pre": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "blocks": _stack_blocks([
                _init_block(k, w) for k in jax.random.split(kv, cfg.vision_layers)]),
            "ln_post": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "proj": scale_v * jax.random.normal(ktp, (w, cfg.embed_dim)),
        }
    params = {
        "visual": visual,
        "text": {
            "token_embedding": scale_t * jax.random.normal(ke, (cfg.vocab_size, tw)),
            "positional_embedding": 0.01 * jax.random.normal(kpe, (cfg.context_length, tw)),
            "blocks": _stack_blocks([
                _init_block(k, tw) for k in jax.random.split(kt, cfg.transformer_layers)]),
            "ln_final": {"scale": jnp.ones((tw,)), "bias": jnp.zeros((tw,))},
            "text_projection": scale_t * jax.random.normal(ktp, (tw, cfg.embed_dim)),
        },
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }
    return params


# ---------------------------------------------------------------- forward

# Leaves the forward reads RAW in fp32: LayerNorm scales/biases (layer_norm,
# ops/norms.py:15-22) and logit_scale — the reference's fp16-weights/fp32-LN
# split (reference clip/model.py:152-158). Pre-casting those would lose
# precision; everything else is exact (see core.dtypes.precast_params).
PRECAST_EXCLUDE = ("ln_", "bn", "logit_scale")


def precast_params(params, policy: Policy):
    """Stage the frozen CLIP tower for the compute dtype once (exactness +
    rationale: core.dtypes.precast_params; the 12-layer ViT stacks alone
    were ~0.5 ms/step of in-program convert ops as fp32 jit inputs)."""
    from clip_glass_tpu.core.dtypes import precast_params as _pp
    return _pp(params, policy, PRECAST_EXCLUDE)


def _block_forward(x, bp, n_head: int, mask: Optional[jnp.ndarray], policy: Policy):
    """Pre-LN residual attention block (reference clip/model.py:164-187)."""
    h = layer_norm(x, bp["ln_1"]["scale"], bp["ln_1"]["bias"])
    h = multi_head_attention(
        policy.cast_compute(h),
        bp["attn"]["in_proj_weight"], bp["attn"]["in_proj_bias"],
        bp["attn"]["out_proj_weight"], bp["attn"]["out_proj_bias"],
        n_head, mask=mask, policy=policy)
    x = x + h
    h = layer_norm(x, bp["ln_2"]["scale"], bp["ln_2"]["bias"])
    h = policy.cast_compute(h)
    h = h @ policy.cast_compute(bp["mlp"]["c_fc_weight"]) + policy.cast_compute(bp["mlp"]["c_fc_bias"])
    h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU (reference clip/model.py:160-161)
    h = h @ policy.cast_compute(bp["mlp"]["c_proj_weight"]) + policy.cast_compute(bp["mlp"]["c_proj_bias"])
    return x + h


def _transformer(x, blocks, n_head: int, mask, policy: Policy):
    """12 pre-LN blocks over scan-stacked params, under lax.scan.

    Measured probe (flagship trace, pop 16): the scan's `while` trace row
    reads ~1.4 ms/step, but statically unrolling the loop
    (CLIP_GLASS_VIT_UNROLL=1) leaves device time UNCHANGED (40.99 vs
    40.93 ms) — the row is inclusive of small body ops, not loop
    overhead; the tower is already at its latency/bandwidth floor. Scan
    stays the default for the smaller compiled program."""
    if os.environ.get("CLIP_GLASS_VIT_UNROLL") == "1":
        n_blocks = jax.tree_util.tree_leaves(blocks)[0].shape[0]
        for i in range(n_blocks):
            bp = jax.tree_util.tree_map(lambda a: a[i], blocks)
            x = _block_forward(x, bp, n_head, mask, policy)
        return x

    def body(carry, bp):
        return _block_forward(carry, bp, n_head, mask, policy), None

    out, _ = jax.lax.scan(body, x, blocks)
    return out


def encode_image(params, images, cfg: CLIPConfig = VIT_B_32,
                 policy: Policy = FP32) -> jnp.ndarray:
    """images: [B, 3, H, W] floats (the fitness path feeds [0,1] images with
    no CLIP mean/std normalization, exactly like the reference —
    reference generator.py:45 resizes and calls encode_image directly)."""
    if cfg.vision_kind == "rn":
        from clip_glass_tpu.models.clip import resnet
        return resnet.apply(params["visual"], images, cfg.rn_config(), policy)
    v = params["visual"]
    B = images.shape[0]
    P, G = cfg.vision_patch_size, cfg.grid
    x = policy.cast_compute(images)
    # [B,3,H,W] -> [B, G*G, 3*P*P] with (c, ph, pw) flattened in conv-weight order
    x = x.reshape(B, 3, G, P, G, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, G * G, 3 * P * P)
    x = x @ policy.cast_compute(v["patch_embed"]["weight"])

    cls = jnp.broadcast_to(policy.cast_compute(v["class_embedding"]),
                           (B, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + policy.cast_compute(v["positional_embedding"])
    x = layer_norm(x, v["ln_pre"]["scale"], v["ln_pre"]["bias"])
    x = policy.cast_compute(x)

    x = _transformer(x, v["blocks"], cfg.vision_heads, None, policy)

    x = layer_norm(x[:, 0, :], v["ln_post"]["scale"], v["ln_post"]["bias"])
    x = policy.cast_compute(x) @ policy.cast_compute(v["proj"])
    return x


def _causal_mask(n: int, dtype) -> jnp.ndarray:
    # additive -inf above diagonal (reference clip/model.py:293-299)
    return jnp.triu(jnp.full((n, n), -jnp.inf, dtype), k=1)


def encode_text(params, text_ids, cfg: CLIPConfig = VIT_B_32,
                policy: Policy = FP32) -> jnp.ndarray:
    """text_ids: [B, 77] int32 from tokenizers.tokenize; EOT pooling by argmax
    (EOT is the largest id in every sequence — reference clip/model.py:318)."""
    t = params["text"]
    x = policy.cast_compute(t["token_embedding"][text_ids])
    x = x + policy.cast_compute(t["positional_embedding"])
    mask = _causal_mask(cfg.context_length, policy.compute_dtype)
    x = _transformer(x, t["blocks"], cfg.transformer_heads, mask, policy)
    x = layer_norm(x, t["ln_final"]["scale"], t["ln_final"]["bias"])
    eot = jnp.argmax(text_ids, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot]
    return policy.cast_compute(x) @ policy.cast_compute(t["text_projection"])
