"""BigGAN-deep HF checkpoint -> JAX pytree converter.

Targets the `pytorch-pretrained-biggan` state-dict layout (the package the
reference pulls weights through, reference models.py:69): spectral-normed
convs/linears stored as `weight_orig`/`weight_u`/`weight_v`, conditional
batch-norm with truncation-indexed running stats (`running_means`
shaped [n_stats, C]). Spectral norm is folded at conversion: eval-time
torch spectral_norm computes W / sigma with sigma = u^T W v from the stored
power-iteration vectors — a constant scale we bake into the weight.

Validated numerically against a transcription of the package's public model
code on synthetic HF-layout checkpoints (tests/biggan_hf_oracle.py +
tests/test_biggan.py), including the spectral-norm sigma folding vs torch's
own spectral_norm computation (SURVEY.md hard part #2).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from clip_glass_tpu.models.biggan.model import CONFIGS, BigGANConfig


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _sn_weight(sd: Dict, prefix: str) -> np.ndarray:
    """Effective spectral-normalized weight W / (u^T W_mat v)."""
    if f"{prefix}.weight_orig" not in sd:
        return _np(sd[f"{prefix}.weight"])
    w = _np(sd[f"{prefix}.weight_orig"])
    u = _np(sd[f"{prefix}.weight_u"])
    v = _np(sd[f"{prefix}.weight_v"])
    w_mat = w.reshape(w.shape[0], -1)
    sigma = float(u @ w_mat @ v)
    return w / sigma


def _sn_linear(sd, prefix, transpose=True):
    w = _sn_weight(sd, prefix)          # [out, in]
    p = {"w": jnp.asarray(w.T if transpose else w)}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return p


def _sn_conv(sd, prefix):
    w = _sn_weight(sd, prefix)          # [O, I, kh, kw]
    p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return p


def _cond_bn(sd, prefix):
    return {
        "running_means": jnp.asarray(_np(sd[f"{prefix}.running_means"])),
        "running_vars": jnp.asarray(_np(sd[f"{prefix}.running_vars"])),
        "scale": _sn_linear(sd, f"{prefix}.scale"),
        "offset": _sn_linear(sd, f"{prefix}.offset"),
    }


def convert(sd: Dict, cfg: BigGANConfig):
    """Full BigGAN state dict (embeddings + generator.*) -> params pytree."""
    g = "generator"
    blocks = []
    li = 0
    n_entries = len(cfg.layers) + 1  # + attention
    for i in range(n_entries):
        p = f"{g}.layers.{i}"
        if f"{p}.gamma" in sd:  # SelfAttn
            blocks.append({"attn": {
                "theta": _sn_conv(sd, f"{p}.snconv1x1_theta"),
                "phi": _sn_conv(sd, f"{p}.snconv1x1_phi"),
                "g": _sn_conv(sd, f"{p}.snconv1x1_g"),
                "o_conv": _sn_conv(sd, f"{p}.snconv1x1_o_conv"),
                "gamma": jnp.asarray(_np(sd[f"{p}.gamma"]).reshape(())),
            }})
        elif f"{p}.conv_0.weight_orig" in sd or f"{p}.conv_0.weight" in sd:
            blocks.append({"block": {
                "bn_0": _cond_bn(sd, f"{p}.bn_0"),
                "conv_0": _sn_conv(sd, f"{p}.conv_0"),
                "bn_1": _cond_bn(sd, f"{p}.bn_1"),
                "conv_1": _sn_conv(sd, f"{p}.conv_1"),
                "bn_2": _cond_bn(sd, f"{p}.bn_2"),
                "conv_2": _sn_conv(sd, f"{p}.conv_2"),
                "bn_3": _cond_bn(sd, f"{p}.bn_3"),
                "conv_3": _sn_conv(sd, f"{p}.conv_3"),
            }})
            li += 1
    return {
        "embeddings": _sn_linear(sd, "embeddings"),  # -> [num_classes, z_dim]
        "gen_z": _sn_linear(sd, f"{g}.gen_z"),
        "blocks": blocks,
        "bn": {
            "running_means": jnp.asarray(_np(sd[f"{g}.bn.running_means"])),
            "running_vars": jnp.asarray(_np(sd[f"{g}.bn.running_vars"])),
            "weight": jnp.asarray(_np(sd[f"{g}.bn.weight"])),
            "bias": jnp.asarray(_np(sd[f"{g}.bn.bias"])),
        },
        "conv_to_rgb": _sn_conv(sd, f"{g}.conv_to_rgb"),
    }


def infer_config(sd: Dict) -> BigGANConfig:
    """Derive the BigGANConfig from the checkpoint's own shapes, using the
    BigGAN-deep structural invariant that GenBlocks alternate plain /
    upsampling within each resolution stage (true of every published
    biggan-deep-{128,256,512} config the reference's
    pytorch_pretrained_biggan package ships): up_i = (i odd). Everything
    else reads off tensor shapes — embeddings [z_dim, num_classes], the
    channel width from the last block's output (out_mult = 1 by
    construction), per-block multipliers from conv_0 in / conv_3 out,
    attention position from the gamma entry's index, n_stats from the
    running-stat tables, output_dim = 4px * 2^(#up blocks)."""
    def w(prefix):
        key = f"{prefix}.weight_orig"
        return _np(sd[key if key in sd else f"{prefix}.weight"])

    z_dim, num_classes = w("embeddings").shape
    g = "generator"
    entries = []          # ("attn", i) | ("block", in_ch, out_ch, i)
    i = 0
    while True:
        p = f"{g}.layers.{i}"
        if f"{p}.gamma" in sd:
            entries.append(("attn", i))
        elif any(k.startswith(f"{p}.conv_0.") for k in sd):
            entries.append(("block", w(f"{p}.conv_0").shape[1],
                            w(f"{p}.conv_3").shape[0], i))
        else:
            break
        i += 1
    blocks = [e for e in entries if e[0] == "block"]
    if not blocks:
        raise ValueError("no generator.layers.N GenBlocks in checkpoint")
    ch = blocks[-1][2]    # last block's out_mult is 1 in every deep config
    layers = []
    for bi, (_, in_ch, out_ch, _i) in enumerate(blocks):
        if in_ch % ch or out_ch % ch:
            raise ValueError(
                f"block {bi} channels ({in_ch}->{out_ch}) not multiples of "
                f"inferred width {ch}")
        layers.append((bi % 2 == 1, in_ch // ch, out_ch // ch))
    attn = [e[1] for e in entries if e[0] == "attn"]
    n_stats = _np(
        sd[f"{g}.layers.{blocks[0][3]}.bn_0.running_means"]).shape[0]
    return BigGANConfig(
        z_dim=z_dim, channel_width=ch, num_classes=num_classes,
        layers=tuple(layers),
        attention_layer_position=attn[0] if attn else 0,
        n_stats=n_stats,
        output_dim=4 * 2 ** sum(up for up, _, _ in layers))


def load_torch_checkpoint(path: str, model_name: str = "biggan-deep-256"):
    """model_name="auto" infers the geometry from the checkpoint itself
    (infer_config) instead of the published-variant table."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    cfg = infer_config(sd) if model_name == "auto" else CONFIGS[model_name]
    return convert(sd, cfg), cfg
