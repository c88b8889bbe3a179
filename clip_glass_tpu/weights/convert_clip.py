"""CLIP torch-state-dict -> JAX pytree converter.

Consumes the eager CLIP state_dict layout (the `build_model` input format,
reference clip/model.py:363-399; key names from reference clip/model.py
module structure). Linear weights are transposed to right-multiply layout;
the patch conv kernel [width, 3, P, P] becomes the [3*P*P, width] patch-embed
matmul matrix (flattening order (c, ph, pw) matches models/clip/model.py's
patch extraction).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from clip_glass_tpu.models.clip.model import CLIPConfig


def infer_config(sd: Dict[str, np.ndarray]) -> CLIPConfig:
    """Infer hyperparameters from state-dict shapes (reference clip/model.py:363-381).

    `visual.positional_embedding` distinguishes the tower families: present
    for ViT, absent for the ModifiedResNet (RN50 family), exactly the
    reference's `build_model` dispatch (clip/model.py:365)."""
    embed_dim = sd["text_projection"].shape[1]
    context_length = sd["positional_embedding"].shape[0]
    vocab_size = sd["token_embedding.weight"].shape[0]
    tw = sd["ln_final.weight"].shape[0]
    t_layers = len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")})
    text = dict(embed_dim=embed_dim, context_length=context_length,
                vocab_size=vocab_size, transformer_width=tw,
                transformer_heads=tw // 64, transformer_layers=t_layers)
    if "visual.positional_embedding" not in sd:
        # ModifiedResNet (reference clip/model.py:371-379)
        counts = tuple(
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}.")})
            for b in (1, 2, 3, 4))
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        spacial = int(round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5))
        return CLIPConfig(image_resolution=spacial * 32, vision_layers=counts,
                          vision_width=vision_width, vision_kind="rn", **text)
    vision_width = sd["visual.conv1.weight"].shape[0]
    patch = sd["visual.conv1.weight"].shape[-1]
    n_tok = sd["visual.positional_embedding"].shape[0]
    grid = int(round((n_tok - 1) ** 0.5))
    vision_layers = len({k.split(".")[3] for k in sd
                        if k.startswith("visual.transformer.resblocks.")})
    return CLIPConfig(
        image_resolution=grid * patch, vision_layers=vision_layers,
        vision_width=vision_width, vision_patch_size=patch, **text)


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _block(sd, prefix: str):
    return {
        "ln_1": {"scale": _np(sd[f"{prefix}.ln_1.weight"]),
                 "bias": _np(sd[f"{prefix}.ln_1.bias"])},
        "attn": {
            "in_proj_weight": _np(sd[f"{prefix}.attn.in_proj_weight"]).T,
            "in_proj_bias": _np(sd[f"{prefix}.attn.in_proj_bias"]),
            "out_proj_weight": _np(sd[f"{prefix}.attn.out_proj.weight"]).T,
            "out_proj_bias": _np(sd[f"{prefix}.attn.out_proj.bias"]),
        },
        "ln_2": {"scale": _np(sd[f"{prefix}.ln_2.weight"]),
                 "bias": _np(sd[f"{prefix}.ln_2.bias"])},
        "mlp": {
            "c_fc_weight": _np(sd[f"{prefix}.mlp.c_fc.weight"]).T,
            "c_fc_bias": _np(sd[f"{prefix}.mlp.c_fc.bias"]),
            "c_proj_weight": _np(sd[f"{prefix}.mlp.c_proj.weight"]).T,
            "c_proj_bias": _np(sd[f"{prefix}.mlp.c_proj.bias"]),
        },
    }


def _stack(blocks):
    import jax
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *blocks)


def convert(sd: Dict[str, np.ndarray], cfg: CLIPConfig = None):
    """torch state dict (tensors or ndarrays) -> (params, cfg)."""
    cfg = cfg or infer_config({k: _np(v) for k, v in sd.items()})
    if cfg.vision_kind == "rn":
        from clip_glass_tpu.weights import convert_clip_rn
        visual = convert_clip_rn.convert(sd, cfg.rn_config(), prefix="visual.")
    else:
        w = cfg.vision_width
        conv = _np(sd["visual.conv1.weight"])  # [w, 3, P, P]
        patch_mat = conv.reshape(w, -1).T      # [3*P*P, w]
        visual = {
            "patch_embed": {"weight": jnp.asarray(patch_mat)},
            "class_embedding": jnp.asarray(_np(sd["visual.class_embedding"])),
            "positional_embedding": jnp.asarray(_np(sd["visual.positional_embedding"])),
            "ln_pre": {"scale": jnp.asarray(_np(sd["visual.ln_pre.weight"])),
                       "bias": jnp.asarray(_np(sd["visual.ln_pre.bias"]))},
            "blocks": _stack([_block(sd, f"visual.transformer.resblocks.{i}")
                              for i in range(cfg.vision_layers)]),
            "ln_post": {"scale": jnp.asarray(_np(sd["visual.ln_post.weight"])),
                        "bias": jnp.asarray(_np(sd["visual.ln_post.bias"]))},
            "proj": jnp.asarray(_np(sd["visual.proj"])),
        }

    params = {
        "visual": visual,
        "text": {
            "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"])),
            "positional_embedding": jnp.asarray(_np(sd["positional_embedding"])),
            "blocks": _stack([_block(sd, f"transformer.resblocks.{i}")
                              for i in range(cfg.transformer_layers)]),
            "ln_final": {"scale": jnp.asarray(_np(sd["ln_final.weight"])),
                         "bias": jnp.asarray(_np(sd["ln_final.bias"]))},
            "text_projection": jnp.asarray(_np(sd["text_projection"])),
        },
        "logit_scale": jnp.asarray(_np(sd["logit_scale"])),
    }
    return params, cfg


def load_npz_checkpoint(path: str):
    """Load an already-converted CLIP npz pytree (+ `<stem>_cfg.json`
    sidecar written by scripts/convert_weights.py). Torch-free load path."""
    import dataclasses
    import json
    import os

    from clip_glass_tpu.core import pytree
    from clip_glass_tpu.models.clip.model import CLIPConfig

    # restore_lists: the RN visual tower stores its bottleneck stages as
    # lists (layer1..layer4); a no-op on the ViT tree
    params = pytree.restore_lists(pytree.load_npz(path))
    with open(os.path.splitext(path)[0] + "_cfg.json") as f:
        d = json.load(f)
    known = {f.name for f in dataclasses.fields(CLIPConfig)}
    return params, CLIPConfig(
        **{k: tuple(v) if isinstance(v, list) else v
           for k, v in d.items() if k in known})


def load_checkpoint(path: str):
    """Dispatch on extension: .npz pytrees load torch-free, anything else
    goes through the torch converter."""
    if path.endswith(".npz"):
        return load_npz_checkpoint(path)
    return load_torch_checkpoint(path)


def load_torch_checkpoint(path: str):
    """Load an OpenAI CLIP checkpoint (TorchScript archive or plain state
    dict, reference clip/clip.py:60-78) and convert."""
    import torch
    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        # weights_only=False: this branch exists for full-pickled models,
        # which torch>=2.6's weights_only default refuses to load (the
        # sibling converters pass it explicitly too)
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    sd = {k: v for k, v in sd.items()
          if not k.startswith("input_resolution") and not k.startswith("context_length")
          and not k.startswith("vocab_size")}
    return convert(sd)
