"""GPT-2 torch checkpoint -> JAX pytree converter.

Handles the HF `gpt2-pytorch_model.bin` layout consumed by the reference
(keys with `.g/.b/.w` suffixes and/or `transformer.` prefixes — the renames
the reference applies in gpt2/utils.py:10-52). Conv1D weights are already
[in, out]; no transposes needed.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from clip_glass_tpu.models.gpt2.model import GPT2Config


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def normalize_keys(sd: Dict) -> Dict:
    """Apply the reference's key renames (gpt2/utils.py:12-28)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("transformer."):
            k = k[len("transformer."):]
        if k.endswith(".g"):
            k = k[:-2] + ".weight"
        elif k.endswith(".b"):
            k = k[:-2] + ".bias"
        elif k.endswith(".w"):
            k = k[:-2] + ".weight"
        out[k] = v
    return out


def infer_config(sd: Dict) -> GPT2Config:
    n_layer = len({k.split(".")[1] for k in sd if k.startswith("h.")})
    vocab, d = _np(sd["wte.weight"]).shape
    n_pos = _np(sd["wpe.weight"]).shape[0]
    return GPT2Config(vocab_size=vocab, n_positions=n_pos, n_embd=d,
                      n_layer=n_layer, n_head=12 if d == 768 else max(2, d // 64))


def convert(sd: Dict, cfg: GPT2Config = None):
    sd = normalize_keys(sd)
    cfg = cfg or infer_config(sd)

    def block(i):
        p = f"h.{i}"
        # squeeze: HF stores Conv1D .w as [1, in, out]
        def w(key):
            a = _np(sd[key])
            return a.reshape(a.shape[-2], a.shape[-1])
        return {
            "ln_1": {"g": jnp.asarray(_np(sd[f"{p}.ln_1.weight"])),
                     "b": jnp.asarray(_np(sd[f"{p}.ln_1.bias"]))},
            "attn": {
                "c_attn_w": jnp.asarray(w(f"{p}.attn.c_attn.weight")),
                "c_attn_b": jnp.asarray(_np(sd[f"{p}.attn.c_attn.bias"])),
                "c_proj_w": jnp.asarray(w(f"{p}.attn.c_proj.weight")),
                "c_proj_b": jnp.asarray(_np(sd[f"{p}.attn.c_proj.bias"])),
            },
            "ln_2": {"g": jnp.asarray(_np(sd[f"{p}.ln_2.weight"])),
                     "b": jnp.asarray(_np(sd[f"{p}.ln_2.bias"]))},
            "mlp": {
                "c_fc_w": jnp.asarray(w(f"{p}.mlp.c_fc.weight")),
                "c_fc_b": jnp.asarray(_np(sd[f"{p}.mlp.c_fc.bias"])),
                "c_proj_w": jnp.asarray(w(f"{p}.mlp.c_proj.weight")),
                "c_proj_b": jnp.asarray(_np(sd[f"{p}.mlp.c_proj.bias"])),
            },
        }

    blocks = [block(i) for i in range(cfg.n_layer)]
    params = {
        "wte": jnp.asarray(_np(sd["wte.weight"])),
        "wpe": jnp.asarray(_np(sd["wpe.weight"])),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_f": {"g": jnp.asarray(_np(sd["ln_f.weight"])),
                 "b": jnp.asarray(_np(sd["ln_f.bias"]))},
    }
    return params, cfg


def load_torch_checkpoint(path: str):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    return convert(sd)
