"""NVIDIA StyleGAN2 TF checkpoint (.pkl) -> JAX pytree converter.

Equivalent of the reference's `python -m stylegan2.convert_from_tf`
(reference stylegan2/convert_from_tf.py:41-303, download-weights.sh:16-22),
but mapping TF variables DIRECTLY to this framework's layout instead of
round-tripping through torch modules:

- TF conv weights are HWIO = this framework's layout (no permutes);
  fused up-conv kernels get the spatial flip the reference applies at
  convert_from_tf.py:184-185 (composed with our [kh,kw,I,O] layout the
  net transform is jnp.flip(w, (0,1)));
- `mod_bias + 1` (convert_from_tf.py:182/226): TF keeps the style bias
  around 0 with the +1 applied at runtime; reference and this framework
  store bias_init=1 semantics in the bias itself;
- equalized-lr coefficients are folded like every other converter here;
- per-layer noise tensors (`noise0..n`) are captured so converted models can
  reproduce fixed-noise outputs.

The .pkl is unpickled with dnnlib/tflib class stubs (convert_from_tf.py:41-45).
"""

from __future__ import annotations

import math
import pickle
import re
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from clip_glass_tpu.models.stylegan2.model import SG2Config


class TFNetworkStub:
    """Stand-in for dnnlib.tflib.network.Network capturing pickled state."""

    def __setstate__(self, state):
        self.__dict__.update(state)


class _Unpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if "dnnlib" in module:
            return TFNetworkStub
        return super().find_class(module, name)


def load_tf_pickle(path: str):
    """-> (G, D, Gs) TFNetworkStub tuple (NVIDIA pickles store all three)."""
    with open(path, "rb") as f:
        return _Unpickler(f).load()


def _he(shape_fan_in: int, lr_mul: float = 1.0, gain: float = 1.0) -> float:
    return gain / math.sqrt(shape_fan_in) * lr_mul


def _group_by_size(variables) -> Tuple[Dict, Dict]:
    """Split vars into {resolution: {local_name: array}} + toplevel dict."""
    by_size: Dict[int, Dict[str, np.ndarray]] = {}
    top: Dict[str, np.ndarray] = {}
    for name, var in variables:
        m = re.match(r"(\d+)x\d+/(.*)", name)
        if m:
            size = int(m.group(1))
            by_size.setdefault(size, {})[m.group(2)] = np.asarray(var)
        else:
            top[name] = np.asarray(var)
    return by_size, top


def _style(mod_weight: np.ndarray, mod_bias: np.ndarray, latent: int):
    coef = _he(latent)
    return {"w": jnp.asarray(mod_weight.astype(np.float32) * coef),
            "b": jnp.asarray(mod_bias.astype(np.float32) + 1.0)}


def _conv_w(w: np.ndarray, flip: bool = False) -> jnp.ndarray:
    w = w.astype(np.float32)
    fan_in = int(np.prod(w.shape[:-1]))  # kh*kw*I
    w = w * _he(fan_in)
    if flip:
        w = w[::-1, ::-1]
    return jnp.asarray(np.ascontiguousarray(w))


def convert_synthesis_tf(variables, latent_size: int = None) -> Tuple[dict, SG2Config, List]:
    by_size, _ = _group_by_size(variables)
    sizes = sorted(by_size)
    latent = latent_size or by_size[4]["Conv/mod_weight"].shape[0]
    channels = []
    for size in sizes[::-1]:
        key = "Conv/bias" if size == 4 else "Conv1/bias"
        channels.append(int(by_size[size][key].shape[0]))
    cfg = SG2Config(latent_size=latent, channels=tuple(channels))

    params = {"const": jnp.asarray(np.transpose(
        by_size[4]["Const/const"].squeeze(0), (1, 2, 0)).astype(np.float32)),
        "blocks": [], "to_rgb": []}
    noises: List[jnp.ndarray] = []
    for name in sorted((n for n, _ in variables if re.fullmatch(r"noise\d+", n)),
                       key=lambda n: int(n[5:])):
        var = dict(variables)[name]
        noises.append(jnp.asarray(np.asarray(var).squeeze().astype(np.float32)))

    def layer(v, prefix, flip):
        return {
            "w": _conv_w(v[f"{prefix}/weight"], flip=flip),
            "b": jnp.asarray(v[f"{prefix}/bias"].astype(np.float32)),
            "style": _style(v[f"{prefix}/mod_weight"], v[f"{prefix}/mod_bias"], latent),
            "noise_scale": jnp.asarray(np.float32(v[f"{prefix}/noise_strength"])),
        }

    for size in sizes:
        v = by_size[size]
        if size == 4:
            params["blocks"].append({"layers": [layer(v, "Conv", False)]})
        else:
            params["blocks"].append({"layers": [
                layer(v, "Conv0_up", True), layer(v, "Conv1", False)]})
        params["to_rgb"].append({
            "w": _conv_w(v["ToRGB/weight"]),
            "b": jnp.asarray(v["ToRGB/bias"].astype(np.float32)),
            "style": _style(v["ToRGB/mod_weight"], v["ToRGB/mod_bias"], latent),
        })
    return params, cfg, noises


def convert_mapping_tf(variables, cfg: SG2Config) -> dict:
    v = dict(variables)
    n = sum(1 for name in v if re.fullmatch(r"Dense\d+/weight", name))
    dense = []
    for i in range(n):
        w = v[f"Dense{i}/weight"].astype(np.float32)   # [in, out]
        coef = _he(w.shape[0], cfg.mapping_lr_mul)
        dense.append({"w": jnp.asarray(w * coef),
                      "b": jnp.asarray(v[f"Dense{i}/bias"].astype(np.float32)
                                       * cfg.mapping_lr_mul)})
    return {"dense": dense}


def convert_generator_tf(g_state) -> Tuple[dict, SG2Config, List]:
    """TFNetworkStub for G_main -> (params, cfg, noise list)."""
    syn = g_state.components["synthesis"]
    mapping = g_state.components["mapping"]
    syn_params, cfg, noises = convert_synthesis_tf(syn.variables)
    n_map = sum(1 for name, _ in mapping.variables
                if re.fullmatch(r"Dense\d+/weight", name))
    cfg = SG2Config(**{**cfg.__dict__, "mapping_layers": n_map})
    params = {
        "mapping": convert_mapping_tf(mapping.variables, cfg),
        "synthesis": syn_params,
        "dlatent_avg": jnp.asarray(
            dict(g_state.variables)["dlatent_avg"].astype(np.float32)),
    }
    return params, cfg, noises


def convert_discriminator_tf(d_state) -> Tuple[dict, SG2Config]:
    by_size, top = _group_by_size(d_state.variables)
    sizes = sorted(by_size, reverse=True)  # first block = highest res
    channels = []
    for size in sizes:
        key = "Conv/bias" if size == 4 else "Conv0/bias"
        channels.append(int(by_size[size][key].shape[0]))
    mbstd = int(d_state.static_kwargs.get("mbstd_group_size", 4)) \
        if hasattr(d_state, "static_kwargs") else 4
    cfg = SG2Config(channels=tuple(channels), mbstd_group_size=mbstd)

    top_size = sizes[0]
    params = {
        "from_rgb": {"w": _conv_w(by_size[top_size]["FromRGB/weight"]),
                     "b": jnp.asarray(by_size[top_size]["FromRGB/bias"].astype(np.float32))},
        "blocks": [],
    }
    for size in sizes[:-1]:
        v = by_size[size]
        params["blocks"].append({
            "conv0": {"w": _conv_w(v["Conv0/weight"]),
                      "b": jnp.asarray(v["Conv0/bias"].astype(np.float32))},
            "conv1": {"w": _conv_w(v["Conv1_down/weight"]),
                      "b": jnp.asarray(v["Conv1_down/bias"].astype(np.float32))},
            "skip": {"w": _conv_w(v["Skip/weight"])},
        })
    v4 = by_size[4]
    params["final_conv"] = {"w": _conv_w(v4["Conv/weight"]),
                            "b": jnp.asarray(v4["Conv/bias"].astype(np.float32))}
    d0w = v4["Dense0/weight"].astype(np.float32)     # [in, out]
    # TF flattens NCHW=(C,4,4)? NVIDIA D flattens NCHW features; our forward
    # flattens the same order (models/stylegan2 discriminator_apply).
    params["dense0"] = {"w": jnp.asarray(d0w * _he(d0w.shape[0])),
                        "b": jnp.asarray(v4["Dense0/bias"].astype(np.float32))}
    ow = top["Output/weight"].astype(np.float32)
    params["dense1"] = {"w": jnp.asarray(ow * _he(ow.shape[0])),
                        "b": jnp.asarray(top["Output/bias"].astype(np.float32))}
    return params, cfg


def convert_pkl(path: str):
    """-> dict with G/D/Gs params+configs (+ G noise tensors)."""
    nets = load_tf_pickle(path)
    G, D, Gs = nets if isinstance(nets, tuple) else (nets, None, None)
    out = {}
    if G is not None:
        params, cfg, noises = convert_generator_tf(G)
        out["G"] = (params, cfg, noises)
    if D is not None:
        out["D"] = convert_discriminator_tf(D)
    if Gs is not None:
        params, cfg, noises = convert_generator_tf(Gs)
        out["Gs"] = (params, cfg, noises)
    return out
