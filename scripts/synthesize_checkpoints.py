#!/usr/bin/env python
"""Fabricate reference-format checkpoints with random weights.

Produces, under an output directory, the EXACT on-disk layouts that
`scripts/download_weights.sh` fetches — so the whole
fetch -> convert -> load -> CLI pipeline can be rehearsed end to end in an
environment with no egress (`validate_pretrained.py --synthetic` drives it):

- clip/ViT-B-32.pt, clip/RN50.pt — TorchScript archive (plain pickled
  state dict as fallback when scripting the container fails; both branches
  are real ingestion paths, reference clip/clip.py:60-78) in the OpenAI
  CLIP state-dict layout (reference clip/model.py:363-399)
- gpt2/gpt2-pytorch_model.bin — the legacy HF GPT-2 bin: `.g/.b/.w` key
  suffixes, 2-D Conv1D weights (reference gpt2/utils.py:10-52,
  gpt2/model.py:30-42)
- stylegan2/<config>/stylegan2-<config>.pkl — NVIDIA TF pickle of a
  (G, D, Gs) dnnlib Network triple (reference convert_from_tf.py:48-76)
- biggan/<name>-pytorch_model.bin — the pytorch_pretrained_biggan layout:
  weight_orig/weight_u/weight_v spectral-norm triplets and [n_stats, C]
  running-stat tables (tests/biggan_hf_oracle.py transcription)
- metrics/vgg16-397923af.pth + metrics/lpips_vgg_v0.1.pth — the torchvision
  vgg16 zoo file + richzhang v0.1 linear heads LPIPS downloads (reference
  external_models/lpips.py:36-43)
- metrics/pt_inception-2015-12-05-6726825d.pth — the pytorch-fid FID
  inception checkpoint (reference external_models/inception.py:27)

Geometry is SMALL but structurally complete (every key family the real
checkpoints carry), so the rehearsal runs in CI seconds; full-geometry
numerics are the fullgeom lane's job (tests/test_fullgeom_parity.py).
"""

import argparse
import os
import pickle
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(1, os.path.join(REPO, "tests"))


# ----------------------------------------------------------------- CLIP

def _sd_module(sd):
    """Wrap a flat dotted-key state dict in nested torch modules so the
    whole thing can be TorchScript-saved (the official CLIP checkpoints are
    jit archives whose state_dict() carries the weights)."""
    import torch

    class Holder(torch.nn.Module):
        def forward(self):
            return torch.zeros(1)

    root = Holder()
    for key, val in sd.items():
        parts = key.split(".")
        mod = root
        for p in parts[:-1]:
            child = mod._modules.get(p)
            if child is None:
                child = Holder()
                mod.add_module(p, child)
            mod = child
        mod.register_buffer(parts[-1], val.detach().clone())
    return root


def _save_jit_or_plain(sd, dest):
    import torch
    try:
        torch.jit.save(torch.jit.script(_sd_module(sd)), dest)
        got = torch.jit.load(dest, map_location="cpu").state_dict()
        assert set(got) == set(sd), "jit state-dict roundtrip lost keys"
        return "torchscript"
    except Exception:
        torch.save(sd, dest)
        return "state-dict pickle"


def synth_clip(dest, kind="vit", seed=0):
    """Instantiate the REFERENCE CLIP module at small geometry (random
    init) and save its state dict in the official container format.
    vocab/context stay real (49408/77) so the production tokenizer output
    is in range."""
    import torch

    from reference_oracle import add_reference_path
    add_reference_path()
    from clip.model import CLIP

    torch.manual_seed(seed)
    if kind == "vit":
        m = CLIP(embed_dim=64, image_resolution=64, vision_layers=2,
                 vision_width=64, vision_patch_size=32, context_length=77,
                 vocab_size=49408, transformer_width=64, transformer_heads=1,
                 transformer_layers=2)
    else:  # ModifiedResNet family (RN50 layout)
        m = CLIP(embed_dim=64, image_resolution=64, vision_layers=(1, 1, 1, 1),
                 vision_width=16, vision_patch_size=None, context_length=77,
                 vocab_size=49408, transformer_width=64, transformer_heads=1,
                 transformer_layers=2)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    sd = dict(m.float().state_dict())
    # The reference CLIP never initializes positional_embedding /
    # text_projection (clip/model.py:286,289 torch.empty) — a freshly
    # constructed module carries uninitialized memory there. Re-randomize
    # every float tensor deterministically so the fabricated checkpoint is
    # well-conditioned end to end (running_var kept positive for the RN50
    # batchnorms).
    g = torch.Generator().manual_seed(seed + 1)
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            continue
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        elif k == "logit_scale":
            sd[k] = torch.tensor(2.6593)  # ln(1/0.07), the trained value
        else:
            sd[k] = torch.randn(v.shape, generator=g) * 0.02
    # the official archives carry these scalar entries; build_model
    # (reference clip/model.py:394-395) deletes them unconditionally
    sd["input_resolution"] = torch.tensor(64)
    sd["context_length"] = torch.tensor(77)
    sd["vocab_size"] = torch.tensor(49408)
    return _save_jit_or_plain(sd, dest)


# ----------------------------------------------------------------- GPT-2

def synth_gpt2(dest, n_embd=96, n_layer=2, seed=0):
    """Legacy-bin layout: no `transformer.` prefix (reference
    load_weight's start_model dispatch), LayerNorm entries as `.g/.b`,
    Conv1D weights as 2-D `.w` [in, out]. Real vocab/positions so the
    production BPE ids are in range."""
    import torch
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    d = n_embd
    sd = {"wte.weight": r(50257, d), "wpe.weight": r(1024, d)}
    for i in range(n_layer):
        p = f"h.{i}"
        sd[f"{p}.ln_1.g"] = torch.ones(d)
        sd[f"{p}.ln_1.b"] = torch.zeros(d)
        sd[f"{p}.attn.c_attn.w"] = r(d, 3 * d)
        sd[f"{p}.attn.c_attn.b"] = r(3 * d)
        sd[f"{p}.attn.c_proj.w"] = r(d, d)
        sd[f"{p}.attn.c_proj.b"] = r(d)
        sd[f"{p}.ln_2.g"] = torch.ones(d)
        sd[f"{p}.ln_2.b"] = torch.zeros(d)
        sd[f"{p}.mlp.c_fc.w"] = r(d, 4 * d)
        sd[f"{p}.mlp.c_fc.b"] = r(4 * d)
        sd[f"{p}.mlp.c_proj.w"] = r(4 * d, d)
        sd[f"{p}.mlp.c_proj.b"] = r(d)
    sd["ln_f.g"] = torch.ones(d)
    sd["ln_f.b"] = torch.zeros(d)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    torch.save(sd, dest)


# ------------------------------------------------------------- StyleGAN2

def _dnnlib_network_cls():
    """A class pickled under the dnnlib.tflib.network.Network path, so the
    resulting pkl loads through BOTH our stub unpickler
    (weights/convert_stylegan2_tf.load_tf_pickle) and the reference
    converter's dnnlib import path."""
    mod = sys.modules.get("dnnlib.tflib.network")
    if mod is None or not hasattr(mod, "Network"):
        mod = types.ModuleType("dnnlib.tflib.network")
        Network = type("Network", (), {})
        Network.__module__ = "dnnlib.tflib.network"
        Network.__qualname__ = "Network"
        mod.Network = Network
        sys.modules.setdefault("dnnlib", types.ModuleType("dnnlib"))
        sys.modules.setdefault("dnnlib.tflib", types.ModuleType("dnnlib.tflib"))
        sys.modules["dnnlib.tflib"].network = mod
        sys.modules["dnnlib.tflib.network"] = mod
    return mod.Network


def _net(Network, build_func_name, variables, static_kwargs=None,
         components=None):
    obj = Network()
    obj.__dict__.update({
        "build_func_name": build_func_name,
        "variables": variables,
        "static_kwargs": static_kwargs or {},
        "components": components or {},
    })
    return obj


def synth_stylegan2_pkl(dest, latent=32, channels=(16, 24), seed=0):
    """(G, D, Gs) triple in the NVIDIA TF variable naming: synthesis
    Const/Conv/Conv0_up/Conv1/ToRGB (+ mod_*, noise_strength, noiseN),
    mapping DenseN, discriminator FromRGB/Conv0/Conv1_down/Skip + 4x4
    Conv/Dense0 + Output (reference convert_from_tf.py:73-303 consumes
    exactly these)."""
    rng = np.random.default_rng(seed)

    def r(*shape):
        return rng.normal(0, 0.5, shape).astype(np.float32)

    def conv_vars(prefix, kh, i, o, noise=True):
        v = [(f"{prefix}/weight", r(kh, kh, i, o)),
             (f"{prefix}/bias", r(o)),
             (f"{prefix}/mod_weight", r(latent, i)),
             (f"{prefix}/mod_bias", r(i))]
        if noise:
            v.append((f"{prefix}/noise_strength",
                      np.float32(rng.normal(0, 0.3))))
        return v

    Network = _dnnlib_network_cls()

    def make_g():
        c = list(channels)  # lowest-res first, e.g. (16, 24) -> 4px, 8px
        syn = [("4x4/Const/const", r(1, c[0], 4, 4))]
        syn += conv_vars("4x4/Conv", 3, c[0], c[0])
        syn += conv_vars("4x4/ToRGB", 1, c[0], 3, noise=False)
        res, n_noise = 4, 1
        for bi in range(1, len(c)):
            res *= 2
            syn += conv_vars(f"{res}x{res}/Conv0_up", 3, c[bi - 1], c[bi])
            syn += conv_vars(f"{res}x{res}/Conv1", 3, c[bi], c[bi])
            syn += conv_vars(f"{res}x{res}/ToRGB", 1, c[bi], 3, noise=False)
            n_noise += 2
        nres, noises = 4, []
        noises.append(("noise0", r(1, 1, 4, 4)))
        k = 1
        for bi in range(1, len(c)):
            nres *= 2
            noises.append((f"noise{k}", r(1, 1, nres, nres)))
            noises.append((f"noise{k + 1}", r(1, 1, nres, nres)))
            k += 2
        syn += noises
        mapping = []
        for i in range(2):
            mapping += [(f"Dense{i}/weight", r(latent, latent)),
                        (f"Dense{i}/bias", r(latent))]
        return _net(
            Network, "G_main", [("dlatent_avg", r(latent))],
            static_kwargs={"truncation_psi": 0.5},
            components={
                "mapping": _net(Network, "G_mapping", mapping),
                "synthesis": _net(Network, "G_synthesis_stylegan2", syn)})

    def make_d():
        c = list(channels)[::-1]  # highest-res first
        res = 4 * 2 ** (len(c) - 1)
        d_vars = [(f"{res}x{res}/FromRGB/weight", r(1, 1, 3, c[0])),
                  (f"{res}x{res}/FromRGB/bias", r(c[0]))]
        for bi in range(len(c) - 1):
            d_vars += [(f"{res}x{res}/Conv0/weight", r(3, 3, c[bi], c[bi])),
                       (f"{res}x{res}/Conv0/bias", r(c[bi])),
                       (f"{res}x{res}/Conv1_down/weight",
                        r(3, 3, c[bi], c[bi + 1])),
                       (f"{res}x{res}/Conv1_down/bias", r(c[bi + 1])),
                       (f"{res}x{res}/Skip/weight", r(1, 1, c[bi], c[bi + 1]))]
            res //= 2
        cl = c[-1]
        d_vars += [("4x4/Conv/weight", r(3, 3, cl + 1, cl)),
                   ("4x4/Conv/bias", r(cl)),
                   ("4x4/Dense0/weight", r(cl * 16, cl)),
                   ("4x4/Dense0/bias", r(cl)),
                   ("Output/weight", r(cl, 1)),
                   ("Output/bias", r(1))]
        return _net(Network, "D_stylegan2", d_vars,
                    static_kwargs={"mbstd_group_size": 4})

    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "wb") as f:
        pickle.dump((make_g(), make_d(), make_g()), f)


# --------------------------------------------------------------- BigGAN

def synth_biggan(dest, cfg=None, seed=0):
    """pytorch_pretrained_biggan checkpoint layout via the transcribed HF
    oracle (exact module tree => exact state-dict keys, incl. the
    spectral-norm weight_orig/u/v triplets)."""
    import torch

    import biggan_hf_oracle as oracle
    from clip_glass_tpu.models.biggan import model as bg

    cfg = cfg or bg.TINY
    tm = oracle.make_random_oracle(cfg, seed=seed)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    torch.save(tm.state_dict(), dest)
    return cfg


# ------------------------------------------------------- LPIPS / Inception

def synth_vgg16(dest, div=8, seed=0):
    """torchvision vgg16 zoo-file layout (the file LPIPS's constructor
    downloads, reference external_models/lpips.py:43): `features.{i}.weight/
    bias` for all 13 convs (channels/div geometry — the LPIPS converter and
    forward are shape-polymorphic) plus the classifier head the metric
    never touches (its presence rehearses extra-key tolerance)."""
    import torch

    from clip_glass_tpu.metrics import lpips as jlp

    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    sd = {}
    for idx, cin, cout in jlp._VGG_CFG:
        ci = 3 if cin == 3 else max(cin // div, 1)
        co = max(cout // div, 1)
        sd[f"features.{idx}.weight"] = r(co, ci, 3, 3)
        sd[f"features.{idx}.bias"] = r(co)
    last = max(512 // div, 1)
    dims = [(last * 49, 64), (64, 64), (64, 10)]  # small stand-in head
    for li, (i, o) in zip((0, 3, 6), dims):
        sd[f"classifier.{li}.weight"] = r(o, i)
        sd[f"classifier.{li}.bias"] = r(o)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    torch.save(sd, dest)


def synth_lpips_linear(dest, div=8, seed=0):
    """richzhang v0.1 vgg.pth layout: an ordered dict of 5 per-slice
    `lin{i}.model.1.weight` tensors shaped [1, C, 1, 1] (reference
    external_models/lpips.py:36-56 iterates .values() in file order)."""
    import collections

    import torch

    from clip_glass_tpu.metrics import lpips as jlp

    g = torch.Generator().manual_seed(seed)
    sd = collections.OrderedDict()
    for i, c in enumerate(jlp._SLICE_OUT):
        co = max(c // div, 1)
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, co, 1, 1,
                                                  generator=g) * 0.2
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    torch.save(sd, dest)


def synth_inception(dest, seed=0):
    """pytorch-fid pt_inception checkpoint layout at REAL geometry: every
    BasicConv2d as `<block>[.<branch>].conv.weight` + `.bn.{weight,bias,
    running_mean,running_var,num_batches_tracked}`, plus the fc head
    (fid_inception_v3 is built num_classes=1008, aux_logits=False —
    reference external_models/inception.py:134-158); the converter must
    fold the BN stats and ignore fc/bookkeeping keys."""
    import jax
    import torch

    from clip_glass_tpu.metrics import inception as inc

    rng = np.random.default_rng(seed)
    template = jax.jit(inc.init)(jax.random.PRNGKey(0))
    sd = {}

    def fill(prefix, p):
        kh, kw, ci, co = np.asarray(p["w"]).shape
        t = lambda a: torch.from_numpy(a.astype(np.float32))  # noqa: E731
        sd[f"{prefix}.conv.weight"] = t(rng.normal(0, 0.05, (co, ci, kh, kw)))
        sd[f"{prefix}.bn.weight"] = t(rng.uniform(0.5, 1.5, co))
        sd[f"{prefix}.bn.bias"] = t(rng.normal(0, 0.1, co))
        sd[f"{prefix}.bn.running_mean"] = t(rng.normal(0, 0.1, co))
        sd[f"{prefix}.bn.running_var"] = t(rng.uniform(0.5, 1.5, co))
        sd[f"{prefix}.bn.num_batches_tracked"] = torch.tensor(0)

    for block, sub in template.items():
        if "w" in sub:  # stem conv
            fill(block, sub)
        else:
            for br, p in sub.items():
                fill(f"{block}.{br}", p)
    sd["fc.weight"] = torch.from_numpy(
        rng.normal(0, 0.02, (1008, 2048)).astype(np.float32))
    sd["fc.bias"] = torch.zeros(1008)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    torch.save(sd, dest)


# ------------------------------------------------------------------ main

def synthesize_all(out_dir):
    """Fabricate the full download_weights.sh layout; returns a manifest
    {logical name: path}."""
    man = {}
    p = os.path.join(out_dir, "clip", "ViT-B-32.pt")
    fmt = synth_clip(p, "vit")
    man["clip/ViT-B-32.pt"] = (p, fmt)
    p = os.path.join(out_dir, "clip", "RN50.pt")
    fmt = synth_clip(p, "rn", seed=1)
    man["clip/RN50.pt"] = (p, fmt)
    p = os.path.join(out_dir, "gpt2", "gpt2-pytorch_model.bin")
    synth_gpt2(p)
    man["gpt2/gpt2-pytorch_model.bin"] = (p, "legacy bin")
    p = os.path.join(out_dir, "stylegan2", "ffhq-config-f",
                     "stylegan2-ffhq-config-f.pkl")
    # latent=512: the real config-f latent size, so the converted Gs drives
    # the StyleGAN2_* search configs (dim_z=512 genome) end to end
    synth_stylegan2_pkl(p, latent=512)
    man["stylegan2/ffhq-config-f"] = (p, "tf pkl")
    p = os.path.join(out_dir, "biggan", "biggan-deep-256-pytorch_model.bin")
    synth_biggan(p)
    man["biggan/biggan-deep-256"] = (p, "hf bin (TINY geometry)")
    p = os.path.join(out_dir, "metrics", "vgg16-397923af.pth")
    synth_vgg16(p)
    man["metrics/vgg16 (lpips)"] = (p, "torchvision zoo pth")
    p = os.path.join(out_dir, "metrics", "lpips_vgg_v0.1.pth")
    synth_lpips_linear(p)
    man["metrics/lpips linear v0.1"] = (p, "richzhang pth")
    p = os.path.join(out_dir, "metrics",
                     "pt_inception-2015-12-05-6726825d.pth")
    synth_inception(p)
    man["metrics/pt_inception"] = (p, "pytorch-fid pth (real geometry)")
    return man


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default=os.path.join(REPO, "synthetic_weights"))
    args = ap.parse_args()
    for name, (path, fmt) in synthesize_all(args.out).items():
        print(f"  {name:<32s} {fmt:<18s} -> {path}")
    print("rehearse the real-weights pipeline with:")
    print(f"  python scripts/validate_pretrained.py --synthetic "
          f"--weights-dir {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
