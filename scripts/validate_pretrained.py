#!/usr/bin/env python
"""Pretrained-checkpoint validation harness.

Pointed at a directory of REAL reference checkpoints (the layout produced by
`scripts/download_weights.sh`), this runs, for every family found:

  1. the converter (weights/convert_*.py) — checkpoint -> npz pytree;
  2. numerical parity of the JAX forward vs the reference PyTorch
     implementation (/root/reference or --reference) evaluated on the SAME
     checkpoint — the golden check the random-weight test suite can't do in
     an egress-less environment; and
  3. a reference-comparable rendered artifact per model (images / text) in
     --out, for eyeball comparison against the reference repo's outputs.

Every check degrades to SKIP (not FAIL) when its inputs are absent: missing
checkpoint files, no torch, or no reference source tree. Exit code is 1 iff
any executed check FAILED.

Usage:
  ./scripts/download_weights.sh all            # (a machine with egress)
  python scripts/validate_pretrained.py --weights-dir ./weights

`--synthetic` rehearses the SAME pipeline without egress: it fabricates
reference-format checkpoints (scripts/synthesize_checkpoints.py — small
geometry, exact on-disk layouts), runs every converter through the
convert_weights.py CLI exactly as download_weights.sh would, runs the
torch-oracle parity checks on the fabricated checkpoints, and finally
drives run.py with the converted weights (skip with --no-cli). Any
breakage in the real-weights path shows up here before a user with
egress hits it.

Reference counterparts: download-weights.sh:1-41 (acquisition),
clip/clip.py:24-53 (sha256 gate), and the implicit run-and-look validation
strategy of the reference (SURVEY.md §4).
"""

import argparse
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(1, os.path.join(REPO, "tests"))  # reference_oracle helpers

from clip_glass_tpu.core.backend import pin_platform_from_env  # noqa: E402

# honor an env-pinned platform (JAX_PLATFORMS=cpu) over the TPU plugin's
# startup config override — validation must run anywhere checkpoints live
pin_platform_from_env()

RESULTS = []  # (name, status, detail)


def record(name, status, detail=""):
    RESULTS.append((name, status, detail))
    print(f"[{status:>4s}] {name}" + (f" — {detail}" if detail else ""))


def check(name):
    """Decorator: run the check, record PASS/FAIL/SKIP. A check returns a
    detail string (PASS), or raises Skip/AssertionError."""
    def deco(fn):
        def run(*a, **k):
            try:
                detail = fn(*a, **k)
                record(name, "PASS", detail or "")
            except Skip as e:
                record(name, "SKIP", str(e))
            except Exception as e:
                traceback.print_exc()
                record(name, "FAIL", f"{type(e).__name__}: {e}")
        return run
    return deco


class Skip(Exception):
    pass


def need(path):
    if not os.path.exists(path):
        raise Skip(f"not found: {path}")
    return path


def need_torch():
    try:
        import torch  # noqa: F401
        return torch
    except ImportError:
        raise Skip("torch not installed")


def need_reference(ref_dir):
    if not os.path.isdir(ref_dir):
        raise Skip(f"reference source not found at {ref_dir}")
    import reference_oracle
    reference_oracle.REFERENCE = ref_dir
    return reference_oracle


def cos(a, b):
    import numpy as np
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


# --------------------------------------------------------------------- CLIP

def _load_clip_sd(torch, path):
    """State dict from either official container format: TorchScript archive
    or plain pickle (reference clip/clip.py:60-78 handles both)."""
    try:
        return torch.jit.load(path, map_location="cpu").state_dict()
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        return sd.state_dict() if hasattr(sd, "state_dict") else sd


def validate_clip(wdir, out, ref_dir, model_name, fname, synthetic=False):
    import numpy as np

    @check(f"clip/{model_name}: sha256")
    def _sha(path):
        if synthetic:
            raise Skip("synthetic checkpoint (no official hash)")
        from clip_glass_tpu.models.clip import api
        assert api.verify_checkpoint(path, model_name), "sha256 mismatch"
        return "official hash matched (reference clip/clip.py:45-53)"

    @check(f"clip/{model_name}: convert + torch parity")
    def _parity(path):
        torch = need_torch()
        need_reference(ref_dir)
        from reference_oracle import add_reference_path
        add_reference_path()
        from clip.model import build_model

        from clip_glass_tpu.weights import convert_clip
        params, cfg = convert_clip.load_torch_checkpoint(path)

        sd = _load_clip_sd(torch, path)
        m = build_model(sd).float().eval()  # fp32 oracle (jit=False path)

        import jax
        import jax.numpy as jnp
        from clip_glass_tpu.core.dtypes import FP32
        from clip_glass_tpu.models.clip import model as jclip
        from clip_glass_tpu.tokenizers import tokenize

        rng = np.random.default_rng(0)
        imgs = rng.uniform(0, 1, (2, 3, cfg.image_resolution,
                                  cfg.image_resolution)).astype(np.float32)
        toks = np.asarray(tokenize(["a diagram", "a photo of a cat"]))
        with torch.no_grad():
            want_i = m.encode_image(torch.from_numpy(imgs)).numpy()
            want_t = m.encode_text(torch.from_numpy(toks.astype(np.int64))).numpy()
        got_i = np.asarray(jax.jit(lambda p, x: jclip.encode_image(
            p, x, cfg, FP32))(params, jnp.asarray(imgs)))
        got_t = np.asarray(jax.jit(lambda p, t: jclip.encode_text(
            p, t, cfg, FP32))(params, jnp.asarray(toks)))
        ci, ct = cos(got_i, want_i), cos(got_t, want_t)
        assert ci > 0.999 and ct > 0.999, f"cosine image {ci}, text {ct}"
        return f"embedding cosine: image {ci:.6f}, text {ct:.6f}"

    path = os.path.join(wdir, "clip", fname)
    if not os.path.exists(path):
        record(f"clip/{model_name}", "SKIP", f"not found: {path}")
        return
    _sha(path)
    _parity(path)


# --------------------------------------------------------------------- GPT-2

@check("gpt2: convert + logits/decode parity")
def validate_gpt2(wdir, out, ref_dir):
    import numpy as np
    path = need(os.path.join(wdir, "gpt2", "gpt2-pytorch_model.bin"))
    torch = need_torch()
    need_reference(ref_dir)
    from reference_oracle import add_reference_path
    add_reference_path()
    from gpt2.config import GPT2Config as RefConfig
    from gpt2.model import GPT2LMHeadModel
    from gpt2.utils import load_weight

    import jax
    import jax.numpy as jnp
    from clip_glass_tpu.core.dtypes import FP32
    from clip_glass_tpu.models.gpt2 import model as jgpt2
    from clip_glass_tpu.tokenizers import get_gpt2_tokenizer
    from clip_glass_tpu.weights import convert_gpt2

    params, cfg = convert_gpt2.load_torch_checkpoint(path)

    # oracle geometry from the inferred config (identity for the real 124M
    # checkpoint; lets the synthetic rehearsal run the same code)
    m = GPT2LMHeadModel(RefConfig(n_embd=cfg.n_embd, n_layer=cfg.n_layer,
                                  n_head=cfg.n_head,
                                  n_positions=cfg.n_positions,
                                  n_ctx=cfg.n_positions))
    m = load_weight(m, torch.load(path, map_location="cpu"))
    m.eval()

    enc = get_gpt2_tokenizer()
    ids = np.asarray([enc.encode("The picture of a dog")], np.int64)
    with torch.no_grad():
        want, _ = m(torch.from_numpy(ids))
        want = want.numpy()
    got = np.asarray(jax.jit(lambda p, t: jgpt2.forward(
        p, t, cfg, policy=FP32)[0])(params, jnp.asarray(ids, jnp.int32)))
    err = float(np.max(np.abs(got - want)))
    assert err < 5e-3, f"logits max abs err {err}"

    # deterministic 20-token decode must match the reference argmax loop
    got_seq = np.asarray(jgpt2.sample_sequence(
        params, jnp.asarray(ids, jnp.int32), 20, cfg, sample=False,
        policy=FP32))[0, ids.shape[1]:]
    prev = torch.from_numpy(ids)
    past, outs = None, []
    with torch.no_grad():
        full = torch.from_numpy(ids)
        for _ in range(20):
            logits, past = m(prev, past=past)
            nxt = torch.argmax(logits[:, -1, :], dim=-1, keepdim=True)
            outs.append(int(nxt))
            prev, full = nxt, torch.cat((full, nxt), dim=1)
    assert list(got_seq) == outs, f"decode mismatch: {list(got_seq)} vs {outs}"
    text = enc.decode(list(np.asarray(ids[0])) + outs)
    with open(os.path.join(out, "gpt2_decode.txt"), "w") as f:
        f.write(text + "\n")
    return f"logits max|Δ| {err:.2e}; 20-token argmax decode identical"


# ----------------------------------------------------------------- StyleGAN2

def validate_stylegan2(wdir, out, ref_dir, config):
    import numpy as np

    @check(f"stylegan2/{config}: TF convert + torch parity + render")
    def _run():
        sdir = os.path.join(wdir, "stylegan2", config)
        pkl = os.path.join(sdir, f"stylegan2-{config}.pkl")
        need(sdir)

        import jax
        import jax.numpy as jnp
        from clip_glass_tpu.core.dtypes import FP32
        from clip_glass_tpu.fitness.generator import _read_cfg_sidecar
        from clip_glass_tpu.models.stylegan2 import model as sg2
        from clip_glass_tpu.utils.image import save_grid

        # --- ours: convert (reuse an existing npz conversion if present).
        # Prefer the EMA generator Gs, like the search pipeline does
        # (fitness/generator.py _load_stylegan2_checkpoint) — validating
        # the training snapshot G would eyeball a different network than
        # the one searches serve.
        stem = next((s for s in ("Gs", "G") if os.path.exists(
            os.path.join(sdir, f"{s}.npz"))), None)
        if os.path.exists(pkl):
            # torch + the reference tree are only needed for the pkl
            # conversion/parity; the npz render path below is torch-free
            torch = need_torch()
            need_reference(ref_dir)
            from clip_glass_tpu.weights import convert_stylegan2_tf as tfc
            nets = tfc.convert_pkl(pkl)
            g_params, cfg, noises = nets.get("Gs") or nets["G"]
        elif stem is not None:
            from clip_glass_tpu.core import pytree
            g_params = pytree.restore_lists(pytree.load_npz(
                os.path.join(sdir, f"{stem}.npz")))
            cfg = _read_cfg_sidecar(os.path.join(sdir, f"{stem}.npz"),
                                    sg2.SG2Config)
            if cfg is None:
                raise Skip(f"missing {stem}_cfg.json sidecar")
            with np.load(os.path.join(sdir, f"{stem}_noise.npz")) as data:
                noises = [jnp.asarray(data[k]) for k in
                          sorted(data.files, key=int)]
        else:
            raise Skip(f"no {pkl} or Gs/G npz under {sdir}")

        rng = np.random.default_rng(11)
        z = rng.normal(size=(2, cfg.latent_size)).astype(np.float32)
        noise = [jnp.asarray(n) for n in noises]
        imgs = np.asarray(jax.jit(lambda p, zz: sg2.generator_apply(
            p, zz, cfg, noise=noise, policy=FP32))(g_params, jnp.asarray(z)))

        save_grid(np.clip((imgs + 1) / 2, 0, 1),
                  os.path.join(out, f"stylegan2_{config}.jpg"))

        detail = f"rendered {imgs.shape[-2]}px grid"
        if os.path.exists(pkl):
            # --- oracle: the reference's own converter on the same pickle
            # (reference convert_from_tf.py:48-50, 73-303); the pkl stores
            # (G, D, Gs) — Gs is what download-weights.sh ships for use
            from test_tf_converter import _ref_convert_from_tf
            ref_tf = _ref_convert_from_tf()
            state = ref_tf.load_tf_models_file(pkl)
            gs = state[-1] if isinstance(state, (list, tuple)) else state
            G_t = ref_tf.convert_from_tf(gs).float().eval()
            G_t.static_noise(noise_tensors=[
                torch.from_numpy(np.asarray(n))[None, None] for n in noises])
            G_t.set_truncation(truncation_psi=1.0)
            with torch.no_grad():
                want = G_t(torch.from_numpy(z)).numpy()
            err = float(np.max(np.abs(imgs - want)))
            assert err < 2e-2, f"image max abs err {err}"
            detail += f"; vs reference convert_from_tf max|Δ| {err:.2e}"
        return detail

    _run()


# -------------------------------------------------------------------- BigGAN

def validate_biggan(wdir, out, ref_dir, name, synthetic=False):
    import numpy as np

    @check(f"biggan/{name}: convert + HF-oracle parity + render")
    def _run():
        path = need(os.path.join(wdir, "biggan", f"{name}-pytorch_model.bin"))
        torch = need_torch()

        import jax
        import jax.numpy as jnp
        from clip_glass_tpu.core.dtypes import FP32
        from clip_glass_tpu.models.biggan import model as bg
        from clip_glass_tpu.utils.image import save_grid
        from clip_glass_tpu.weights import convert_biggan

        # synthetic checkpoints carry small geometry; "auto" reads it off
        # the checkpoint shapes (convert_biggan.infer_config)
        params, cfg = convert_biggan.load_torch_checkpoint(
            path, "auto" if synthetic else name)

        rng = np.random.default_rng(5)
        z = np.clip(rng.normal(size=(2, cfg.z_dim)), -2, 2).astype(np.float32)
        cls = np.zeros((2, cfg.num_classes), np.float32)
        # golden retriever, hen (clamped for small synthetic class tables)
        cls[0, min(207, cfg.num_classes - 1)] = 1.0
        cls[1, min(8, cfg.num_classes - 1)] = 1.0
        imgs = np.asarray(jax.jit(lambda p, zz, cc: bg.apply(
            p, zz, cc, 1.0, cfg, FP32))(params, jnp.asarray(z),
                                        jnp.asarray(cls)))
        # bg.apply returns NCHW [-1,1]; save_grid consumes NCHW [0,1]
        save_grid(np.clip((imgs + 1) / 2, 0, 1),
                  os.path.join(out, f"biggan_{name}.jpg"))
        detail = f"rendered {imgs.shape[-1]}px grid"

        # oracle: the transcribed HF implementation (tests/biggan_hf_oracle
        # — exact package module tree/names) loaded with the REAL checkpoint
        import biggan_hf_oracle as oracle
        m = oracle.build_oracle(
            torch.load(path, map_location="cpu", weights_only=False), cfg)
        with torch.no_grad():
            want = m(torch.from_numpy(z), torch.from_numpy(cls), 1.0).numpy()
        err = float(np.max(np.abs(imgs - want)))
        assert err < 2e-2, f"image max abs err {err}"
        detail += f"; vs transcribed HF oracle max|Δ| {err:.2e}"
        return detail

    _run()


# ------------------------------------------------------------ metric models

@check("lpips/VGG16: convert + torch-oracle parity")
def validate_lpips(wdir, out):
    """The LPIPS checkpoint pair (torchvision vgg16 zoo file + richzhang
    v0.1 linear heads) through convert -> npz -> forward, against a torch
    oracle computed STRAIGHT from the on-disk state dicts following the
    reference slice walk (external_models/lpips.py:60-78)."""
    import numpy as np
    vgg = need(os.path.join(wdir, "metrics", "vgg16-397923af.pth"))
    lin = need(os.path.join(wdir, "metrics", "lpips_vgg_v0.1.pth"))
    npz = need(os.path.join(wdir, "metrics", "lpips_vgg16.npz"))
    torch = need_torch()
    import torch.nn.functional as Fnn

    import jax
    import jax.numpy as jnp
    from clip_glass_tpu.metrics import lpips as jlp

    params = jlp.load_npz(npz)
    rng = np.random.default_rng(7)
    x0 = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    x1 = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    got = np.asarray(jax.jit(jlp.lpips)(params, jnp.asarray(x0),
                                        jnp.asarray(x1)))
    same = np.asarray(jax.jit(jlp.lpips)(params, jnp.asarray(x0),
                                         jnp.asarray(x0)))
    assert np.isfinite(got).all(), "non-finite distances"
    assert (np.abs(same) < 1e-5).all(), f"self-distance nonzero: {same}"

    sd = torch.load(vgg, map_location="cpu", weights_only=False)
    heads = list(torch.load(lin, map_location="cpu",
                            weights_only=False).values())
    shift = torch.tensor([-.030, -.088, -.188]).view(1, -1, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, -1, 1, 1)
    a = (torch.from_numpy(x0) - shift) / scale
    b = (torch.from_numpy(x1) - shift) / scale
    dist = torch.zeros(2)
    with torch.no_grad():
        for (conv_ids, pre_pool), head in zip(jlp._SLICES, heads):
            if pre_pool:
                a, b = Fnn.max_pool2d(a, 2, 2), Fnn.max_pool2d(b, 2, 2)
            for ci in conv_ids:
                w = sd[f"features.{ci}.weight"]
                bias = sd[f"features.{ci}.bias"]
                a = Fnn.relu(Fnn.conv2d(a, w, bias, padding=1))
                b = Fnn.relu(Fnn.conv2d(b, w, bias, padding=1))
            na = a * torch.rsqrt((a ** 2).sum(1, keepdim=True) + 1e-8)
            nb = b * torch.rsqrt((b ** 2).sum(1, keepdim=True) + 1e-8)
            sq = ((na - nb) ** 2).mean(dim=[-1, -2])
            dist = dist + (sq * head.view(1, -1)).sum(1)
    err = float(np.max(np.abs(got - dist.numpy())))
    assert err < 1e-4, f"lpips max abs err {err}"
    return (f"self-distance 0, vs state-dict torch oracle "
            f"max|Δ| {err:.2e}")


@check("inception/pytorch-fid: convert + BN-fold parity + features")
def validate_inception(wdir, out):
    """The pytorch-fid inception checkpoint through convert -> npz ->
    full-feature forward, with the stem conv+BN numerically checked
    against torch evaluating the RAW on-disk arrays (the converter's BN
    fold, eps 1e-3, reference external_models/inception.py:134-158)."""
    import numpy as np
    pth = need(os.path.join(wdir, "metrics",
                            "pt_inception-2015-12-05-6726825d.pth"))
    npz = need(os.path.join(wdir, "metrics", "inception.npz"))
    torch = need_torch()
    import torch.nn.functional as Fnn

    import jax
    import jax.numpy as jnp
    from clip_glass_tpu.metrics import inception as jinc

    params = jinc.load_npz(npz)
    rng = np.random.default_rng(9)
    imgs = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    feats = np.asarray(jax.jit(lambda p, x: jinc.features(p, x))(
        params, jnp.asarray(imgs)))
    assert feats.shape == (2, 2048), f"features shape {feats.shape}"
    assert np.isfinite(feats).all(), "non-finite features"

    # stem conv+BN oracle from the file's own arrays
    sd = torch.load(pth, map_location="cpu", weights_only=False)
    x = rng.normal(0, 1, (1, 3, 33, 33)).astype(np.float32)
    with torch.no_grad():
        y = Fnn.conv2d(torch.from_numpy(x), sd["Conv2d_1a_3x3.conv.weight"],
                       stride=2)
        y = Fnn.batch_norm(y, sd["Conv2d_1a_3x3.bn.running_mean"],
                           sd["Conv2d_1a_3x3.bn.running_var"],
                           sd["Conv2d_1a_3x3.bn.weight"],
                           sd["Conv2d_1a_3x3.bn.bias"], eps=1e-3)
        want = Fnn.relu(y).numpy()                        # NCHW
    got = np.asarray(jinc._conv_bn(
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),      # NHWC
        params["Conv2d_1a_3x3"], stride=2))
    err = float(np.max(np.abs(np.transpose(got, (0, 3, 1, 2)) - want)))
    assert err < 1e-4, f"stem conv+BN max abs err {err}"
    return (f"[2,2048] features finite; stem BN-fold vs torch "
            f"max|Δ| {err:.2e}")


# --------------------------------------------------- converter CLI rehearsal

def run_convert_cli(wdir, synthetic=False):
    """Run scripts/convert_weights.py on every checkpoint present, with the
    EXACT invocations download_weights.sh issues (download_weights.sh:105-155)
    — so any drift between the converters and the shipped acquisition script
    fails here."""
    import subprocess
    cw = os.path.join(REPO, "scripts", "convert_weights.py")

    def cli(label, argv, src):
        @check(f"convert CLI: {label}")
        def _run():
            need(src)
            r = subprocess.run([sys.executable, cw] + argv,
                               capture_output=True, text=True, timeout=600)
            assert r.returncode == 0, f"rc {r.returncode}: {r.stderr[-800:]}"
            return (r.stdout.strip().splitlines() or ["ok"])[-1]
        _run()

    clip_dir = os.path.join(wdir, "clip")
    cli("clip ViT-B/32",
        ["clip", os.path.join(clip_dir, "ViT-B-32.pt"),
         os.path.join(clip_dir, "ViT-B-32.npz")],
        os.path.join(clip_dir, "ViT-B-32.pt"))
    cli("clip RN50",
        ["clip", os.path.join(clip_dir, "RN50.pt"),
         os.path.join(clip_dir, "RN50.npz")],
        os.path.join(clip_dir, "RN50.pt"))
    gpt2_bin = os.path.join(wdir, "gpt2", "gpt2-pytorch_model.bin")
    cli("gpt2", ["gpt2", gpt2_bin, os.path.join(wdir, "gpt2", "gpt2.npz")],
        gpt2_bin)
    for config in ("ffhq-config-f", "car-config-f", "church-config-f"):
        pkl = os.path.join(wdir, "stylegan2", config, f"stylegan2-{config}.pkl")
        cli(f"stylegan2-tf {config}",
            ["stylegan2-tf", pkl, os.path.join(wdir, "stylegan2", config)],
            pkl)
    for name in ("biggan-deep-256", "biggan-deep-512"):
        src = os.path.join(wdir, "biggan", f"{name}-pytorch_model.bin")
        cli(f"biggan {name}",
            ["biggan", src, os.path.join(wdir, "biggan", f"{name}.npz"),
             "--model-name", "auto" if synthetic else name],
            src)
    mdir = os.path.join(wdir, "metrics")
    vgg = os.path.join(mdir, "vgg16-397923af.pth")
    cli("lpips vgg16",
        ["lpips", vgg, os.path.join(mdir, "lpips_vgg16.npz"),
         "--linear", os.path.join(mdir, "lpips_vgg_v0.1.pth")],
        vgg)
    pt = os.path.join(mdir, "pt_inception-2015-12-05-6726825d.pth")
    cli("inception pytorch-fid",
        ["inception", pt, os.path.join(mdir, "inception.npz")], pt)


def run_cli_drive(wdir, out):
    """Drive run.py end to end on the CONVERTED weights — one txt2img search
    (StyleGAN2_ffhq_d: G + D objectives, jpg artifacts) and one img2txt
    search (GPT2: caption artifacts) — and assert the full reference
    artifact set lands (reference run.py:79-125)."""
    import subprocess

    def drive(label, argv, folder, artifacts):
        @check(f"CLI drive: {label}")
        def _run():
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "run.py")] + argv,
                capture_output=True, text=True, timeout=1200,
                env={**os.environ, "JAX_PLATFORMS":
                     os.environ.get("JAX_PLATFORMS", "cpu")})
            assert r.returncode == 0, f"rc {r.returncode}: {r.stderr[-800:]}"
            missing = [a for a in artifacts
                       if not os.path.exists(os.path.join(folder, a))]
            assert not missing, f"missing artifacts: {missing}"
            return f"artifacts complete under {folder}"
        _run()

    clip_npz = os.path.join(wdir, "clip", "ViT-B-32.npz")
    sg2_dir = os.path.join(wdir, "stylegan2", "ffhq-config-f")
    folder = os.path.join(out, "cli_sg2")
    if os.path.exists(clip_npz) and os.path.exists(
            os.path.join(sg2_dir, "Gs.npz")):
        drive("StyleGAN2_ffhq_d txt2img",
              ["--config", "StyleGAN2_ffhq_d", "--target", "the face of a man",
               "--weights", sg2_dir, "--clip-weights", clip_npz,
               "--generations", "4", "--save-each", "2", "--pop-size", "8",
               "--tmp-folder", folder],
              folder, ["genetic_result", "F.jpg", "ls_result.npz",
                       "output.jpg", "genetic-it-final.jpg"])
    else:
        record("CLI drive: StyleGAN2_ffhq_d txt2img", "SKIP",
               "converted weights absent")

    gpt2_bin = os.path.join(wdir, "gpt2", "gpt2-pytorch_model.bin")
    demo = os.path.join(REPO, "examples", "gpt2_images")
    imgs = sorted(os.listdir(demo)) if os.path.isdir(demo) else []
    folder = os.path.join(out, "cli_gpt2")
    if os.path.exists(gpt2_bin) and os.path.exists(clip_npz) and imgs:
        drive("GPT2 img2txt",
              ["--config", "GPT2", "--target", os.path.join(demo, imgs[0]),
               "--weights", gpt2_bin, "--clip-weights", clip_npz,
               "--generations", "4", "--save-each", "2", "--pop-size", "8",
               "--tmp-folder", folder],
              folder, ["genetic_result", "ls_result.npz", "output.txt",
                       "genetic-it-final.txt"])
    else:
        record("CLI drive: GPT2 img2txt", "SKIP",
               "converted weights or demo images absent")


# ---------------------------------------------------------------------- main

def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--weights-dir", default=os.path.join(REPO, "weights"))
    p.add_argument("--reference", default="/root/reference",
                   help="reference source tree for torch oracles")
    p.add_argument("--out", default=os.path.join(REPO, "validation_out"))
    p.add_argument("--synthetic", action="store_true",
                   help="fabricate reference-format checkpoints (small "
                        "geometry) into --weights-dir and rehearse the whole "
                        "fetch->convert->load->CLI pipeline without egress")
    p.add_argument("--no-cli", action="store_true",
                   help="skip the end-to-end run.py drive")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")

    if args.synthetic:
        @check("synthesize reference-format checkpoints")
        def _synth():
            import synthesize_checkpoints as sc
            man = sc.synthesize_all(args.weights_dir)
            return f"{len(man)} checkpoints under {args.weights_dir}"
        _synth()

    run_convert_cli(args.weights_dir, synthetic=args.synthetic)

    validate_clip(args.weights_dir, args.out, args.reference,
                  "ViT-B/32", "ViT-B-32.pt", synthetic=args.synthetic)
    validate_clip(args.weights_dir, args.out, args.reference,
                  "RN50", "RN50.pt", synthetic=args.synthetic)
    validate_gpt2(args.weights_dir, args.out, args.reference)
    for config in ("ffhq-config-f", "car-config-f", "church-config-f"):
        validate_stylegan2(args.weights_dir, args.out, args.reference, config)
    for name in ("biggan-deep-256", "biggan-deep-512"):
        validate_biggan(args.weights_dir, args.out, args.reference, name,
                        synthetic=args.synthetic)
    validate_lpips(args.weights_dir, args.out)
    validate_inception(args.weights_dir, args.out)

    if not args.no_cli:
        run_cli_drive(args.weights_dir, args.out)

    print("\n=== summary ===")
    counts = {"PASS": 0, "FAIL": 0, "SKIP": 0}
    for name, status, detail in RESULTS:
        counts[status] += 1
        print(f"  {status:>4s}  {name}")
    print(f"{counts['PASS']} passed, {counts['FAIL']} failed, "
          f"{counts['SKIP']} skipped")
    return 1 if counts["FAIL"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
