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

def validate_clip(wdir, out, ref_dir, model_name, fname):
    import numpy as np

    @check(f"clip/{model_name}: sha256")
    def _sha(path):
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

        sd = torch.jit.load(path, map_location="cpu").state_dict()
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

    m = GPT2LMHeadModel(RefConfig())
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

def validate_biggan(wdir, out, ref_dir, name):
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

        params, cfg = convert_biggan.load_torch_checkpoint(path, name)

        rng = np.random.default_rng(5)
        z = np.clip(rng.normal(size=(2, cfg.dim_z)), -2, 2).astype(np.float32)
        cls = np.zeros((2, cfg.n_classes), np.float32)
        cls[0, 207], cls[1, 8] = 1.0, 1.0  # golden retriever, hen
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


# ---------------------------------------------------------------------- main

def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--weights-dir", default=os.path.join(REPO, "weights"))
    p.add_argument("--reference", default="/root/reference",
                   help="reference source tree for torch oracles")
    p.add_argument("--out", default=os.path.join(REPO, "validation_out"))
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")

    validate_clip(args.weights_dir, args.out, args.reference,
                  "ViT-B/32", "ViT-B-32.pt")
    validate_clip(args.weights_dir, args.out, args.reference,
                  "RN50", "RN50.pt")
    validate_gpt2(args.weights_dir, args.out, args.reference)
    for config in ("ffhq-config-f", "car-config-f", "church-config-f"):
        validate_stylegan2(args.weights_dir, args.out, args.reference, config)
    for name in ("biggan-deep-256", "biggan-deep-512"):
        validate_biggan(args.weights_dir, args.out, args.reference, name)

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
