"""Parity of the JAX ModifiedResNet (RN50 vision tower) vs the reference
torch implementation (clip/model.py:9-149), including eval-BN folding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.dtypes import FP32
from clip_glass_tpu.models.clip import resnet as jrn
from clip_glass_tpu.weights import convert_clip_rn

from reference_oracle import add_reference_path, randomize_module

torch = pytest.importorskip("torch")
add_reference_path()
from clip.model import ModifiedResNet  # noqa: E402

CFG = jrn.RNConfig(layers=(1, 1, 1, 1), output_dim=32,
                   input_resolution=32, width=16)


@pytest.fixture(scope="module")
def oracle():
    m = ModifiedResNet(layers=[1, 1, 1, 1], output_dim=32, heads=CFG.heads,
                       input_resolution=32, width=16)
    randomize_module(m, seed=21, std=0.2)
    # randomize BN buffers too, so the scale/bias folding is actually tested
    rng = np.random.default_rng(22)
    with torch.no_grad():
        for name, buf in m.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.from_numpy(rng.normal(0, 0.3, buf.shape).astype(np.float32)))
            elif name.endswith("running_var"):
                buf.copy_(torch.from_numpy(rng.uniform(0.5, 2.0, buf.shape).astype(np.float32)))
    m.eval()
    params = convert_clip_rn.convert(m.state_dict(), CFG)
    return m, params


def test_rn50_parity(oracle):
    m, params = oracle
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (3, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(imgs)).numpy()
    got = np.asarray(jax.jit(
        lambda p, x: jrn.apply(p, x, CFG, FP32))(params, jnp.asarray(imgs)))
    assert got.shape == want.shape == (3, 32)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_rn50_random_init_runs():
    params = jax.jit(lambda k: jrn.init(k, CFG))(jax.random.PRNGKey(0))
    out = jrn.apply(params, jnp.ones((2, 3, 32, 32)), CFG, FP32)
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------- full RN50 CLIP model
# The RN tower wired into the full CLIP surface: config inference from the
# state dict (reference clip/model.py:365-379 build_model dispatch), the
# shared text tower, encode_image dispatch, and the torch-free npz reload.

FULL_KW = dict(embed_dim=64, image_resolution=32, vision_layers=(1, 1, 1, 1),
               vision_width=16, vision_patch_size=None, context_length=77,
               vocab_size=49408, transformer_width=64, transformer_heads=1,
               transformer_layers=2)


@pytest.fixture(scope="module")
def full_rn_clip():
    from clip.model import CLIP
    m = CLIP(**FULL_KW)
    randomize_module(m, seed=31, std=0.1)
    rng = np.random.default_rng(32)
    with torch.no_grad():
        for name, buf in m.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.from_numpy(
                    rng.normal(0, 0.3, buf.shape).astype(np.float32)))
            elif name.endswith("running_var"):
                buf.copy_(torch.from_numpy(
                    rng.uniform(0.5, 2.0, buf.shape).astype(np.float32)))
    return m.float().eval()


def test_rn50_full_clip_infer_convert_parity(full_rn_clip):
    from clip_glass_tpu.models.clip import model as jclip
    from clip_glass_tpu.tokenizers import tokenize
    from clip_glass_tpu.weights import convert_clip

    m = full_rn_clip
    params, cfg = convert_clip.convert(m.state_dict())
    assert cfg.vision_kind == "rn"
    assert cfg.vision_layers == (1, 1, 1, 1)
    assert cfg.vision_width == 16 and cfg.image_resolution == 32
    assert cfg.embed_dim == 64 and cfg.transformer_heads == 1

    rng = np.random.default_rng(5)
    imgs = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    toks = np.asarray(tokenize(["a diagram", "a photo of a cat"]))
    with torch.no_grad():
        want_i = m.encode_image(torch.from_numpy(imgs)).numpy()
        want_t = m.encode_text(torch.from_numpy(toks.astype(np.int64))).numpy()
    got_i = np.asarray(jax.jit(lambda p, x: jclip.encode_image(
        p, x, cfg, FP32))(params, jnp.asarray(imgs)))
    got_t = np.asarray(jax.jit(lambda p, t: jclip.encode_text(
        p, t, cfg, FP32))(params, jnp.asarray(toks)))
    np.testing.assert_allclose(got_i, want_i, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got_t, want_t, rtol=2e-3, atol=2e-3)


def test_rn_clip_random_init_and_npz_roundtrip(tmp_path):
    import dataclasses
    import json

    from clip_glass_tpu.core import pytree
    from clip_glass_tpu.models.clip import model as jclip
    from clip_glass_tpu.weights import convert_clip

    cfg = jclip.CLIPConfig(embed_dim=64, image_resolution=32,
                           vision_layers=(1, 1, 1, 1), vision_width=16,
                           transformer_width=64, transformer_heads=1,
                           transformer_layers=2, vision_kind="rn")
    params = jax.jit(lambda k: jclip.init(k, cfg))(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (2, 3, 32, 32)), jnp.float32)
    out = np.asarray(jclip.encode_image(params, imgs, cfg, FP32))
    assert out.shape == (2, 64) and np.isfinite(out).all()

    # torch-free reload: npz pytree + json sidecar (the convert_weights.py
    # on-disk contract), incl. list->tuple restoration of vision_layers
    path = str(tmp_path / "rn.npz")
    pytree.save_npz(path, params)
    with open(str(tmp_path / "rn_cfg.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f)
    p2, cfg2 = convert_clip.load_npz_checkpoint(path)
    assert cfg2 == cfg
    out2 = np.asarray(jclip.encode_image(p2, imgs, cfg2, FP32))
    np.testing.assert_allclose(out2, out, rtol=1e-6, atol=1e-6)


def test_rn50_flops_accounting():
    from clip_glass_tpu.core import flops
    from clip_glass_tpu.models.clip import model as jclip

    rn = flops.clip_image_flops(jclip.RN50)
    vit = flops.clip_image_flops(jclip.VIT_B_32)
    # CLIP RN50's visual tower is ~2x the ViT-B/32 tower's FLOPs; assert the
    # rn branch is used and lands in a sane band rather than falling through
    assert 5e9 < rn < 2e10
    assert rn != vit
