"""Float parity of the JAX CLIP vs the reference PyTorch CLIP
(reference clip/model.py), both towers, with randomized weights run through
the real converter (weights/convert_clip.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.dtypes import FP32, Policy
from clip_glass_tpu.models.clip import model as jclip
from clip_glass_tpu.weights import convert_clip

from reference_oracle import add_reference_path, randomize_module

torch = pytest.importorskip("torch")

# small-but-real hyperparams: 2 layers keeps the oracle fast on CPU while
# covering every code path (patch embed, cls token, causal mask, EOT pooling)
SMALL = dict(embed_dim=64, image_resolution=64, vision_layers=2,
             vision_width=128, vision_patch_size=16, context_length=77,
             vocab_size=49408, transformer_width=64, transformer_heads=1,
             transformer_layers=2)


@pytest.fixture(scope="module")
def oracle():
    add_reference_path()
    from clip.model import CLIP as TorchCLIP
    m = TorchCLIP(**{
        "embed_dim": SMALL["embed_dim"],
        "image_resolution": SMALL["image_resolution"],
        "vision_layers": SMALL["vision_layers"],
        "vision_width": SMALL["vision_width"],
        "vision_patch_size": SMALL["vision_patch_size"],
        "context_length": SMALL["context_length"],
        "vocab_size": SMALL["vocab_size"],
        "transformer_width": SMALL["transformer_width"],
        "transformer_heads": SMALL["transformer_heads"],
        "transformer_layers": SMALL["transformer_layers"],
    })
    randomize_module(m, seed=7)
    m.eval()
    params, cfg = convert_clip.convert(m.state_dict())
    return m, params, cfg


def test_infer_config(oracle):
    _, _, cfg = oracle
    for k, v in SMALL.items():
        assert getattr(cfg, k) == v, k


def test_encode_image_parity(oracle):
    m, params, cfg = oracle
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (4, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = m.encode_image(torch.from_numpy(imgs)).numpy()
    enc = jax.jit(lambda p, im: jclip.encode_image(p, im, cfg, FP32))
    got = np.asarray(enc(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_encode_text_parity(oracle):
    m, params, cfg = oracle
    rng = np.random.default_rng(1)
    ids = np.zeros((3, 77), np.int64)
    for i, L in enumerate([5, 20, 76]):
        ids[i, 0] = 49406
        ids[i, 1:L] = rng.integers(1, 40000, L - 1)
        ids[i, L] = 49407
    with torch.no_grad():
        want = m.encode_text(torch.from_numpy(ids)).numpy()
    enc = jax.jit(lambda p, t: jclip.encode_text(p, t, cfg, FP32))
    got = np.asarray(enc(params, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_cosine_similarity_parity(oracle):
    """End fitness signal: cosine(image emb, text emb) must track the
    reference closely (this is what the GA actually consumes,
    reference generator.py:51)."""
    m, params, cfg = oracle
    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 1, (4, 3, 64, 64)).astype(np.float32)
    ids = np.zeros((1, 77), np.int64)
    ids[0, 0] = 49406
    ids[0, 1:6] = rng.integers(1, 40000, 5)
    ids[0, 6] = 49407
    with torch.no_grad():
        ti = m.encode_image(torch.from_numpy(imgs))
        tt = m.encode_text(torch.from_numpy(ids))
        want = torch.cosine_similarity(ti, tt).numpy()
    @jax.jit
    def cos(p, im, t):
        ji = jclip.encode_image(p, im, cfg, FP32)
        jt = jclip.encode_text(p, t, cfg, FP32)
        return jnp.sum(ji * jt, -1) / (jnp.linalg.norm(ji, axis=-1) * jnp.linalg.norm(jt, axis=-1))
    got = np.asarray(cos(params, jnp.asarray(imgs), jnp.asarray(ids, jnp.int32)))
    # fp32 reduction-order noise through 2 towers of randomized (std=0.02)
    # weights; real checkpoints give much tighter agreement
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_npz_roundtrip_with_cfg_sidecar(oracle, tmp_path):
    """Converted CLIP params round-trip through the npz + cfg.json sidecar
    format (scripts/convert_weights.py) and reload torch-free via
    convert_clip.load_npz_checkpoint."""
    import dataclasses
    import json

    from clip_glass_tpu.core import pytree

    _, params, cfg = oracle
    path = str(tmp_path / "clip.npz")
    pytree.save_npz(path, params)
    with open(str(tmp_path / "clip_cfg.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f)

    params2, cfg2 = convert_clip.load_npz_checkpoint(path)
    assert cfg2 == cfg
    toks = np.zeros((1, cfg.context_length), np.int32)
    toks[0, 0], toks[0, 1] = 1, 2
    a = jclip.encode_text(params, jnp.asarray(toks), cfg, FP32)
    b = jclip.encode_text(params2, jnp.asarray(toks), cfg2, FP32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_bf16_policy_cosine_close_to_fp32(oracle):
    """bf16 compute must not meaningfully move the fitness signal
    (SURVEY.md hard part #5)."""
    _, params, cfg = oracle
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 3, 64, 64)).astype(np.float32))
    bf16 = Policy(jnp.float32, jnp.bfloat16)
    e32 = np.asarray(jax.jit(lambda p, im: jclip.encode_image(p, im, cfg, FP32))(params, imgs))
    e16 = np.asarray(jax.jit(lambda p, im: jclip.encode_image(p, im, cfg, bf16))(params, imgs), np.float32)
    cos = (e32 * e16).sum(-1) / (np.linalg.norm(e32, axis=-1) * np.linalg.norm(e16, axis=-1))
    assert (cos > 0.995).all()


def test_precast_params_exact(oracle):
    """precast_params staging is EXACT for the forward (bf16(w) is bitwise
    the value the uncast program feeds the same ops) and leaves the fp32-LN
    leaves untouched (reference clip/model.py:152-158 precision split)."""
    _, params, cfg = oracle
    bf16 = Policy(jnp.float32, jnp.bfloat16)
    pc = jclip.precast_params(params, bf16)
    # LN leaves keep fp32 storage and identical values; weights go bf16
    v, vp = params["visual"], pc["visual"]
    assert vp["ln_pre"]["scale"].dtype == jnp.float32
    assert vp["blocks"]["ln_1"]["scale"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(v["ln_post"]["bias"]),
                                  np.asarray(vp["ln_post"]["bias"]))
    assert vp["patch_embed"]["weight"].dtype == jnp.bfloat16
    assert vp["blocks"]["mlp"]["c_fc_weight"].dtype == jnp.bfloat16
    assert pc["logit_scale"].dtype == jnp.float32

    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32))
    a = jax.jit(lambda p, im: jclip.encode_image(p, im, cfg, bf16))(params, imgs)
    b = jax.jit(lambda p, im: jclip.encode_image(p, im, cfg, bf16))(pc, imgs)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))

    toks = np.zeros((2, cfg.context_length), np.int64)
    toks[:, 0], toks[:, 1] = 1, 2
    at = jax.jit(lambda p, t: jclip.encode_text(p, t, cfg, bf16))(params, jnp.asarray(toks))
    bt = jax.jit(lambda p, t: jclip.encode_text(p, t, cfg, bf16))(pc, jnp.asarray(toks))
    np.testing.assert_array_equal(np.asarray(at, np.float32),
                                  np.asarray(bt, np.float32))
