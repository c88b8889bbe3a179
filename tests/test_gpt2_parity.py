"""Parity of the JAX GPT-2 (logits + scan KV-cache decode) vs the reference
torch implementation (gpt2/model.py, gpt2/sample.py) with random weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.dtypes import FP32
from clip_glass_tpu.models.gpt2 import model as jgpt2
from clip_glass_tpu.weights import convert_gpt2

from reference_oracle import add_reference_path, randomize_module

torch = pytest.importorskip("torch")
add_reference_path()

from gpt2.model import GPT2LMHeadModel  # noqa: E402
from gpt2.config import GPT2Config as RefConfig  # noqa: E402
from gpt2 import sample as ref_sample  # noqa: E402

CFG = jgpt2.GPT2Config(vocab_size=5000, n_positions=128, n_embd=96,
                       n_layer=2, n_head=4)


@pytest.fixture(scope="module")
def oracle():
    ref_cfg = RefConfig(vocab_size_or_config_json_file=5000, n_positions=128,
                        n_ctx=128, n_embd=96, n_layer=2, n_head=4)
    m = GPT2LMHeadModel(ref_cfg)
    randomize_module(m, seed=3, std=0.1)
    m.set_tied()  # randomize breaks the tie by copying; re-tie like load_weight
    m.eval()
    params, cfg = convert_gpt2.convert(m.transformer.state_dict(),
                                       jgpt2.GPT2Config(
                                           vocab_size=5000, n_positions=128,
                                           n_embd=96, n_layer=2, n_head=4))
    return m, params, cfg


def test_logits_parity(oracle):
    m, params, cfg = oracle
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 5000, (3, 23)).astype(np.int64)
    with torch.no_grad():
        want, _ = m(torch.from_numpy(ids))
        want = want.numpy()
    got = np.asarray(jax.jit(
        lambda p, t: jgpt2.forward(p, t, cfg, policy=FP32)[0]
    )(params, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cached_decode_matches_full_forward(oracle):
    """KV-cache single-token steps must reproduce the full-context logits."""
    _, params, cfg = oracle
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 5000, (2, 10)), jnp.int32)
    full_logits, _ = jgpt2.forward(params, ids, cfg, policy=FP32)

    H, hd = cfg.n_head, cfg.n_embd // cfg.n_head
    cache = jnp.zeros((cfg.n_layer, 2, 2, H, 10, hd), jnp.float32)
    pre_logits, cache = jgpt2.forward(params, ids[:, :7], cfg, cache, 0, FP32)
    np.testing.assert_allclose(np.asarray(pre_logits),
                               np.asarray(full_logits[:, :7]),
                               rtol=1e-4, atol=1e-4)
    logits = pre_logits
    for t in range(7, 10):
        logits, cache = jgpt2.forward(params, ids[:, t:t + 1], cfg, cache, t, FP32)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full_logits[:, t]),
                                   rtol=1e-4, atol=1e-4)


def test_sample_sequence_argmax_parity(oracle):
    """End-to-end deterministic decode (the CLIP-GLaSS img2txt path:
    temperature 0.7, top_k 40, sample=False -> argmax,
    reference models.py:50-60)."""
    m, params, cfg = oracle
    rng = np.random.default_rng(2)
    ctx = rng.integers(0, 5000, (2, 23)).astype(np.int64)
    want = ref_sample.sample_sequence(
        model=m, length=12, context=torch.from_numpy(ctx), start_token=None,
        batch_size=2, temperature=0.7, top_k=40, device="cpu", sample=False)
    got = np.asarray(jgpt2.sample_sequence(
        params, jnp.asarray(ctx, jnp.int32), 12, cfg,
        temperature=0.7, top_k=40, sample=False, policy=FP32))
    assert got.shape == (2, 35)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_stochastic_sampling_valid(oracle):
    _, params, cfg = oracle
    ctx = jnp.asarray(np.random.default_rng(3).integers(0, 5000, (2, 5)), jnp.int32)
    out = jgpt2.sample_sequence(params, ctx, 8, cfg, temperature=0.7,
                                top_k=40, sample=True,
                                key=jax.random.PRNGKey(1), policy=FP32)
    assert out.shape == (2, 13)
    assert int(out.max()) < 5000 and int(out.min()) >= 0
