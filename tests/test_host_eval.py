"""Host-staged img2txt evaluation (the axon-TPU fallback where pure_callback
is unavailable) must match the callback-based path exactly."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.config import get_config
from clip_glass_tpu.core import backend
from clip_glass_tpu.evolve.algorithm import minimize
from clip_glass_tpu.fitness.problem import GenerationProblem
from clip_glass_tpu.models.clip import model as clip_model
from clip_glass_tpu.models.gpt2 import model as g2

DOG = os.path.join(os.path.dirname(__file__), "..", "examples",
                   "gpt2_images", "dog.jpeg")


@pytest.fixture(scope="module")
def problem():
    cfg = get_config("GPT2").replace(
        pop_size=8, batch_size=8, dim_z=6, n_var=6, max_tokens_len=5,
        weights="random:0", target=DOG, compute_dtype="float32")
    return GenerationProblem(cfg, clip_cfg=clip_model.TINY, model_cfg=g2.TINY)


def test_host_eval_matches_callback_eval(problem):
    gen = problem.generator
    X = jnp.asarray(np.random.default_rng(0).integers(0, 50256, (8, 6)),
                    jnp.float32)
    key = jax.random.PRNGKey(3)
    want = np.asarray(jax.jit(lambda x, b, k: gen.eval_population(x, b, k))(
        X, gen.bundle, key))
    got = np.asarray(gen.host_eval_population(X, gen.bundle, key))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_host_eval_search_runs(problem, monkeypatch):
    """Force the host-staged path (as on the axon backend) end to end."""
    monkeypatch.setattr(backend, "supports_host_callbacks", lambda: False)
    assert problem.generator.needs_host_eval
    algo = problem.make_algorithm()
    assert algo.host_eval
    res = minimize(algo, n_gen=2, key=jax.random.PRNGKey(0), save_each=1)
    assert res.pop_F.shape == (8, 1)
    assert np.isfinite(res.pop_F).all()
    assert int(res.state.gen) == 2


def test_backend_probe_is_bool():
    assert isinstance(backend.supports_host_callbacks(), bool)

def test_host_eval_chunked_pipeline_matches_unchunked():
    """The chunked decode/BPE pipeline (eval_microbatch; all chunks enqueued
    before tokenizing, so host BPE overlaps later chunks' device decode)
    returns the same fitness as the whole-population path for the
    deterministic argmax decode (reference stochastic=False)."""
    cfg = get_config("GPT2").replace(
        pop_size=8, batch_size=8, dim_z=6, n_var=6, max_tokens_len=5,
        weights="random:0", target=DOG, compute_dtype="float32")
    p_full = GenerationProblem(cfg, clip_cfg=clip_model.TINY,
                               model_cfg=g2.TINY)
    p_mb = GenerationProblem(cfg.replace(eval_microbatch=4),
                             clip_cfg=clip_model.TINY, model_cfg=g2.TINY)
    X = jnp.asarray(np.random.default_rng(1).integers(0, 50256, (8, 6)),
                    jnp.float32)
    key = jax.random.PRNGKey(3)
    want = np.asarray(p_full.generator.host_eval_population(
        X, p_full.generator.bundle, key))
    got = np.asarray(p_mb.generator.host_eval_population(
        X, p_mb.generator.bundle, key))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
