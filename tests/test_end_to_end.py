"""End-to-end searches on tiny models (random weights): every config family,
single- and dual-objective, plus the population-sharded multi-device path.
This is the integration contract of the framework: one jitted generation
step evolving an HBM-resident population, scored by generate->CLIP cosine."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.config import get_config
from clip_glass_tpu.evolve.algorithm import minimize
from clip_glass_tpu.fitness.problem import GenerationProblem
from clip_glass_tpu.models.clip import model as clip_model
from clip_glass_tpu.models.stylegan2 import model as sg2
from clip_glass_tpu.models.biggan import model as bg
from clip_glass_tpu.models.gpt2 import model as g2
from clip_glass_tpu.parallel import make_mesh, shard_state

TINY_CLIP = clip_model.TINY
DOG = os.path.join(os.path.dirname(__file__), "..", "examples",
                   "gpt2_images", "dog.jpeg")


def _tiny_sg2_problem(use_d: bool):
    name = "StyleGAN2_ffhq_d" if use_d else "StyleGAN2_ffhq_nod"
    cfg = get_config(name).replace(
        pop_size=8, batch_size=4, dim_z=32, n_var=32,
        weights="random:0", target="a red flower",
        compute_dtype="float32")
    return GenerationProblem(cfg, clip_cfg=TINY_CLIP, model_cfg=sg2.TINY)


def test_fused_random_setup_matches_piecewise(monkeypatch):
    """The one-program random-weight setup (Generator._fused_random_setup)
    produces BITWISE the same clip/G/D/noise trees as the piecewise path
    (CLIP_GLASS_FUSED_SETUP=0) — same key derivations, same precast/pack
    staging — under the production bf16 policy."""
    from clip_glass_tpu.fitness.generator import Generator

    cfg = get_config("StyleGAN2_ffhq_d").replace(
        pop_size=8, batch_size=4, dim_z=32, n_var=32,
        weights="random:0", target="a red flower",
        compute_dtype="bfloat16")
    fused = Generator(cfg, clip_cfg=TINY_CLIP, model_cfg=sg2.TINY)
    monkeypatch.setenv("CLIP_GLASS_FUSED_SETUP", "0")
    piece = Generator(cfg, clip_cfg=TINY_CLIP, model_cfg=sg2.TINY)
    for a, b in [(fused.clip_params, piece.clip_params),
                 (fused.g_params, piece.g_params),
                 (fused.d_params, piece.d_params),
                 (fused.noise, piece.noise),
                 (fused.text_features, piece.text_features)]:
        la = jax.tree_util.tree_leaves_with_path(a)
        lb = jax.tree_util.tree_leaves_with_path(b)
        assert [p for p, _ in la] == [p for p, _ in lb]
        for (_, xa), (_, xb) in zip(la, lb):
            assert xa.dtype == xb.dtype
            np.testing.assert_array_equal(np.asarray(xa, np.float32),
                                          np.asarray(xb, np.float32))


def test_stylegan2_single_objective_search():
    prob = _tiny_sg2_problem(use_d=False)
    algo = prob.make_algorithm()
    res = minimize(algo, n_gen=3, key=jax.random.PRNGKey(0), save_each=3)
    assert res.pop_F.shape == (8, 1)
    assert np.isfinite(res.pop_F).all()
    # fitness is -cosine similarity: must be in [-1, 1]
    assert (np.abs(res.pop_F) <= 1.0 + 1e-5).all()
    assert res.F.shape == (1,)


def test_stylegan2_nsga2_dual_objective_search():
    prob = _tiny_sg2_problem(use_d=True)
    algo = prob.make_algorithm()
    res = minimize(algo, n_gen=3, key=jax.random.PRNGKey(1), save_each=3)
    assert res.pop_F.shape == (8, 2)
    assert np.isfinite(res.pop_F).all()
    assert (res.pop_F[:, 1] >= 0).all()  # hinge = relu(1 - D) >= 0
    assert res.X.ndim == 2  # Pareto set


def test_biggan_mixed_genome_search():
    cfg = get_config("DeepMindBigGAN256").replace(
        pop_size=8, batch_size=8, dim_z=16, num_classes=10, n_var=16 + 10,
        weights="random:0", target="a red flower", compute_dtype="float32",
        resolution=8)
    prob = GenerationProblem(cfg, clip_cfg=TINY_CLIP, model_cfg=bg.TINY)
    algo = prob.make_algorithm()
    res = minimize(algo, n_gen=3, key=jax.random.PRNGKey(2), save_each=3)
    assert res.pop_F.shape == (8, 1)
    assert np.isfinite(res.pop_F).all()
    # bool genes must remain 0/1 through mixed operators
    bools = res.pop_X[:, 16:]
    assert set(np.unique(bools)) <= {0.0, 1.0}


def test_gpt2_img2txt_search():
    cfg = get_config("GPT2").replace(
        pop_size=8, batch_size=8, dim_z=6, n_var=6, max_tokens_len=5,
        weights="random:0", target=DOG, compute_dtype="float32")
    prob = GenerationProblem(cfg, clip_cfg=TINY_CLIP, model_cfg=g2.TINY)
    algo = prob.make_algorithm()
    res = minimize(algo, n_gen=2, key=jax.random.PRNGKey(3), save_each=2)
    assert res.pop_F.shape == (8, 1)
    assert np.isfinite(res.pop_F).all()
    # genomes stay integral in [0, 50256]
    assert (res.pop_X == np.rint(res.pop_X)).all()
    assert res.pop_X.min() >= 0 and res.pop_X.max() <= 50256
    # decode captions like the save path does (reference generator.py:69-72)
    gen = prob.generator.generate(jnp.asarray(res.pop_X))
    texts = prob.generator.decode_texts(np.asarray(gen))
    assert len(texts) == 8
    assert all(len(t) <= 50 for t in texts)


def test_sharded_population_search_runs_on_8_devices():
    assert len(jax.devices()) == 8
    prob = _tiny_sg2_problem(use_d=False)
    algo = prob.make_algorithm()
    mesh = make_mesh()
    state = algo.init(jax.random.PRNGKey(4))
    state = shard_state(state, mesh)
    step = jax.jit(algo.step_fn())
    state = step(state, algo.ctx)
    state = step(state, algo.ctx)
    F = np.asarray(state.F)
    assert F.shape == (8, 1)
    assert np.isfinite(F).all()
    assert int(state.gen) == 2


def test_save_artifacts(tmp_path):
    prob = _tiny_sg2_problem(use_d=False)
    X = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32)), jnp.float32)
    imgs = prob.generator.generate(X)
    assert imgs.shape == (4, 3, 16, 16)
    a = np.asarray(imgs)
    assert a.min() >= 0.0 and a.max() <= 1.0  # biggan_norm output
    out = tmp_path / "grid.jpg"
    prob.generator.save(imgs, str(out))
    assert out.exists() and out.stat().st_size > 0
