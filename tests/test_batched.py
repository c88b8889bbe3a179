"""Multi-search batching (evolve/batched.py): K independent searches in one
compiled program must reproduce K independent `evolve.minimize` runs — the
reference's one-process-per-target semantics (reference run.py:22,70-76),
K at a time."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.config import get_config
from clip_glass_tpu.evolve.algorithm import minimize
from clip_glass_tpu.evolve.batched import (_slice_ctx_of, make_batched,
                                           minimize_batched)
from clip_glass_tpu.fitness.problem import GenerationProblem
from clip_glass_tpu.models.clip import model as jclip

TARGETS = ["a red flower", "a blue car", "an old house"]


def _tiny_sg2_problem(use_d: bool):
    from clip_glass_tpu.models.stylegan2 import model as sg2
    name = "StyleGAN2_ffhq_d" if use_d else "StyleGAN2_ffhq_nod"
    cfg = get_config(name).replace(
        pop_size=8, batch_size=4, dim_z=32, n_var=32, weights="random:0",
        target=TARGETS[0], compute_dtype="float32")
    return GenerationProblem(cfg, clip_cfg=jclip.TINY, model_cfg=sg2.TINY)


def _tiny_gpt2_problem():
    from clip_glass_tpu.models.gpt2 import model as g2
    img_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "gpt2_images")
    targets = [os.path.join(img_dir, "dog.jpeg"),
               os.path.join(img_dir, "goldfish.jpeg")]
    cfg = get_config("GPT2").replace(
        weights="random:0", target=targets[0], pop_size=4, dim_z=6, n_var=6,
        max_tokens_len=5, compute_dtype="float32")
    return GenerationProblem(cfg, clip_cfg=jclip.TINY, model_cfg=g2.TINY), targets


def _independent_runs(problem, balgo, key, n_gen):
    """The oracle: search i run standalone with split(key, K)[i] and the
    same per-search ctx slice."""
    keys = jax.random.split(key, balgo.n_search)
    out = []
    for i in range(balgo.n_search):
        algo = dataclasses.replace(problem.make_algorithm(),
                                   ctx=_slice_ctx_of(balgo.ctx, i))
        out.append(minimize(algo, n_gen=n_gen, key=keys[i]))
    return out


@pytest.mark.parametrize("use_d", [False, True])
def test_batched_equals_independent_searches(use_d):
    prob = _tiny_sg2_problem(use_d)
    balgo = make_batched(prob, TARGETS)
    key = jax.random.PRNGKey(3)
    res_b = minimize_batched(balgo, n_gen=3, key=key, save_each=2)
    assert len(res_b) == len(TARGETS)
    for rb, ri in zip(res_b, _independent_runs(prob, balgo, key, 3)):
        np.testing.assert_allclose(rb.pop_X, ri.pop_X, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(rb.pop_F, ri.pop_F, rtol=1e-4, atol=1e-5)


def test_batched_sharded_search_axis():
    """The search axis is embarrassingly parallel: sharding the batched
    state's leading axis over the 8-device mesh (parallel.shard_state)
    must leave the trajectories unchanged."""
    from clip_glass_tpu.parallel.mesh import (make_mesh, replicated_sharding,
                                              shard_state)

    jax.clear_caches()
    prob = _tiny_sg2_problem(True)
    targets = [f"portrait number {i}" for i in range(8)]
    balgo = make_batched(prob, targets)
    key = jax.random.PRNGKey(5)
    state0 = balgo.init(key)
    step = jax.jit(balgo.step_fn())

    def run(state, ctx, n=2):
        for _ in range(n):
            state = step(state, ctx)
        return np.asarray(state.X), np.asarray(state.F)

    want_X, want_F = run(state0, balgo.ctx)
    mesh = make_mesh()
    # targets shard with the search axis; weights replicate
    ctx = dict(jax.device_put(
        {k: v for k, v in balgo.ctx.items() if k != "target"},
        replicated_sharding(mesh)))
    from jax.sharding import NamedSharding, PartitionSpec as P
    ctx["target"] = jax.device_put(balgo.ctx["target"],
                                   NamedSharding(mesh, P("pop")))
    got_X, got_F = run(shard_state(state0, mesh), ctx)
    np.testing.assert_allclose(got_X, want_X, rtol=1e-6, atol=1e-6)
    # F tolerance is looser than test_parallel's population-sharded case:
    # sharding the SEARCH axis changes the conv batch each device executes
    # (K*pop=64 rows together vs 8 rows per device), and XLA:CPU picks
    # batch-size-dependent reduction strategies — observed only as ~1e-3
    # relative noise on a couple of fitness entries; X trajectories match
    # to 1e-6
    np.testing.assert_allclose(got_F, want_F, rtol=2e-3, atol=1e-5)


def test_batched_img2txt_vmapped_callback():
    """txt decode under the multi-search vmap: the pure_callback BPE round
    trip serializes per search (vmap_method='sequential') inside one jitted
    program and matches independent runs."""
    prob, targets = _tiny_gpt2_problem()
    balgo = make_batched(prob, targets)
    assert not balgo.host_eval  # CPU backend supports pure_callback
    key = jax.random.PRNGKey(7)
    res_b = minimize_batched(balgo, n_gen=2, key=key, save_each=2)
    for rb, ri in zip(res_b, _independent_runs(prob, balgo, key, 2)):
        np.testing.assert_allclose(rb.pop_X, ri.pop_X, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(rb.pop_F, ri.pop_F, rtol=1e-4, atol=1e-5)


def test_batched_img2txt_host_staged_matches_vmapped():
    """The axon-tunnel fallback — host-staged eval with the device decode/
    score batched across searches (Generator.host_eval_population_batched)
    — must produce the same trajectories as the vmapped pure_callback
    path."""
    prob, targets = _tiny_gpt2_problem()
    key = jax.random.PRNGKey(7)
    res_v = minimize_batched(make_batched(prob, targets), n_gen=2, key=key)
    balgo_h = make_batched(prob, targets, force_host_eval=True)
    assert balgo_h.host_eval
    assert balgo_h.host_eval_batched is not None  # deterministic GPT2 config
    res_h = minimize_batched(balgo_h, n_gen=2, key=key)
    for rv, rh in zip(res_v, res_h):
        np.testing.assert_allclose(rh.pop_X, rv.pop_X, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(rh.pop_F, rv.pop_F, rtol=1e-4, atol=1e-5)


def test_auto_search_microbatch_default():
    """Host-staged batched img2txt defaults to the measured decode/BPE
    overlap grouping (largest proper divisor of K; None below 4 or for
    primes — DESIGN.md §11); an explicit value always wins."""
    from clip_glass_tpu.evolve.batched import _auto_search_microbatch as auto
    assert auto(8) == 4 and auto(4) == 2 and auto(6) == 3
    assert auto(9) == 3 and auto(12) == 6 and auto(16) == 8
    for k in (1, 2, 3, 5, 7, 11):
        assert auto(k) is None

    prob, targets = _tiny_gpt2_problem()
    targets = targets * 2                       # K=4 -> auto groups of 2
    b = make_batched(prob, targets, force_host_eval=True)
    assert b.host_eval_batched.search_microbatch == 2
    b = make_batched(prob, targets, force_host_eval=True,
                     search_microbatch=4)
    assert b.host_eval_batched.search_microbatch == 4


def test_batched_img2txt_host_staged_search_microbatch():
    """Host-staged multi-search with search_microbatch: the decode runs in
    groups of smb searches (bounding the KV-cache footprint) with identical
    results; stochastic decode falls back to the per-search loop."""
    prob, targets = _tiny_gpt2_problem()
    targets = targets * 2                       # K=4, smb=2
    key = jax.random.PRNGKey(11)
    full = minimize_batched(
        make_batched(prob, targets, force_host_eval=True), n_gen=2, key=key)
    chunked = minimize_batched(
        make_batched(prob, targets, force_host_eval=True,
                     search_microbatch=2), n_gen=2, key=key)
    for rf, rc in zip(full, chunked):
        np.testing.assert_allclose(rc.pop_X, rf.pop_X, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(rc.pop_F, rf.pop_F, rtol=1e-6, atol=1e-6)

    stoch = GenerationProblem(prob.config.replace(stochastic=True),
                              clip_cfg=jclip.TINY,
                              model_cfg=prob.generator.model_cfg)
    balgo_s = make_batched(stoch, targets, force_host_eval=True)
    assert balgo_s.host_eval_batched is None


def test_batched_int8_matches_single_search_int8():
    """Quantized fitness composes with multi-search batching: the vmapped
    int8 step reproduces each single-search int8 trajectory (the calibrated
    scales are target-independent — targets only enter the final cosine)."""
    from clip_glass_tpu.models.stylegan2 import model as sg2
    cfg = get_config("StyleGAN2_ffhq_d").replace(
        pop_size=8, batch_size=4, dim_z=32, n_var=32, weights="random:0",
        target=TARGETS[0], compute_dtype="float32",
        quantize="int8", quantize_min_ch=1)
    prob = GenerationProblem(cfg, clip_cfg=jclip.TINY, model_cfg=sg2.TINY)
    assert prob.generator._quant_scales is not None
    balgo = make_batched(prob, TARGETS)
    key = jax.random.PRNGKey(9)
    res_b = minimize_batched(balgo, n_gen=2, key=key)
    for rb, ri in zip(res_b, _independent_runs(prob, balgo, key, 2)):
        np.testing.assert_allclose(rb.pop_X, ri.pop_X, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(rb.pop_F, ri.pop_F, rtol=1e-4, atol=1e-5)


def test_cli_multi_target(tmp_path):
    """Repeated --target flags produce one full reference artifact set per
    search under search-<i>/ subfolders."""
    from clip_glass_tpu.cli import main
    rc = main(["--config", "StyleGAN2_ffhq_d", "--target", "a red flower",
               "--target", "a blue car", "--tiny", "--generations", "2",
               "--save-each", "2", "--pop-size", "8",
               "--tmp-folder", str(tmp_path)])
    assert rc == 0
    for i, tgt in enumerate(["a red flower", "a blue car"]):
        d = tmp_path / f"search-{i:02d}"
        for name in ("genetic-it-final.jpg", "genetic_result",
                     "ls_result.npz", "output.jpg", "F.jpg"):
            assert (d / name).exists(), (d, name)
        assert (d / "target.txt").read_text() == tgt
    assert (tmp_path / "ga_state.npz").exists()

def test_search_microbatch_matches_unchunked():
    """search_microbatch (lax.map over search chunks) is pure scheduling:
    trajectories must match the unchunked vmapped batch exactly — searches
    are independent, so unlike eval_microbatch there is no mbstd-grouping
    caveat."""
    prob = _tiny_sg2_problem(True)
    targets = ["a red flower", "a blue car", "an old house", "a green bird"]
    key = jax.random.PRNGKey(13)
    res_full = minimize_batched(make_batched(prob, targets), n_gen=2, key=key)
    res_mb = minimize_batched(
        make_batched(prob, targets, search_microbatch=2), n_gen=2, key=key)
    for rf, rm in zip(res_full, res_mb):
        np.testing.assert_allclose(rm.pop_X, rf.pop_X, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(rm.pop_F, rf.pop_F, rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        make_batched(prob, targets, search_microbatch=3).init(key)
