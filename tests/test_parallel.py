"""Sharding correctness: population dp and CLIP tensor parallelism must be
numerically transparent (GSPMD resharding, no math changes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clip_glass_tpu.core.dtypes import FP32
from clip_glass_tpu.models.clip import model as jclip
from clip_glass_tpu.parallel.mesh import (
    make_mesh,
    population_sharding,
    replicated_sharding,
    shard_clip_tp,
)


@pytest.fixture(autouse=True)
def _fresh_caches():
    """These tests compile full sharded GA steps on the 8-device virtual
    mesh; late in a full-suite process the accumulated live executables
    make the XLA:CPU runtime abort inside execution (observed at
    test_full_ga_step_sharded_equals_single_device; the same tests pass in
    a fresh process). Dropping jit caches before each test keeps the
    executable population bounded — the persistent compile cache makes the
    re-lowering cheap."""
    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def clip_setup():
    params = jax.jit(lambda k: jclip.init(k, jclip.TINY))(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (8, 3, 32, 32)),
                       jnp.float32)
    ref = np.asarray(jax.jit(
        lambda p, x: jclip.encode_image(p, x, jclip.TINY, FP32))(params, imgs))
    return params, imgs, ref


def test_population_sharding_transparent(clip_setup):
    params, imgs, ref = clip_setup
    mesh = make_mesh()
    imgs_sh = jax.device_put(imgs, population_sharding(mesh))
    params_rep = jax.device_put(params, replicated_sharding(mesh))
    out = np.asarray(jax.jit(
        lambda p, x: jclip.encode_image(p, x, jclip.TINY, FP32))(params_rep, imgs_sh))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_clip_tensor_parallel_transparent(clip_setup):
    params, imgs, ref = clip_setup
    devices = jax.devices()
    mesh = Mesh(np.asarray(devices).reshape(4, 2), ("pop", "model"))
    params_tp = shard_clip_tp(params, mesh)
    # MLP weights actually carry the model-axis sharding
    spec = params_tp["visual"]["blocks"]["mlp"]["c_fc_weight"].sharding.spec
    assert "model" in str(spec)
    imgs_sh = jax.device_put(imgs, NamedSharding(mesh, P("pop")))
    out = np.asarray(jax.jit(
        lambda p, x: jclip.encode_image(p, x, jclip.TINY, FP32))(params_tp, imgs_sh))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def _tiny_sg2_problem(use_d: bool):
    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.models.stylegan2 import model as sg2
    name = "StyleGAN2_ffhq_d" if use_d else "StyleGAN2_ffhq_nod"
    cfg = get_config(name).replace(
        pop_size=8, batch_size=4, dim_z=32, n_var=32, weights="random:0",
        target="a red flower", compute_dtype="float32")
    return GenerationProblem(cfg, clip_cfg=jclip.TINY, model_cfg=sg2.TINY)


def _run_steps(step, state, ctx, n=2):
    for _ in range(n):
        state = step(state, ctx)
    return np.asarray(state.X), np.asarray(state.F)


@pytest.mark.parametrize("use_d", [False, True])
def test_full_ga_step_sharded_equals_single_device(use_d):
    """The reference's implicit contract — one device, one answer — asserted
    for the FULL sharded generation step: (X, F) after two GA / NSGA-II
    steps (selection, SBX/PM variation, dedup, fitness, survival) match the
    single-device trajectory, not just shapes/finiteness."""
    from clip_glass_tpu.parallel.mesh import shard_state

    prob = _tiny_sg2_problem(use_d)
    algo = prob.make_algorithm()
    state0 = algo.init(jax.random.PRNGKey(7))
    want_X, want_F = _run_steps(jax.jit(algo.step_fn()), state0, algo.ctx)

    mesh = make_mesh()
    ctx = jax.device_put(algo.ctx, replicated_sharding(mesh))
    got_X, got_F = _run_steps(jax.jit(algo.step_fn()),
                              shard_state(state0, mesh), ctx)
    np.testing.assert_allclose(got_X, want_X, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_F, want_F, rtol=1e-5, atol=1e-6)


def test_full_ga_step_2d_mesh_clip_tp_equals_single_device():
    """Same equivalence on the production 2-D (pop, model) mesh with the
    CLIP scoring tower tensor-parallel (the dryrun_multichip layout)."""
    from clip_glass_tpu.parallel.mesh import clip_tp_spec, shard_state

    prob = _tiny_sg2_problem(True)
    algo = prob.make_algorithm()
    state0 = algo.init(jax.random.PRNGKey(9))
    want_X, want_F = _run_steps(jax.jit(algo.step_fn()), state0, algo.ctx)

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("pop", "model"))
    rep = NamedSharding(mesh, P())
    ctx = {k: jax.device_put(v, rep)
           for k, v in algo.ctx.items() if k != "clip"}
    ctx["clip"] = jax.tree.map(jax.device_put, algo.ctx["clip"],
                               clip_tp_spec(algo.ctx["clip"], mesh))
    state_sh = shard_state(state0, mesh)
    got_X, got_F = _run_steps(jax.jit(algo.step_fn()), state_sh, ctx)
    np.testing.assert_allclose(got_X, want_X, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_F, want_F, rtol=1e-5, atol=1e-6)


def test_biggan_mixed_genome_sharded_equals_single_device():
    """Sharded-vs-single-device (X, F) equality for the BigGAN mixed-genome
    family (real + bool genes through the masked mixed-variable operators)."""
    import os

    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.models.biggan import model as bg
    from clip_glass_tpu.parallel.mesh import shard_state

    cfg = get_config("DeepMindBigGAN256").replace(
        pop_size=8, batch_size=8, dim_z=16, num_classes=10, n_var=16 + 10,
        weights="random:0", target="a red flower", compute_dtype="float32",
        resolution=8)
    prob = GenerationProblem(cfg, clip_cfg=jclip.TINY, model_cfg=bg.TINY)
    algo = prob.make_algorithm()
    state0 = algo.init(jax.random.PRNGKey(2))
    want_X, want_F = _run_steps(jax.jit(algo.step_fn()), state0, algo.ctx)

    mesh = make_mesh()
    ctx = jax.device_put(algo.ctx, replicated_sharding(mesh))
    got_X, got_F = _run_steps(jax.jit(algo.step_fn()),
                              shard_state(state0, mesh), ctx)
    np.testing.assert_allclose(got_X, want_X, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_F, want_F, rtol=1e-5, atol=1e-6)


def test_gpt2_img2txt_host_staged_sharded_equals_single_device():
    """The TPU-production img2txt path — host BPE round trip between two
    jitted programs — under a sharded population: decode partitions along
    pop, host tokenization handles the sharded ids, the CLIP text scoring
    re-enters the mesh with the population sharding, and the results equal
    the single-device trajectory (VERDICT r2 #8)."""
    import os

    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.models.gpt2 import model as g2
    from clip_glass_tpu.parallel.mesh import shard_state

    dog = os.path.join(os.path.dirname(__file__), "..", "examples",
                       "gpt2_images", "dog.jpeg")
    cfg = get_config("GPT2").replace(
        pop_size=8, batch_size=8, dim_z=6, n_var=6, max_tokens_len=5,
        weights="random:0", target=dog, compute_dtype="float32")
    prob = GenerationProblem(cfg, clip_cfg=jclip.TINY, model_cfg=g2.TINY)
    algo = prob.make_algorithm(force_host_eval=True)
    assert algo.host_eval
    state0 = algo.init(jax.random.PRNGKey(3))
    # host-staged step: the jitted halves are built by step_fn internally
    want_X, want_F = _run_steps(algo.step_fn(), state0, algo.ctx)

    mesh = make_mesh()
    ctx = jax.device_put(algo.ctx, replicated_sharding(mesh))
    sh0 = shard_state(state0, mesh)
    got_X, got_F = _run_steps(algo.step_fn(), sh0, ctx)
    np.testing.assert_allclose(got_X, want_X, rtol=0, atol=0)  # int genomes
    np.testing.assert_allclose(got_F, want_F, rtol=1e-5, atol=1e-6)


def test_text_tower_tp_transparent(clip_setup):
    params, _, _ = clip_setup
    ids = np.zeros((4, 77), np.int64)
    ids[:, 0] = 49406
    ids[:, 1] = 42
    ids[:, 2] = 49407
    ref = np.asarray(jclip.encode_text(params, jnp.asarray(ids, jnp.int32),
                                       jclip.TINY, FP32))
    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("pop", "model"))
    params_tp = shard_clip_tp(params, mesh)
    out = np.asarray(jax.jit(
        lambda p, t: jclip.encode_text(p, t, jclip.TINY, FP32))(
            params_tp, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)