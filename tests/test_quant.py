"""Tests for the opt-in int8 quantized fitness mode (ops/quant.py).

Machinery correctness is provable despite quantization being approximate:
with weights on the int8 grid and power-of-2 scales, every step of the int8
path (quantize, int32-accumulate conv, dequantize) is exact in float
arithmetic, so the int8 result must equal the float path bitwise. The
end-to-end tests then check the approximate production contract: calibrated
scale bookkeeping across jit/lax.map traces, finite fitness, and closeness
of the similarity objective on TINY models.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_glass_tpu.config import get_config
from clip_glass_tpu.ops import quant
from clip_glass_tpu.ops import s2d as S
from clip_glass_tpu.ops.modulated_conv import conv2d


def _int_grid_inputs(seed=0, b=2, hw=8, c=64):
    """Weights on the int8 grid * 2^-10 and activations on an integer grid
    * 2^-3, with absmax entries pinned so every scale is exactly a power of
    two (127*2^k / 127 = 2^k) — the whole int8 path is then exact."""
    rng = np.random.default_rng(seed)
    w = rng.integers(-127, 128, size=(3, 3, c, c)).astype(np.float32) * 2**-10
    w[0, 0, 0, :] = 127 * 2**-10
    x = rng.integers(-127, 128, size=(b, hw, hw, c)).astype(np.float32) * 2**-3
    x[0, 0, 0, :] = 127 * 2**-3
    return jnp.asarray(x), jnp.asarray(w)


def _calibrated(fn, *args, min_ch=1, margin=1.0):
    """Run fn once in calibration mode, return (plain_output, scales)."""
    def calib(*a):
        with quant.calibration(min_ch=min_ch) as rec:
            y = fn(*a)
        return y, list(rec)
    y, recs = jax.jit(calib)(*args)
    return np.asarray(y), np.asarray(jax.device_get(recs), np.float64) * margin


def _int8(fn, scales, *args, min_ch=1):
    def g(*a):
        with quant.int8_scope(scales, min_ch=min_ch):
            return fn(*a)
    return np.asarray(jax.jit(g)(*args))


def test_int8_conv2d_exact_on_pow2_grid():
    x, w = _int_grid_inputs()
    plain, scales = _calibrated(conv2d, x, w)
    assert scales.shape == (1,)
    assert scales[0] == 127 * 2**-3  # the pinned absmax
    out = _int8(conv2d, scales, x, w)
    np.testing.assert_array_equal(plain, out)


def test_int8_s2d_fold_exact_on_pow2_grid():
    x, w = _int_grid_inputs(seed=1)
    xs = S.s2d(x)
    fn = lambda xx, ww: S.s2d_conv2d(xx, ww, 0, 0)
    plain, scales = _calibrated(fn, xs, w)
    out = _int8(fn, scales, xs, w)
    np.testing.assert_array_equal(plain, out)


def test_int8_s2d_offset_fold_exact_on_pow2_grid():
    """The [2,2] offset-lattice fold class — the production hot conv."""
    x, w = _int_grid_inputs(seed=2)
    xs = S.s2d(x)
    fn = lambda xx, ww: S.s2d_conv2d(xx, ww, 0, -1)
    plain, scales = _calibrated(fn, xs, w)
    out = _int8(fn, scales, xs, w)
    np.testing.assert_array_equal(plain, out)


def test_eligibility_predicate():
    assert quant.eligible((3, 3, 64, 64), 64)
    assert not quant.eligible((3, 3, 48, 128), 64)  # RGB-class folds stay bf16
    assert not quant.eligible((1, 1, 128, 12), 64)
    assert quant.eligible((2, 2, 128, 128), 64)


def test_saturation_is_finite():
    """Activations far beyond the calibrated range saturate, never NaN/inf."""
    x, w = _int_grid_inputs(seed=3)
    _, scales = _calibrated(conv2d, x, w)
    out = _int8(conv2d, scales, x * 1000.0, w)
    assert np.isfinite(out).all()


def test_scale_exhaustion_raises():
    x, w = _int_grid_inputs(seed=4)
    with pytest.raises(RuntimeError, match="no calibrated scale"):
        _int8(lambda a, b: conv2d(conv2d(a, b), b), np.asarray([1.0]), x, w)


def _tiny_problem(quantize="", **extra):
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.models.clip import model as clip_model
    from clip_glass_tpu.models.stylegan2 import model as sg2
    cfg = get_config("StyleGAN2_ffhq_d").replace(
        weights="random:0", target="a face", pop_size=8, dim_z=32, n_var=32,
        compute_dtype="float32", quantize=quantize, quantize_min_ch=1,
        **extra)
    return GenerationProblem(cfg, clip_cfg=clip_model.TINY,
                             model_cfg=sg2.TINY), cfg


def test_tiny_end_to_end_int8_tracks_float():
    X = jnp.asarray(np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (8, 32))))
    pb_f, _ = _tiny_problem("")
    pb_q, _ = _tiny_problem("int8")
    scales = pb_q.generator._quant_scales
    assert scales is not None and (scales > 0).all()
    F_f = np.asarray(pb_f.eval_fn()(X, pb_f.generator.bundle))
    F_q = np.asarray(pb_q.eval_fn()(X, pb_q.generator.bundle))
    assert np.isfinite(F_q).all()
    # similarity objective (cosine in [-1,1]) stays close; the hinge column
    # is an unbounded random-weight logit, checked relatively
    np.testing.assert_allclose(F_q[:, 0], F_f[:, 0], atol=0.05)
    denom = np.maximum(np.abs(F_f[:, 1]), 1.0)
    assert (np.abs(F_q[:, 1] - F_f[:, 1]) / denom < 0.25).all()


def test_tiny_int8_under_microbatching():
    """The lax.map microbatch body traces inside the int8 scope: the
    quantized chunked evaluation must track the FLOAT chunked evaluation
    the same way the unchunked pair does. (Chunked vs unchunked is NOT an
    equivalence even in float: D's minibatch-std groups are strided across
    whatever batch the evaluation sees, reference stylegan2/modules.py:728.)"""
    X = jnp.asarray(np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (8, 32))))
    pb_f, _ = _tiny_problem("", eval_microbatch=2)
    pb_q, _ = _tiny_problem("int8", eval_microbatch=2)
    F_f = np.asarray(pb_f.eval_fn()(X, pb_f.generator.bundle))
    F_q = np.asarray(pb_q.eval_fn()(X, pb_q.generator.bundle))
    assert np.isfinite(F_q).all()
    np.testing.assert_allclose(F_q[:, 0], F_f[:, 0], atol=0.05)


def test_gpt2_quantize_disables_gracefully():
    """img2txt has no eligible convs: quantize="int8" must not break it."""
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.models.clip import model as clip_model
    from clip_glass_tpu.models.gpt2 import model as g2
    cfg = get_config("GPT2").replace(
        weights="random:0", target="examples/gpt2_images/dog.jpeg",
        pop_size=4, dim_z=6, n_var=6, max_tokens_len=5,
        compute_dtype="float32", quantize="int8")
    pb = GenerationProblem(cfg, clip_cfg=clip_model.TINY, model_cfg=g2.TINY)
    assert pb.generator._quant_scales is None

    # and the fitness is BITWISE the exact-mode fitness: with zero eligible
    # call sites the int8 scope never engages, so "quantized" img2txt is
    # structurally the same program, not merely a close one
    pb_f = GenerationProblem(cfg.replace(quantize=""),
                             clip_cfg=clip_model.TINY, model_cfg=g2.TINY)
    X = jax.random.randint(jax.random.PRNGKey(3), (4, 6), 0, 40)
    F_q = np.asarray(pb.generator.host_eval_population(X, pb.generator.bundle))
    F_f = np.asarray(
        pb_f.generator.host_eval_population(X, pb_f.generator.bundle))
    np.testing.assert_array_equal(F_q, F_f)


def test_int8_full_ga_step():
    """A complete NSGA-II generation step with quantized fitness."""
    pb, cfg = _tiny_problem("int8")
    algo = pb.make_algorithm()
    state = algo.init(jax.random.PRNGKey(0))
    step = jax.jit(algo.step_fn())
    state = step(state)
    assert np.isfinite(np.asarray(state.F)).all()
    assert int(state.gen) == 1

def test_int8_full_ga_step_sharded_equals_single_device():
    """The int8 scope is ambient trace-time state; under pjit on the
    8-virtual-device mesh the batch evaluation traces once through the same
    python path, so the quantized sharded step must reproduce the quantized
    single-device trajectory exactly like the bf16 one does
    (tests/test_parallel.py)."""
    from clip_glass_tpu.parallel.mesh import (
        make_mesh, replicated_sharding, shard_state)

    jax.clear_caches()  # bound the live-executable population (conftest note)
    pb, _ = _tiny_problem("int8")
    algo = pb.make_algorithm()
    state0 = algo.init(jax.random.PRNGKey(11))
    step = jax.jit(algo.step_fn())

    def run(state, ctx, n=2):
        for _ in range(n):
            state = step(state, ctx)
        return np.asarray(state.X), np.asarray(state.F)

    want_X, want_F = run(state0, algo.ctx)
    mesh = make_mesh()
    ctx = jax.device_put(algo.ctx, replicated_sharding(mesh))
    got_X, got_F = run(shard_state(state0, mesh), ctx)
    np.testing.assert_allclose(got_X, want_X, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_F, want_F, rtol=1e-5, atol=1e-6)
