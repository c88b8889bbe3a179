"""On-TPU test lane (`CGT_TEST_PLATFORM=tpu python -m pytest tests/ -m tpu`).

The main suite pins the CPU backend (tests/conftest.py) so population
sharding runs on the 8-device virtual mesh; that leaves TPU-only behavior
(tile layouts, bf16 conv rounding, int8 MXU path, Pallas lowering) covered
only by bench.py and manual CLI runs. This lane runs a small high-leverage
subset on the real chip:

- tiny end-to-end searches for all four model families,
- s2d/s4d execution-domain vs plain-path agreement under the production
  bf16 policy (the domains are exact re-indexings; TPU rounding applies
  equally to both, so they must agree tightly),
- int8 quantized-fitness machinery (quantize/dequantize bitwise round trip
  on the MXU path),
- one serving smoke through SearchServer.

Runtime: a few minutes on a v5e (tiny models, persistent compile cache).
Skipped automatically when the session is CPU-pinned.
"""

import dataclasses
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

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() == "cpu",
        reason="TPU lane: set CGT_TEST_PLATFORM=tpu and run on a TPU host"),
]

TINY_CLIP = clip_model.TINY
DOG = os.path.join(os.path.dirname(__file__), "..", "examples",
                   "gpt2_images", "dog.jpeg")


def _tiny_sg2_problem(use_d: bool, **over):
    name = "StyleGAN2_ffhq_d" if use_d else "StyleGAN2_ffhq_nod"
    cfg = get_config(name).replace(
        pop_size=8, batch_size=4, dim_z=32, n_var=32,
        weights="random:0", target="a red flower",
        compute_dtype="bfloat16", **over)
    return GenerationProblem(cfg, clip_cfg=TINY_CLIP, model_cfg=sg2.TINY)


# ------------------------------------------------------------- e2e searches

def test_e2e_stylegan2_nsga2():
    res = minimize(_tiny_sg2_problem(True).make_algorithm(), n_gen=3,
                   key=jax.random.PRNGKey(0), save_each=3)
    assert res.pop_F.shape == (8, 2)
    assert np.isfinite(res.pop_F).all()
    assert (res.pop_F[:, 1] >= 0).all()


def test_e2e_biggan_mixed_genome():
    cfg = get_config("DeepMindBigGAN256").replace(
        pop_size=8, batch_size=8, dim_z=16, num_classes=10, n_var=26,
        weights="random:0", target="a red flower",
        compute_dtype="bfloat16", resolution=8)
    prob = GenerationProblem(cfg, clip_cfg=TINY_CLIP, model_cfg=bg.TINY)
    res = minimize(prob.make_algorithm(), n_gen=3,
                   key=jax.random.PRNGKey(1), save_each=3)
    assert np.isfinite(res.pop_F).all()
    assert set(np.unique(res.pop_X[:, 16:])) <= {0.0, 1.0}


def test_e2e_gpt2_img2txt():
    cfg = get_config("GPT2").replace(
        pop_size=8, batch_size=8, dim_z=6, n_var=6, max_tokens_len=5,
        weights="random:0", target=DOG, compute_dtype="bfloat16")
    prob = GenerationProblem(cfg, clip_cfg=TINY_CLIP, model_cfg=g2.TINY)
    res = minimize(prob.make_algorithm(), n_gen=2,
                   key=jax.random.PRNGKey(2), save_each=2)
    assert np.isfinite(res.pop_F).all()
    assert (res.pop_X == np.rint(res.pop_X)).all()
    texts = prob.generator.decode_texts(
        np.asarray(prob.generator.generate(jnp.asarray(res.pop_X))))
    assert len(texts) == 8


def test_e2e_clip_rn50_tower():
    """RN50 image tower forward on-chip (the non-default CLIP backbone)."""
    from clip_glass_tpu.models.clip import resnet as rn
    cfg = rn.TINY_RN
    params = rn.init(jax.random.PRNGKey(3), cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(4),
                              (2, 3, cfg.input_resolution,
                               cfg.input_resolution))
    out = jax.jit(lambda p, x: rn.apply(p, x, cfg))(params, imgs)
    assert out.shape == (2, cfg.output_dim)
    assert np.isfinite(np.asarray(out, np.float32)).all()


# --------------------------------------------------- execution-domain parity

def test_s2d_bottleneck_matches_plain_on_tpu():
    """BigGAN s2d bottleneck path vs plain path under bf16 ON THE CHIP:
    the fold builders are value-preserving re-indexings, so TPU layouts
    and bf16 conv rounding must cancel between the two paths."""
    params = bg.init(jax.random.PRNGKey(5), bg.TINY)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(4, bg.TINY.z_dim)),
                    jnp.float32)
    cv = jax.nn.softmax(jnp.asarray(
        np.random.default_rng(1).normal(size=(4, bg.TINY.num_classes))), -1)
    from clip_glass_tpu.core.dtypes import BF16
    plain = jax.jit(lambda p, a, b: bg.apply(
        p, a, b, 1.0, dataclasses.replace(bg.TINY, s2d_min_res=2 ** 30),
        BF16))(params, z, cv)
    s2d = jax.jit(lambda p, a, b: bg.apply(
        p, a, b, 1.0, dataclasses.replace(bg.TINY, s2d_min_res=4),
        BF16))(params, z, cv)
    np.testing.assert_allclose(np.asarray(plain, np.float32),
                               np.asarray(s2d, np.float32),
                               rtol=0, atol=3e-2)  # bf16 ulp-scale, not drift


def test_sg2_s2d_domain_matches_plain_on_tpu():
    """StyleGAN2 fitness through the s2d/s4d execution domain vs the plain
    layout on the chip: same candidates must get near-identical fitness."""
    prob_s2d = _tiny_sg2_problem(False)
    cfg_plain = dataclasses.replace(prob_s2d.generator.model_cfg,
                                    s2d_min_res=2 ** 30)
    prob_plain = GenerationProblem(
        get_config("StyleGAN2_ffhq_nod").replace(
            pop_size=8, batch_size=4, dim_z=32, n_var=32,
            weights="random:0", target="a red flower",
            compute_dtype="bfloat16"),
        clip_cfg=TINY_CLIP, model_cfg=cfg_plain)
    X = jnp.asarray(np.random.default_rng(2).normal(size=(8, 32)),
                    jnp.float32)
    f1 = np.asarray(jax.jit(prob_s2d.eval_fn())(
        X, prob_s2d.generator.bundle, jax.random.PRNGKey(0)), np.float32)
    f2 = np.asarray(jax.jit(prob_plain.eval_fn())(
        X, prob_plain.generator.bundle, jax.random.PRNGKey(0)), np.float32)
    np.testing.assert_allclose(f1, f2, rtol=0, atol=2e-2)


# ----------------------------------------------------------- int8 machinery

def test_int8_conv_exact_integer_arithmetic_on_tpu():
    """The int8 MXU path (ops/quant.conv_hook inside int8_scope) is exact
    integer arithmetic: int8 x int8 -> int32 accumulation on the chip must
    reproduce the same quantized conv computed exactly on the host (sums of
    ~576 products of magnitude <= 127^2 are exact in float64)."""
    from jax import lax
    from clip_glass_tpu.ops import quant

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32))

    def run(a, b, pet):
        return lax.conv_general_dilated(
            a, b, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)

    sx = float(np.abs(np.asarray(x)).max())
    with quant.int8_scope(np.asarray([sx]), min_ch=1):
        got = np.asarray(jax.jit(
            lambda a, b: quant.conv_hook(a, b, run))(x, w), np.float32)

    # exact host replica of the quantization in quant.conv_hook
    w32 = np.asarray(w, np.float64)
    sw = np.maximum(np.abs(w32).max(axis=(0, 1, 2)), 1e-30) / 127.0
    wq = np.clip(np.round(w32 / sw), -127, 127)
    xq = np.clip(np.round(np.asarray(x, np.float64) * (127.0 / sx)),
                 -127, 127)
    xpad = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.zeros((2, 8, 8, 64))
    for i in range(3):
        for j in range(3):
            want += np.einsum("bhwc,cf->bhwf",
                              xpad[:, i:i + 8, j:j + 8, :], wq[i, j])
    want = (want * (sw * (sx / 127.0))[None, None, None, :]).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int8_fitness_runs_and_correlates_on_tpu():
    """int8 quantized fitness on-chip: finite, and rank-correlated with the
    bf16 fitness on the same population (machinery check, not a fidelity
    claim — that's scripts/quant_fidelity.py)."""
    prob16 = _tiny_sg2_problem(False)
    # min_ch lowered so the TINY 16-channel convs actually quantize
    prob8 = _tiny_sg2_problem(False, quantize="int8", quantize_min_ch=8)
    X = jnp.asarray(np.random.default_rng(4).normal(size=(8, 32)),
                    jnp.float32)
    f16 = np.asarray(jax.jit(prob16.eval_fn())(
        X, prob16.generator.bundle, jax.random.PRNGKey(0)), np.float32)[:, 0]
    f8 = np.asarray(jax.jit(prob8.eval_fn())(
        X, prob8.generator.bundle, jax.random.PRNGKey(0)), np.float32)[:, 0]
    assert np.isfinite(f8).all()
    from scipy.stats import spearmanr
    rho = spearmanr(f16, f8).correlation
    assert rho > 0.7, (rho, f16, f8)


# ------------------------------------------------------------- serving smoke

def test_serving_smoke_on_tpu():
    from clip_glass_tpu.serving import SearchServer
    prob = _tiny_sg2_problem(False)
    server = SearchServer(prob, n_slots=2, chunk=2,
                          key=jax.random.PRNGKey(6))
    out = server.map(["a red flower", "a blue bird", "a green tree"],
                     n_gen=4)
    assert len(out) == 3
    assert server.stats.completed == 3
    for r in out:
        assert np.isfinite(r.pop_F).all()
