"""Space-to-depth execution domain (ops/s2d.py): every phase-composed kernel
must be EXACTLY the plain op (reduction order aside), and the s2d synthesis/
discriminator/fitness paths must match the plain paths element-wise.

The s2d domain is the TPU answer to the reference's narrow-channel high-res
levels (reference stylegan2/models.py:744-750: 3-32 channels at 512-1024px);
correctness is defined by the plain path, which is itself torch-oracle-parity
tested in test_stylegan2_parity.py.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.dtypes import FP32
from clip_glass_tpu.models.stylegan2 import model as sg2
from clip_glass_tpu.ops import s2d as S
from clip_glass_tpu.ops.modulated_conv import (
    conv2d,
    conv2d_down,
    modulated_conv2d,
    modulated_conv2d_up,
)
from clip_glass_tpu.ops.resize import resize_bilinear
from clip_glass_tpu.ops.upfirdn import upsample2x


def r(rng, *s):
    return jnp.asarray(rng.normal(size=s), jnp.float32)


B, H, I, O = 2, 16, 6, 5


def test_s2d_roundtrip(rng):
    x = r(rng, B, H, H, I)
    np.testing.assert_array_equal(np.asarray(S.un_s2d(S.s2d(x))), np.asarray(x))


def test_s2d_phase_major_layout(rng):
    x = r(rng, B, H, H, I)
    xs = np.asarray(S.s2d(x))
    xn = np.asarray(x)
    for rr in range(2):
        for cc in range(2):
            np.testing.assert_array_equal(
                xs[:, :, :, (rr * 2 + cc) * I:(rr * 2 + cc + 1) * I],
                xn[:, rr::2, cc::2, :])


@pytest.mark.parametrize("k,demod", [(3, True), (3, False), (1, False)])
def test_s2d_modulated_conv(rng, k, demod):
    x = r(rng, B, H, H, I)
    w = r(rng, k, k, I, O)
    style = r(rng, B, I)
    a = modulated_conv2d(x, w, style, demodulate=demod)
    b = S.un_s2d(S.s2d_modulated_conv2d(S.s2d(x), w, style, demodulate=demod))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_s2d_modulated_conv_up(rng):
    x = r(rng, B, H, H, I)
    w = r(rng, 3, 3, I, O)
    style = r(rng, B, I)
    a = modulated_conv2d_up(x, w, style)
    b = S.un_s2d(S.s2d_modulated_conv2d_up(x, w, style))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("k", [3, 1])
def test_s2d_plain_and_down_convs(rng, k):
    x = r(rng, B, H, H, I)
    w = r(rng, k, k, I, O)
    a = conv2d(x, w)
    b = S.un_s2d(S.s2d_conv2d(S.s2d(x), w))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)
    a = conv2d_down(x, w)
    b = S.s2d_conv2d_down(S.s2d(x), w)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4)


def test_s2d_modulated_conv_up_from_s2d(rng):
    """The s2d(H) -> s2d(2H) up transition (lhs_dilation=2 folded kernel)."""
    x = r(rng, B, H, H, I)
    w = r(rng, 3, 3, I, O)
    style = r(rng, B, I)
    a = modulated_conv2d_up(x, w, style)
    b = S.un_s2d(S.s2d_modulated_conv2d_up(S.s2d(x), w, style,
                                           input_s2d=True))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("k", [3, 1])
def test_s2d_down_to_s2d(rng, k):
    """Down conv landing directly on the next level's s2d lattice."""
    x = r(rng, B, H, H, I)
    w = r(rng, k, k, I, O)
    a = conv2d_down(x, w)
    b = S.un_s2d(S.s2d_conv2d_down(S.s2d(x), w, output_s2d=True))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4)


def test_s2d_upsample2x(rng):
    y = r(rng, B, H, H, 3)
    a = upsample2x(y)
    b = S.un_s2d(S.s2d_upsample2x(y))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_resize_from_s2d(rng):
    img = r(rng, B, 32, 32, 3)
    a = resize_bilinear(jnp.transpose(img, (0, 3, 1, 2)), 12)
    b = S.resize_bilinear_from_s2d(S.s2d(img), 12)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------- offsets
#
# The offset-lattice variants (cells holding rows 2v'+off; off=-1 carries a
# phantom row/col pair stored as zeros) must be exact re-indexings: every
# folded kernel at every (in_off, out_off) pair equals the plain op.


def to_off(x, off):
    return S.shift_to_m1(S.s2d(x)) if off else S.s2d(x)


def test_shift_to_m1_roundtrip(rng):
    x = r(rng, B, H, H, I)
    xs = S.shift_to_m1(S.s2d(x))
    assert xs.shape == (B, H // 2 + 1, H // 2 + 1, 4 * I)
    np.testing.assert_array_equal(np.asarray(S.un_s2d_off(xs, -1)),
                                  np.asarray(x))
    # phantoms are zero by construction
    np.testing.assert_array_equal(np.asarray(S.mask_phantoms(xs)),
                                  np.asarray(xs))


def test_s2d_hw_offset(rng):
    n = r(rng, H, H)
    a = np.asarray(S.s2d_hw(n, -1))
    xs = np.asarray(S.shift_to_m1(S.s2d(n[None, :, :, None])))[0]
    np.testing.assert_array_equal(a, xs)


@pytest.mark.parametrize("in_off,out_off", [(0, -1), (-1, 0), (-1, -1)])
@pytest.mark.parametrize("k", [3, 1])
def test_s2d_offset_modulated_conv(rng, in_off, out_off, k):
    x = r(rng, B, H, H, I)
    w = r(rng, k, k, I, O)
    style = r(rng, B, I)
    a = modulated_conv2d(x, w, style)
    y = S.s2d_modulated_conv2d(to_off(x, in_off), w, style,
                               in_off=in_off, out_off=out_off)
    assert y.shape[1] == S.n_cells(H, out_off)
    if out_off:
        y = S.mask_phantoms(y)  # conv extrapolates into phantom slots
    np.testing.assert_allclose(np.asarray(a),
                               np.asarray(S.un_s2d_off(y, out_off)),
                               rtol=2e-5, atol=2e-5)
    if in_off == 0 and out_off == -1 and k == 3:
        Kp, _ = S.s2d_same_kernel(w, in_off, out_off)
        assert Kp.shape[0] == 2  # the [2,2] fold is the point


@pytest.mark.parametrize("in_off,out_off", [(0, -1), (-1, 0), (-1, -1)])
@pytest.mark.parametrize("k,out_s2d", [(3, True), (1, True), (3, False),
                                       (1, False)])
def test_s2d_offset_down_conv(rng, in_off, out_off, k, out_s2d):
    if not out_s2d and out_off:
        pytest.skip("plain output has no lattice offset")
    x = r(rng, B, H, H, I)
    w = r(rng, k, k, I, O)
    a = conv2d_down(x, w)
    y = S.s2d_conv2d_down(to_off(x, in_off), w, output_s2d=out_s2d,
                          in_off=in_off, out_off=out_off)
    if out_s2d:
        if out_off:
            y = S.mask_phantoms(y)
        y = S.un_s2d_off(y, out_off)
    np.testing.assert_allclose(np.asarray(a), np.asarray(y),
                               rtol=2e-4, atol=2e-4)


def test_s2d_offset_up_from_s2d(rng):
    x = r(rng, B, H, H, I)
    w = r(rng, 3, 3, I, O)
    style = r(rng, B, I)
    a = modulated_conv2d_up(x, w, style)
    y = S.s2d_modulated_conv2d_up(to_off(x, -1), w, style, input_s2d=True,
                                  in_off=-1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(S.un_s2d(y)),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("out_off", [0, -1])
def test_s2d_enter_conv1x1(rng, out_off):
    x = r(rng, B, H, H, I)
    w = r(rng, 1, 1, I, O)
    a = S.s2d(conv2d(x, w))
    y = S.s2d_enter_conv1x1(x, w, out_off=out_off)
    if out_off:
        np.testing.assert_array_equal(np.asarray(S.mask_phantoms(y)),
                                      np.asarray(y))
    np.testing.assert_allclose(np.asarray(S.un_s2d(S.s2d(S.un_s2d_off(y, out_off)))),
                               np.asarray(S.un_s2d(a)), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("in_off", [0, -1])
def test_s2d_exit_conv1x1(rng, in_off):
    x = r(rng, B, H, H, I)
    w = r(rng, 1, 1, I, O)
    a = conv2d(x, w)
    y = S.s2d_exit_conv1x1(to_off(x, in_off), w, in_off=in_off)
    np.testing.assert_allclose(np.asarray(a), np.asarray(y),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("in_off", [0, -1])
def test_s2d_nearest_up_conv(rng, in_off):
    from clip_glass_tpu.models.biggan.model import _upsample_nearest

    x = r(rng, B, H, H, I)
    w = r(rng, 3, 3, I, O)
    # BigGAN 'SAME' pad convention: pad = (k-1)//2 both sides
    up = _upsample_nearest(x)
    a = jnp.asarray(np.asarray(
        jax.lax.conv_general_dilated(
            up, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=jax.lax.conv_dimension_numbers(
                up.shape, w.shape, ("NHWC", "HWIO", "NHWC")))))
    y = S.s2d_nearest_up_conv(to_off(x, in_off), w, in_off=in_off)
    np.testing.assert_allclose(np.asarray(a), np.asarray(S.un_s2d(y)),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("in_off", [0, -1])
def test_s2d_nearest_up_conv_out_off(rng, in_off):
    """out_off=-1 variant (the fused-skip up-chain, BigGAN): phantoms are
    the only difference from the plain upsample+conv result."""
    from clip_glass_tpu.models.biggan.model import _upsample_nearest

    x = r(rng, B, H, H, I)
    w = r(rng, 3, 3, I, O)
    up = _upsample_nearest(x)
    a = jnp.asarray(np.asarray(
        jax.lax.conv_general_dilated(
            up, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=jax.lax.conv_dimension_numbers(
                up.shape, w.shape, ("NHWC", "HWIO", "NHWC")))))
    y = S.s2d_nearest_up_conv(to_off(x, in_off), w, in_off=in_off,
                              out_off=-1)
    got = S.un_s2d_off(S.mask_phantoms(y), -1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(got),
                               rtol=2e-4, atol=2e-4)


def test_s2d_exit_conv1x1_skip(rng):
    """Fused nearest-up residual exit: exit(x) + up(skip) as one conv."""
    from clip_glass_tpu.models.biggan.model import _upsample_nearest

    x = r(rng, B, H, H, I)
    w = r(rng, 1, 1, I, O)
    skip = r(rng, B, H // 2, H // 2, O)  # pre-up res = the cell lattice
    a = conv2d(x, w) + _upsample_nearest(skip)
    y = S.s2d_exit_conv1x1_skip(S.s2d(x), w, skip, in_off=0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(y),
                               rtol=2e-5, atol=2e-5)


def test_resize_from_s2d_offset(rng):
    img = r(rng, B, 32, 32, 3)
    a = resize_bilinear(jnp.transpose(img, (0, 3, 1, 2)), 12)
    b = S.resize_bilinear_from_s2d(to_off(img, -1), 12, in_off=-1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------- s4d (RGB)


def test_s4d_roundtrip(rng):
    x = r(rng, B, H, H, 3)
    np.testing.assert_array_equal(np.asarray(S.un_s4d(S.s4d(x))), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(S.s2d_to_s4d(S.s2d(x))),
                                  np.asarray(S.s4d(x)))


@pytest.mark.parametrize("in_off", [0, -1])
def test_s4d_from_s2d_conv1x1(rng, in_off):
    x = r(rng, B, H, H, I)
    w = r(rng, 1, 1, I, 3)
    a = S.s4d(conv2d(x, w))
    y = S.s4d_from_s2d_conv1x1(to_off(x, in_off), w, in_off=in_off)
    np.testing.assert_allclose(np.asarray(a), np.asarray(y),
                               rtol=2e-5, atol=2e-5)


def test_s4d_upsample2x(rng):
    y = r(rng, B, H, H, 3)
    a = S.s4d(upsample2x(y))
    b = S.s4d_upsample2x(S.s4d(y))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_plain_to_s4d_upsample2x(rng):
    """The fused stride-2 plain->s4d upsample conv == the composed
    s2d_to_s4d(s2d_upsample2x(.)) path == the plain upsample re-laid, at
    several sizes/channel counts (incl. the production C=3 RGB entry)."""
    for Hh, C in [(8, 3), (16, 5), (32, 3)]:
        y = r(rng, B, Hh, Hh, C)
        a = S.s4d(upsample2x(y))
        b = S.s2d_to_s4d(S.s2d_upsample2x(y))
        c = S.plain_to_s4d_upsample2x(y)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("out_off", [0, -1])
def test_s2d_from_s4d_conv1x1(rng, out_off):
    y = r(rng, B, H, H, 3)
    w = r(rng, 1, 1, 3, O)
    a = conv2d(y, w)
    z = S.s2d_from_s4d_conv1x1(S.s4d(y), w, out_off=out_off)
    np.testing.assert_allclose(np.asarray(a),
                               np.asarray(S.un_s2d_off(z, out_off)),
                               rtol=2e-5, atol=2e-5)


def test_resize_from_s4d(rng):
    img = r(rng, B, 32, 32, 3)
    a = resize_bilinear(jnp.transpose(img, (0, 3, 1, 2)), 12)
    b = S.resize_bilinear_from_s4d(S.s4d(img), 12)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------- model level

TINY_S2D = dataclasses.replace(sg2.TINY, s2d_min_res=8)


@pytest.fixture(scope="module")
def tiny_params():
    key = jax.random.PRNGKey(3)
    kg, kd = jax.random.split(key)
    gp = sg2.generator_init(kg, sg2.TINY)
    dp = sg2.discriminator_init(kd, sg2.TINY)
    noise = [jax.random.normal(k, s) for k, s in zip(
        jax.random.split(jax.random.PRNGKey(7), len(sg2.TINY.noise_shapes())),
        sg2.TINY.noise_shapes())]
    return gp, dp, noise


def test_synthesis_s2d_matches_plain(tiny_params, rng):
    """Multi-block s2d (cutoff 8 on the 16px TINY) exercises plain->s2d entry,
    s2d->s2d up transitions and the skip-accumulator upsample."""
    gp, _, noise = tiny_params
    z = r(rng, 4, sg2.TINY.latent_size)
    a = sg2.generator_apply(gp, z, sg2.TINY, noise=noise, policy=FP32)
    b = sg2.generator_apply(gp, z, TINY_S2D, noise=noise, policy=FP32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3)


def test_precast_params_exact_sg2(tiny_params, rng):
    """Staging the frozen G tree to the compute dtype (precast_params with
    sg2.PRECAST_EXCLUDE) is bitwise for the bf16 forward — every generator
    consumer casts via policy.cast_compute (the s2d/s4d ToRGB folds are
    value-preserving re-indexings); dlatent_avg stays raw fp32. The
    DISCRIMINATOR is intentionally not staged (its s2d down folds compose
    FIR taps with raw fp32 weights, see sg2.PRECAST_EXCLUDE comment) —
    asserted here by showing the D forward is NOT bitwise under precast."""
    from clip_glass_tpu.core.dtypes import BF16, precast_params

    gp, dp, noise = tiny_params
    gp16 = precast_params(gp, BF16, sg2.PRECAST_EXCLUDE)
    assert gp16["dlatent_avg"].dtype == jnp.float32
    assert gp16["synthesis"]["const"].dtype == jnp.bfloat16
    z = r(rng, 4, sg2.TINY.latent_size)
    for cfg in (TINY_S2D, sg2.TINY,
                dataclasses.replace(TINY_S2D, s2d_offsets=False)):
        a = jax.jit(lambda p, zz: sg2.generator_apply(
            p, zz, cfg, noise=noise, policy=BF16))(gp, z)
        b = jax.jit(lambda p, zz: sg2.generator_apply(
            p, zz, cfg, noise=noise, policy=BF16))(gp16, z)
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_pack_noise_matches_raw(tiny_params, rng):
    """Pre-packed noise (pack_noise at init) produces EXACTLY the synthesis
    output of raw [H, W] planes folded in-program, with and without lattice
    offsets — the layouts replay (noise_layouts) must stay in lockstep with
    the synthesis loop."""
    gp, _, noise = tiny_params
    z = r(rng, 4, sg2.TINY.latent_size)
    for cfg in (TINY_S2D, dataclasses.replace(TINY_S2D, s2d_offsets=False),
                dataclasses.replace(TINY_S2D, rgb_s4d=False), sg2.TINY):
        packed = sg2.pack_noise(noise, cfg, FP32)
        n_s2d = sum(1 for use, _ in sg2.noise_layouts(cfg) if use)
        assert sum(1 for p in packed if p.ndim == 3) == n_s2d
        a = sg2.generator_apply(gp, z, cfg, noise=noise, policy=FP32)
        b = sg2.generator_apply(gp, z, cfg, noise=packed, policy=FP32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_synthesis_output_s2d_layout(tiny_params, rng):
    gp, _, noise = tiny_params
    z = r(rng, 4, sg2.TINY.latent_size)
    a = sg2.generator_apply(gp, z, TINY_S2D, noise=noise, policy=FP32)
    b = sg2.generator_apply(gp, z, TINY_S2D, noise=noise, policy=FP32,
                            output_s2d=True)
    assert sg2.rgb_domain(TINY_S2D) == "s4d"
    assert b.shape == (4, 4, 4, 48)
    np.testing.assert_allclose(
        np.asarray(a),
        np.asarray(jnp.transpose(S.un_s4d(b), (0, 3, 1, 2))),
        rtol=1e-5, atol=1e-5)


def test_synthesis_output_s2d_layout_no_s4d(tiny_params, rng):
    """With rgb_s4d disabled the contract is the offset s2d image with zero
    phantoms."""
    cfg = dataclasses.replace(TINY_S2D, rgb_s4d=False)
    gp, _, noise = tiny_params
    z = r(rng, 4, sg2.TINY.latent_size)
    a = sg2.generator_apply(gp, z, cfg, noise=noise, policy=FP32)
    b = sg2.generator_apply(gp, z, cfg, noise=noise, policy=FP32,
                            output_s2d=True)
    off = sg2.s2d_output_offset(cfg)
    n = S.n_cells(16, off)
    assert off == -1 and b.shape == (4, n, n, 12)
    np.testing.assert_allclose(
        np.asarray(a),
        np.asarray(jnp.transpose(S.un_s2d_off(b, off), (0, 3, 1, 2))),
        rtol=1e-5, atol=1e-5)
    # contract: phantom entries are exactly zero
    np.testing.assert_array_equal(np.asarray(S.mask_phantoms(b)),
                                  np.asarray(b))


def test_discriminator_s4d_matches_plain(tiny_params, rng):
    gp, dp, _ = tiny_params
    img = r(rng, 4, 3, 16, 16)
    a = sg2.discriminator_apply(dp, img, sg2.TINY, policy=FP32)
    img_s4d = S.s4d(jnp.transpose(img, (0, 2, 3, 1)))
    b = sg2.discriminator_apply(dp, img_s4d, TINY_S2D, policy=FP32,
                                input_s4d=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=5e-4, atol=5e-4)


def test_discriminator_s2d_matches_plain(tiny_params, rng):
    gp, dp, _ = tiny_params
    img = r(rng, 4, 3, 16, 16)
    a = sg2.discriminator_apply(dp, img, sg2.TINY, policy=FP32)
    img_s2d = S.s2d(jnp.transpose(img, (0, 2, 3, 1)))
    b = sg2.discriminator_apply(dp, img_s2d, TINY_S2D, policy=FP32,
                                input_s2d=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=5e-4, atol=5e-4)


def test_fitness_s2d_matches_plain():
    """End-to-end: the s2d fitness pipeline (synthesis -> norm -> phase-aware
    resize -> CLIP; s2d discriminator hinge) equals the plain pipeline."""
    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.models.clip import model as clip_model

    config = get_config("StyleGAN2_ffhq_d").replace(
        target="a tiny test face", weights="random:0", pop_size=4,
        dim_z=32, n_var=32, compute_dtype="float32")
    p_plain = GenerationProblem(config, clip_cfg=clip_model.TINY,
                                model_cfg=sg2.TINY)
    p_s2d = GenerationProblem(config, clip_cfg=clip_model.TINY,
                              model_cfg=TINY_S2D)
    assert not p_plain.generator._s2d_active
    assert p_s2d.generator._s2d_active
    X = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32)), jnp.float32)
    key = jax.random.PRNGKey(0)
    Fa = p_plain.generator.eval_population(X, key=key)
    Fb = p_s2d.generator.eval_population(X, key=key)
    np.testing.assert_allclose(np.asarray(Fa), np.asarray(Fb),
                               rtol=2e-3, atol=2e-3)


def test_eval_microbatch_equivalence():
    """Population microbatching (lax.map chunks, config.eval_microbatch) —
    the on-device analogue of the reference's minibatch loops (reference
    models.py:108-118).

    On a no-discriminator config the chunked fitness is EXACTLY the
    single-batch fitness. With a discriminator, the CLIP objective still
    matches element-wise; the hinge objective's minibatch-std term is
    batch-statistics-dependent BY DESIGN (the reference, too, computes it
    per minibatch-of-batch_size — reference generator.py:36-38 +
    stylegan2/modules.py:679-750 — so chunk=batch_size is the
    reference-faithful setting, not a divergence)."""
    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.models.clip import model as clip_model

    X = jnp.asarray(np.random.default_rng(1).normal(size=(8, 32)), jnp.float32)
    key = jax.random.PRNGKey(0)

    base = get_config("StyleGAN2_ffhq_nod").replace(
        target="a tiny test face", weights="random:0", pop_size=8,
        dim_z=32, n_var=32, compute_dtype="float32")
    p_full = GenerationProblem(base, clip_cfg=clip_model.TINY,
                               model_cfg=sg2.TINY)
    p_mb = GenerationProblem(base.replace(eval_microbatch=4),
                             clip_cfg=clip_model.TINY, model_cfg=sg2.TINY)
    Fa = p_full.generator.eval_population(X, key=key)
    Fb = p_mb.generator.eval_population(X, key=key)
    np.testing.assert_allclose(np.asarray(Fa), np.asarray(Fb),
                               rtol=1e-5, atol=1e-5)
    # jittable with chunking
    Fc = jax.jit(lambda X, c, k: p_mb.generator.eval_population(X, c, k))(
        X, p_mb.generator.bundle, key)
    np.testing.assert_allclose(np.asarray(Fb), np.asarray(Fc),
                               rtol=1e-5, atol=1e-5)

    based = get_config("StyleGAN2_ffhq_d").replace(
        target="a tiny test face", weights="random:0", pop_size=8,
        dim_z=32, n_var=32, compute_dtype="float32")
    pd_full = GenerationProblem(based, clip_cfg=clip_model.TINY,
                                model_cfg=sg2.TINY)
    pd_mb = GenerationProblem(based.replace(eval_microbatch=4),
                              clip_cfg=clip_model.TINY, model_cfg=sg2.TINY)
    Fa = pd_full.generator.eval_population(X, key=key)
    Fb = pd_mb.generator.eval_population(X, key=key)
    np.testing.assert_allclose(np.asarray(Fa[:, 0]), np.asarray(Fb[:, 0]),
                               rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(Fb)).all()
