"""Op-level parity vs reference stylegan2.modules (FIR resampling, modulated
conv, fused up/down convs, minibatch-std) — the kernel surface SURVEY.md §2.4
marks as the rebuild's native obligation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.ops import bias_act as ba
from clip_glass_tpu.ops import modulated_conv as mc
from clip_glass_tpu.ops import upfirdn

from reference_oracle import import_reference_stylegan2

torch = pytest.importorskip("torch")
_, ref_modules = import_reference_stylegan2()


def nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


@pytest.fixture
def x8(rng):
    return rng.normal(size=(2, 6, 8, 8)).astype(np.float32)  # NCHW


def test_upsample2x_matches_reference(x8):
    m = ref_modules.Upsample(mode="FIR", filter=[1, 3, 3, 1], gain=1)
    with torch.no_grad():
        want = m(torch.from_numpy(x8)).numpy()
    got = nchw(jax.jit(upfirdn.upsample2x)(nhwc(x8)))
    assert want.shape == got.shape == (2, 6, 16, 16)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_downsample2x_matches_reference(x8):
    m = ref_modules.Downsample(mode="FIR", filter=[1, 3, 3, 1], gain=1)
    with torch.no_grad():
        want = m(torch.from_numpy(x8)).numpy()
    got = nchw(jax.jit(upfirdn.downsample2x)(nhwc(x8)))
    assert want.shape == got.shape == (2, 6, 4, 4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _mk_conv(rng, in_ch, out_ch, latent, **kw):
    layer = ref_modules.ConvLayer(in_channels=in_ch, out_channels=out_ch,
                                  latent_size=latent, modulate=True,
                                  demodulate=kw.pop("demodulate", True),
                                  kernel_size=kw.pop("kernel_size", 3), **kw)
    with torch.no_grad():
        layer.weight.normal_(0, 1.0, generator=torch.Generator().manual_seed(0))
        layer.dense.layer.weight.normal_(0, 1.0, generator=torch.Generator().manual_seed(1))
        layer.dense.bias.normal_(1.0, 0.2, generator=torch.Generator().manual_seed(2))
    return layer


def _extract(layer):
    """Torch ConvLayer params -> effective jax arrays (coefs folded)."""
    w = layer.weight.detach().numpy() * layer.weight_coef      # [O,I,k,k]
    w_j = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))           # [k,k,I,O]
    sw = layer.dense.layer.weight.detach().numpy() * layer.dense.layer.weight_coef
    sb = layer.dense.bias.detach().numpy() * layer.dense.bias_coef
    return w_j, jnp.asarray(sw.T), jnp.asarray(sb)


@pytest.mark.parametrize("demod,ksize", [(True, 3), (False, 3), (True, 1), (False, 1)])
def test_modulated_conv_matches_reference(rng, x8, demod, ksize):
    layer = _mk_conv(rng, 6, 10, 12, demodulate=demod, kernel_size=ksize)
    lat = rng.normal(size=(2, 12)).astype(np.float32)
    with torch.no_grad():
        want = layer(torch.from_numpy(x8), latent=torch.from_numpy(lat)).numpy()
    w, sw, sb = _extract(layer)
    style = mc.style_from_latent(jnp.asarray(lat), sw, sb)
    got = nchw(jax.jit(lambda a, b: mc.modulated_conv2d(a, w, b, demodulate=demod))(
        nhwc(x8), style))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("demod", [True, False])
def test_modulated_conv_up_matches_reference(rng, x8, demod):
    layer = ref_modules.ConvUpLayer(
        in_channels=6, out_channels=10, latent_size=12, modulate=True,
        demodulate=demod, kernel_size=3, fused=True, mode="FIR",
        filter=[1, 3, 3, 1], pad_once=True)
    with torch.no_grad():
        layer.weight.normal_(0, 1.0)
        layer.dense.layer.weight.normal_(0, 1.0)
        layer.dense.bias.normal_(1.0, 0.2)
    lat = rng.normal(size=(2, 12)).astype(np.float32)
    with torch.no_grad():
        want = layer(torch.from_numpy(x8), latent=torch.from_numpy(lat)).numpy()
    w, sw, sb = _extract(layer)
    style = mc.style_from_latent(jnp.asarray(lat), sw, sb)
    got = nchw(jax.jit(lambda a, b: mc.modulated_conv2d_up(a, w, b, demodulate=demod))(
        nhwc(x8), style))
    assert got.shape == want.shape == (2, 10, 16, 16)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_conv_down_matches_reference(rng, x8):
    layer = ref_modules.ConvDownLayer(
        in_channels=6, out_channels=10, kernel_size=3, fused=True,
        mode="FIR", filter=[1, 3, 3, 1], pad_once=True)
    with torch.no_grad():
        layer.weight.normal_(0, 1.0)
    with torch.no_grad():
        want = layer(torch.from_numpy(x8)).numpy()
    w = layer.weight.detach().numpy() * layer.weight_coef
    w_j = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    got = nchw(jax.jit(lambda a: mc.conv2d_down(a, w_j))(nhwc(x8)))
    assert got.shape == want.shape == (2, 10, 4, 4)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_conv_down_1x1_matches_reference(rng, x8):
    layer = ref_modules.ConvDownLayer(
        in_channels=6, out_channels=10, kernel_size=1, fused=True,
        mode="FIR", filter=[1, 3, 3, 1], pad_once=True)
    with torch.no_grad():
        layer.weight.normal_(0, 1.0)
        want = layer(torch.from_numpy(x8)).numpy()
    w = layer.weight.detach().numpy() * layer.weight_coef
    w_j = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    got = nchw(jax.jit(lambda a: mc.conv2d_down(a, w_j))(nhwc(x8)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_minibatch_std_matches_reference(rng):
    # NOTE: the reference MinibatchStd mutates its input in place in fp32
    # (stylegan2/modules.py:728 via the .view()/.float() alias), so torch
    # must get a private copy or the oracle comparison is self-fulfilling.
    x = rng.normal(size=(8, 6, 4, 4)).astype(np.float32)
    m = ref_modules.MinibatchStd(group_size=4)
    with torch.no_grad():
        want = m(torch.from_numpy(x.copy())).numpy()
    got = nchw(jax.jit(lambda a: ba.minibatch_std(a, 4))(nhwc(x)))
    assert got.shape == want.shape == (8, 7, 4, 4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_minibatch_std_centers_input_like_reference_fp32(rng):
    """The fp32 in-place centering quirk is load-bearing for D parity."""
    x = rng.normal(size=(4, 6, 4, 4)).astype(np.float32)
    got = nchw(ba.minibatch_std(nhwc(x), 2))
    grouped = x.reshape(2, 2, 6, 4, 4)
    centered = (grouped - grouped.mean(axis=0, keepdims=True)).reshape(4, 6, 4, 4)
    np.testing.assert_allclose(got[:, :6], centered, rtol=1e-5, atol=1e-6)
    raw = nchw(ba.minibatch_std(nhwc(x), 2, center_input=False))
    np.testing.assert_allclose(raw[:, :6], x, rtol=0, atol=0)


def test_polyphase_up_matches_default(rng):
    """The composed-kernel up-conv formulation is exact vs the default."""
    import jax.numpy as jnp
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 6, 10)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(2, 6)).astype(np.float32) + 1)
    a = np.asarray(mc.modulated_conv2d_up(x, w, s, demodulate=True))
    b = np.asarray(mc.modulated_conv2d_up_polyphase(x, w, s, demodulate=True))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ksize", [3, 1])
def test_fused_down_conv_matches_default(rng, ksize):
    """The composed FIR+conv single-kernel form is exact vs the default."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(ksize, ksize, 6, 10)).astype(np.float32))
    a = np.asarray(mc.conv2d_down(x, w, fuse=False))
    b = np.asarray(mc.conv2d_down(x, w, fuse=True))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
