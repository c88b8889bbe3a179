"""Model-level parity of the JAX StyleGAN2 G (mapping + synthesis, with fixed
noise) and D vs the reference torch implementation, run through the real
state-dict converter — SURVEY.md hard part #1."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.dtypes import FP32
from clip_glass_tpu.models.stylegan2 import model as sg2
from clip_glass_tpu.weights import convert_stylegan2 as conv

from reference_oracle import import_reference_stylegan2, randomize_module

torch = pytest.importorskip("torch")
ref_models, ref_modules = import_reference_stylegan2()

# 3 blocks -> 16px; enough to cover const block, fused up-blocks, skip
# accumulation, mbstd, resnet-D, and the 2x(3-1)+1+1 = 6 style layers
CH = (16, 16, 24)
CFG = sg2.SG2Config(latent_size=32, mapping_layers=3, channels=CH,
                    mbstd_group_size=2)


def _torch_G():
    g_map = ref_models.GeneratorMapping(latent_size=32, num_layers=3, lr_mul=0.01)
    g_syn = ref_models.GeneratorSynthesis(latent_size=32, channels=list(CH),
                                          base_shape=(4, 4))
    G = ref_models.Generator(G_mapping=g_map, G_synthesis=g_syn)
    randomize_module(G, seed=11, std=0.5)
    return G.eval()


def _torch_D():
    D = ref_models.Discriminator(channels=list(CH), mbstd_group_size=2,
                                 base_shape=(4, 4))
    randomize_module(D, seed=12, std=0.5)
    return D.eval()


@pytest.fixture(scope="module")
def gen():
    G = _torch_G()
    params = conv.convert_generator(G.state_dict(), CFG)
    return G, params


@pytest.fixture(scope="module")
def disc():
    D = _torch_D()
    params = conv.convert_discriminator(D.state_dict(), CFG)
    return D, params


def test_num_latents_matches(gen):
    G, _ = gen
    assert len(G) == CFG.num_latents == 6


def test_mapping_parity(gen):
    G, params = gen
    rng = np.random.default_rng(0)
    z = rng.normal(size=(4, 32)).astype(np.float32)
    with torch.no_grad():
        want = G.G_mapping(torch.from_numpy(z)).numpy()
    got = np.asarray(jax.jit(
        lambda p, a: sg2.mapping_apply(p, a, CFG, policy=FP32)
    )(params["mapping"], jnp.asarray(z)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_generator_parity_with_fixed_noise(gen):
    G, params = gen
    rng = np.random.default_rng(1)
    z = rng.normal(size=(4, 32)).astype(np.float32)
    # fix identical noise on both sides (the reference draws fresh noise per
    # call since checkpoints exclude noise buffers; for parity we pin it)
    shapes = CFG.noise_shapes()
    noises = [rng.normal(size=s).astype(np.float32) for s in shapes]
    with torch.no_grad():
        G(torch.from_numpy(z))  # populate noise shapes
        G.static_noise(noise_tensors=[torch.from_numpy(n)[None, None] for n in noises])
        want = G(torch.from_numpy(z)).numpy()
    got = np.asarray(jax.jit(
        lambda p, a: sg2.generator_apply(
            p, a, CFG, noise=[jnp.asarray(n) for n in noises], policy=FP32)
    )(params, jnp.asarray(z)))
    assert got.shape == want.shape == (4, 3, 16, 16)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_generator_zero_noise_paths(gen):
    _, params = gen
    z = jnp.asarray(np.random.default_rng(2).normal(size=(2, 32)), jnp.float32)
    out1 = sg2.generator_apply(params, z, CFG, noise="none", policy=FP32)
    out2 = sg2.generator_apply(params, z, CFG, noise="random",
                               noise_key=jax.random.PRNGKey(0), policy=FP32)
    assert out1.shape == out2.shape == (2, 3, 16, 16)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_truncation_lerp(gen):
    _, params = gen
    params = dict(params)
    params["dlatent_avg"] = jnp.asarray(
        np.random.default_rng(3).normal(size=(32,)), jnp.float32)
    z = jnp.asarray(np.random.default_rng(4).normal(size=(2, 32)), jnp.float32)
    w = sg2.mapping_apply(params["mapping"], z, CFG, policy=FP32)
    dl = jnp.repeat(w[:, None, :], CFG.num_latents, axis=1)
    t0 = sg2.truncate(dl, params["dlatent_avg"], psi=0.0)
    np.testing.assert_allclose(
        np.asarray(t0), np.broadcast_to(np.asarray(params["dlatent_avg"]),
                                        t0.shape), rtol=1e-6)
    thalf = sg2.truncate(dl, params["dlatent_avg"], psi=0.5, cutoff=3)
    # avg + 1.0*(dl - avg) only equals dl up to cancellation error
    np.testing.assert_allclose(np.asarray(thalf[:, 3:]), np.asarray(dl[:, 3:]),
                               rtol=1e-5, atol=1e-6)


def test_discriminator_parity(disc):
    D, params = disc
    rng = np.random.default_rng(5)
    imgs = rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = D(torch.from_numpy(imgs)).numpy()
    got = np.asarray(jax.jit(
        lambda p, a: sg2.discriminator_apply(p, a, CFG, policy=FP32)
    )(params, jnp.asarray(imgs)))
    assert got.shape == want.shape == (4, 1)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
