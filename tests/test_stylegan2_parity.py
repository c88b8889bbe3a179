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


# ------------------------------------------------------------ latent surface

def test_generator_multi_latent_surface():
    """Reference input surface (stylegan2/models.py:380-458): [B, N, D]
    style-mixing latents, explicit latent_to_layer_idx, direct dlatents
    (which bypass truncation), and span distribution semantics."""
    import jax
    from clip_glass_tpu.models.stylegan2.model import distribute_latents

    cfg = sg2.TINY
    gp = sg2.generator_init(jax.random.PRNGKey(0), cfg)
    noise = [jax.random.normal(k, s) for k, s in zip(
        jax.random.split(jax.random.PRNGKey(7), len(cfg.noise_shapes())),
        cfg.noise_shapes())]
    n = cfg.num_latents
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_size))

    # [B, 1, D] multi-latent == [B, D] single latent
    a = sg2.generator_apply(gp, z, cfg, noise=noise)
    b = sg2.generator_apply(gp, z[:, None, :], cfg, noise=noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)

    # two latents with an explicit per-layer assignment: crossing over at
    # layer k must equal manually assembled dlatents
    z2 = jax.random.normal(jax.random.PRNGKey(2), (2, 2, cfg.latent_size))
    k = n // 2
    idx = [0] * k + [1] * (n - k)
    mixed = sg2.generator_apply(gp, z2, cfg, noise=noise,
                                latent_to_layer_idx=idx)
    w = sg2.mapping_apply(gp["mapping"], z2.reshape(4, -1), cfg).reshape(2, 2, -1)
    dl = jnp.concatenate([jnp.repeat(w[:, :1], k, 1),
                          jnp.repeat(w[:, 1:], n - k, 1)], axis=1)
    want = sg2.synthesis_apply(gp["synthesis"], dl, cfg, noise=noise)
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # random span distribution: jittable, covers all layers with valid spans
    d3 = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16))
    out = distribute_latents(d3, n, key=jax.random.PRNGKey(4))
    assert out.shape == (2, n, 16)
    # each layer's row must be one of the 3 latents, assigned as sorted
    # consecutive spans starting at latent 0 and covering all three
    row = out[0]
    ids = [int(np.argmax([np.allclose(row[i], d3[0, j]) for j in range(3)]))
           for i in range(n)]
    assert ids[0] == 0 and ids == sorted(ids) and set(ids) == {0, 1, 2}

    # direct dlatents bypass truncation: psi has no effect
    dlat = jax.random.normal(jax.random.PRNGKey(5), (2, n, cfg.latent_size))
    c = sg2.generator_apply(gp, dlatents=dlat, cfg=cfg, noise=noise,
                            truncation_psi=0.5)
    d = sg2.generator_apply(gp, dlatents=dlat, cfg=cfg, noise=noise)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))
