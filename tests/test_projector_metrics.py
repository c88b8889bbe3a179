"""Projector + FID/PPL metric machinery tests on TINY models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.metrics.fid import FID, frechet_distance
from clip_glass_tpu.metrics.ppl import PPL, lerp, slerp
from clip_glass_tpu.models.stylegan2 import model as sg2
from clip_glass_tpu.projector import Projector, ProjectorConfig, downsampled_l2


@pytest.fixture(scope="module")
def g_params():
    return jax.jit(lambda k: sg2.generator_init(k, sg2.TINY))(jax.random.PRNGKey(0))


def test_frechet_distance_identity():
    mu = np.zeros(4)
    sigma = np.eye(4)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)
    # mean shift only: d^2 = |diff|^2
    assert frechet_distance(mu, sigma, mu + 2.0, sigma) == pytest.approx(16.0, rel=1e-5)


def test_fid_discriminates_distributions(rng):
    feat = lambda x: np.asarray(x).reshape(len(x), -1)[:, :8]
    fid = FID(feat, num_samples=256, batch_size=64)

    def batches(shift):
        r = np.random.default_rng(0)
        while True:
            yield r.normal(shift, 1.0, (64, 8)).astype(np.float32)

    fid.set_real_stats(batches(0.0))
    same = fid.evaluate(batches(0.0))
    far = fid.evaluate(batches(3.0))
    assert same < 0.5
    assert far > same + 5.0


def test_slerp_endpoints(rng):
    a = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(slerp(a, b, 0.0)), np.asarray(a),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.abs(lerp(a, b, 1.0) - b).max()) < 1e-6


def test_ppl_runs_and_is_positive(g_params):
    ppl = PPL(g_params, sg2.TINY, distance_fn=downsampled_l2,
              num_samples=32, batch_size=8)
    val = ppl.evaluate()
    assert np.isfinite(val) and val >= 0


def test_projector_reduces_distance(g_params):
    cfg = ProjectorConfig(num_steps=20, dlatent_samples=256, initial_lr=0.05)
    proj = Projector(g_params, sg2.TINY, cfg=cfg)
    # target: an actual generator sample -> projectable
    key = jax.random.PRNGKey(5)
    z = jax.random.normal(key, (1, sg2.TINY.latent_size))
    target = jnp.clip((sg2.generator_apply(g_params, z, sg2.TINY, noise="none")
                       + 1.0) / 2.0, 0.0, 1.0)
    d0 = float(jnp.sum(downsampled_l2(
        jnp.clip((sg2.synthesis_apply(
            g_params["synthesis"],
            jnp.broadcast_to(proj.dlatent_avg[None, None, :],
                             (1, sg2.TINY.num_latents, sg2.TINY.latent_size)),
            sg2.TINY, noise="none") + 1.0) / 2.0, 0.0, 1.0), target)))
    dlatents, imgs = proj.project(target, num_steps=20)
    d1 = float(jnp.sum(downsampled_l2(imgs, target)))
    assert dlatents.shape == (1, sg2.TINY.num_latents, sg2.TINY.latent_size)
    assert imgs.shape == target.shape
    assert d1 < d0  # optimization made progress


def test_projector_with_lpips_distance(g_params):
    """The reference path (stylegan2/project.py:239-295: LPIPS perceptual
    loss on [0,1] images) wired end to end, with random-init LPIPS weights
    (pretrained weights are not fetchable in this environment)."""
    from clip_glass_tpu.metrics import lpips as L

    lp = L.init(jax.random.PRNGKey(2))
    cfg = ProjectorConfig(num_steps=25, dlatent_samples=128, initial_lr=0.1)
    proj = Projector(g_params, sg2.TINY, cfg=cfg, lpips_params=lp)

    key = jax.random.PRNGKey(6)
    z = jax.random.normal(key, (1, sg2.TINY.latent_size))
    target = jnp.clip((sg2.generator_apply(g_params, z, sg2.TINY, noise="none")
                       + 1.0) / 2.0, 0.0, 1.0)
    d0 = float(jnp.sum(proj.distance(
        jnp.clip((sg2.synthesis_apply(
            g_params["synthesis"],
            jnp.broadcast_to(proj.dlatent_avg[None, None, :],
                             (1, sg2.TINY.num_latents, sg2.TINY.latent_size)),
            sg2.TINY, noise="none") + 1.0) / 2.0, 0.0, 1.0), target)))
    dlatents, imgs = proj.project(target, num_steps=25)
    d1 = float(jnp.sum(proj.distance(imgs, target)))
    assert np.isfinite(d0) and np.isfinite(d1)
    assert d1 < d0  # the LPIPS objective itself went down
