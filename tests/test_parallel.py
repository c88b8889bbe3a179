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