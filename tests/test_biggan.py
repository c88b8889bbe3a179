"""BigGAN-deep structural/behavioral tests (the oracle pip package is not
installable in this environment; conversion-level parity is deferred to an
environment with `pytorch-pretrained-biggan` — SURVEY.md hard part #2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.dtypes import FP32
from clip_glass_tpu.models.biggan import model as bg


@pytest.fixture(scope="module")
def tiny():
    params = bg.init(jax.random.PRNGKey(0), bg.TINY)
    return params


def test_output_shape_and_range(tiny):
    z = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16)), jnp.float32)
    cv = jax.nn.softmax(jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 10)), jnp.float32), axis=1)
    out = jax.jit(lambda p, a, b: bg.apply(p, a, b, 1.0, bg.TINY, FP32))(tiny, z, cv)
    assert out.shape == (4, 3, 8, 8)  # TINY: one up-block, 4px seed -> 8px
    o = np.asarray(out)
    assert o.min() >= -1.0 and o.max() <= 1.0  # tanh output


def test_deterministic(tiny):
    z = jnp.ones((2, 16))
    cv = jnp.full((2, 10), 0.1)
    a = bg.apply(tiny, z, cv, 1.0, bg.TINY, FP32)
    b = bg.apply(tiny, z, cv, 1.0, bg.TINY, FP32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_class_vector_changes_output(tiny):
    z = jnp.ones((1, 16))
    cv1 = jax.nn.one_hot(jnp.asarray([0]), 10)
    cv2 = jax.nn.one_hot(jnp.asarray([7]), 10)
    a = bg.apply(tiny, z, cv1, 1.0, bg.TINY, FP32)
    b = bg.apply(tiny, z, cv2, 1.0, bg.TINY, FP32)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_truncation_interpolates_stats():
    """Stats interpolation rule of the HF conditional BN: stats recorded at
    truncation linspace(0, 1, n_stats); linear interp between neighbors."""
    means = np.zeros((51, 4), np.float32)
    means[25] = 1.0
    means[50] = 3.0
    variances = np.ones((51, 4), np.float32)
    variances[24] = 2.0
    m, v = bg._interp_stats(jnp.asarray(means), jnp.asarray(variances), 0.5, 51)
    np.testing.assert_allclose(np.asarray(m), 1.0)
    m, v = bg._interp_stats(jnp.asarray(means), jnp.asarray(variances), 0.49, 51)
    np.testing.assert_allclose(np.asarray(m), 0.5)   # halfway 24 -> 25
    np.testing.assert_allclose(np.asarray(v), 1.5)
    m, _ = bg._interp_stats(jnp.asarray(means), jnp.asarray(variances), 1.0, 51)
    np.testing.assert_allclose(np.asarray(m), 3.0)


def test_real_config_shapes():
    # full-size configs build structurally correct shapes (no forward; the
    # 256px forward is exercised on TPU in bench/integration)
    cfg = bg.BIGGAN_DEEP_256
    assert len(cfg.layers) == 12
    assert cfg.output_dim == 256
    assert 4 * 2 ** sum(1 for up, _, _ in cfg.layers if up) == 256
    cfg512 = bg.BIGGAN_DEEP_512
    assert 4 * 2 ** sum(1 for up, _, _ in cfg512.layers if up) == 512


def test_truncated_noise_sample_bounds():
    x = bg.truncated_noise_sample(jax.random.PRNGKey(0), 100, 128, 0.5)
    xa = np.asarray(x)
    assert xa.shape == (100, 128)
    assert abs(xa).max() <= 1.0  # 0.5 * truncnorm(-2,2)
