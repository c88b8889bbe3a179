"""Parity of the JAX ModifiedResNet (RN50 vision tower) vs the reference
torch implementation (clip/model.py:9-149), including eval-BN folding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.dtypes import FP32
from clip_glass_tpu.models.clip import resnet as jrn
from clip_glass_tpu.weights import convert_clip_rn

from reference_oracle import add_reference_path, randomize_module

torch = pytest.importorskip("torch")
add_reference_path()
from clip.model import ModifiedResNet  # noqa: E402

CFG = jrn.RNConfig(layers=(1, 1, 1, 1), output_dim=32,
                   input_resolution=32, width=16)


@pytest.fixture(scope="module")
def oracle():
    m = ModifiedResNet(layers=[1, 1, 1, 1], output_dim=32, heads=CFG.heads,
                       input_resolution=32, width=16)
    randomize_module(m, seed=21, std=0.2)
    # randomize BN buffers too, so the scale/bias folding is actually tested
    rng = np.random.default_rng(22)
    with torch.no_grad():
        for name, buf in m.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.from_numpy(rng.normal(0, 0.3, buf.shape).astype(np.float32)))
            elif name.endswith("running_var"):
                buf.copy_(torch.from_numpy(rng.uniform(0.5, 2.0, buf.shape).astype(np.float32)))
    m.eval()
    params = convert_clip_rn.convert(m.state_dict(), CFG)
    return m, params


def test_rn50_parity(oracle):
    m, params = oracle
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (3, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(imgs)).numpy()
    got = np.asarray(jax.jit(
        lambda p, x: jrn.apply(p, x, CFG, FP32))(params, jnp.asarray(imgs)))
    assert got.shape == want.shape == (3, 32)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_rn50_random_init_runs():
    params = jax.jit(lambda k: jrn.init(k, CFG))(jax.random.PRNGKey(0))
    out = jrn.apply(params, jnp.ones((2, 3, 32, 32)), CFG, FP32)
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()
