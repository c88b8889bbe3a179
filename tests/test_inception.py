"""InceptionV3 feature extractor: structural tests (pretrained weights are
not fetchable here; the converter is exercised via a synthetic state dict)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.core import pytree
from clip_glass_tpu.metrics import inception as inc


@pytest.fixture(scope="module")
def params():
    return jax.jit(inc.init)(jax.random.PRNGKey(0))


def test_parameter_count(params):
    # torchvision inception_v3 trunk (no aux, no fc): ~21.8M conv params
    # + BN scale/bias pairs
    n = pytree.n_params(params)
    assert 21_000_000 < n < 24_000_000


def test_feature_shape_and_finite(params):
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 3, 64, 64)),
                    jnp.float32)
    feats = jax.jit(lambda p, a: inc.features(p, a))(params, x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_native_299_input_skips_resize(params):
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 3, 299, 299)),
                    jnp.float32)
    a = inc.features(params, x, resize_input=False)
    b = inc.features(params, x, resize_input=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                               atol=1e-3)


def test_avgpool_exclude_pad():
    # count_include_pad=False: corner of a constant image stays constant
    x = jnp.ones((1, 4, 4, 1))
    y = inc._avgpool_excl(x)
    np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-6)


def test_converter_roundtrip(params):
    """Synthesize a torch-layout state dict from the template and convert."""
    rng = np.random.default_rng(2)
    sd = {}

    def fill(prefix, p):
        kh, kw, cin, cout = np.asarray(p["w"]).shape
        sd[f"{prefix}.conv.weight"] = rng.normal(0, 0.05, (cout, cin, kh, kw)).astype(np.float32)
        sd[f"{prefix}.bn.weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        sd[f"{prefix}.bn.bias"] = rng.normal(0, 0.1, cout).astype(np.float32)
        sd[f"{prefix}.bn.running_mean"] = rng.normal(0, 0.1, cout).astype(np.float32)
        sd[f"{prefix}.bn.running_var"] = rng.uniform(0.5, 2.0, cout).astype(np.float32)

    for block, sub in params.items():
        if "w" in sub:
            fill(block, sub)
        else:
            for br, p in sub.items():
                fill(f"{block}.{br}", p)

    converted = inc.convert_torch_inception(sd)
    # folded BN equals (x*scale+bias) with scale = gamma/sqrt(var+eps)
    g = sd["Conv2d_1a_3x3.bn.weight"]
    v = sd["Conv2d_1a_3x3.bn.running_var"]
    np.testing.assert_allclose(np.asarray(converted["Conv2d_1a_3x3"]["bn_scale"]),
                               g / np.sqrt(v + 1e-3), rtol=1e-6)
    x = jnp.asarray(rng.uniform(0, 1, (1, 3, 75, 75)), jnp.float32)
    feats = inc.features(converted, x)
    assert feats.shape == (1, 2048)
    assert np.isfinite(np.asarray(feats)).all()
