"""TF-pickle converter vs the reference's convert_from_tf, using synthetic
TF variable sets as the common source and the reference-converted torch
modules as the numerical oracle."""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.dtypes import FP32
from clip_glass_tpu.models.stylegan2 import model as sg2
from clip_glass_tpu.weights import convert_stylegan2_tf as tfconv

from reference_oracle import import_reference_stylegan2, _stub

torch = pytest.importorskip("torch")

ref_models, _ = import_reference_stylegan2()


def _ref_convert_from_tf():
    import importlib
    import sys
    try:
        import requests  # noqa: F401  (real package, if installed)
    except ImportError:
        _stub("requests")
    sys.modules["stylegan2"].models = ref_models
    import stylegan2.utils as _u  # ensure loaded under synthetic pkg
    sys.modules["stylegan2"].utils = _u
    return importlib.import_module("stylegan2.convert_from_tf")


class NS(dict):
    """dict with attribute access (both access styles appear in the
    reference converter and in ours)."""
    __getattr__ = dict.__getitem__


class FakeNet:
    def __init__(self, build_func_name, variables, static_kwargs=None,
                 components=None):
        self.build_func_name = build_func_name
        self.variables = variables
        self.static_kwargs = static_kwargs or {}
        self.components = NS(components or {})


LATENT = 32
rng = np.random.default_rng(42)


def _r(*shape):
    return rng.normal(0, 0.5, shape).astype(np.float32)


def _conv_vars(prefix, kh, i, o, noise=True):
    v = [(f"{prefix}/weight", _r(kh, kh, i, o)),
         (f"{prefix}/bias", _r(o)),
         (f"{prefix}/mod_weight", _r(LATENT, i)),
         (f"{prefix}/mod_bias", _r(i))]
    if noise:
        v.append((f"{prefix}/noise_strength", np.float32(rng.normal(0, 0.3))))
    return v


@pytest.fixture(scope="module")
def g_states():
    syn_vars = [("4x4/Const/const", _r(1, 16, 4, 4))]
    syn_vars += _conv_vars("4x4/Conv", 3, 16, 16)
    syn_vars += _conv_vars("4x4/ToRGB", 1, 16, 3, noise=False)
    syn_vars += _conv_vars("8x8/Conv0_up", 3, 16, 24)
    syn_vars += _conv_vars("8x8/Conv1", 3, 24, 24)
    syn_vars += _conv_vars("8x8/ToRGB", 1, 24, 3, noise=False)
    syn_vars += [("noise0", _r(1, 1, 4, 4)), ("noise1", _r(1, 1, 8, 8)),
                 ("noise2", _r(1, 1, 8, 8))]
    map_vars = []
    for i in range(2):
        map_vars += [(f"Dense{i}/weight", _r(LATENT, LATENT)),
                     (f"Dense{i}/bias", _r(LATENT))]
    g_main = FakeNet("G_main", [("dlatent_avg", _r(LATENT))],
                     components={
                         "mapping": FakeNet("G_mapping", map_vars),
                         "synthesis": FakeNet("G_synthesis_stylegan2", syn_vars)})
    return g_main


def test_generator_tf_conversion_matches_reference(g_states):
    cft = _ref_convert_from_tf()
    G_t = cft.convert_from_tf(g_states).eval()

    params, cfg, noises = tfconv.convert_generator_tf(g_states)
    assert cfg.channels == (24, 16)
    assert cfg.latent_size == LATENT and cfg.mapping_layers == 2
    assert len(noises) == 3

    z = rng.normal(size=(2, LATENT)).astype(np.float32)
    with torch.no_grad():
        G_t(torch.from_numpy(z))  # populate noise shapes
        G_t.static_noise(noise_tensors=[
            torch.from_numpy(np.asarray(n))[None, None] for n in noises])
        want = G_t(torch.from_numpy(z)).numpy()
    got = np.asarray(jax.jit(
        lambda p, a: sg2.generator_apply(p, a, cfg, noise=list(noises),
                                         policy=FP32))(params, jnp.asarray(z)))
    assert got.shape == want.shape == (2, 3, 8, 8)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_discriminator_tf_conversion_matches_reference():
    d_vars = []
    d_vars += [("8x8/FromRGB/weight", _r(1, 1, 3, 16)),
               ("8x8/FromRGB/bias", _r(16))]
    d_vars += [("8x8/Conv0/weight", _r(3, 3, 16, 16)), ("8x8/Conv0/bias", _r(16)),
               ("8x8/Conv1_down/weight", _r(3, 3, 16, 24)),
               ("8x8/Conv1_down/bias", _r(24)),
               ("8x8/Skip/weight", _r(1, 1, 16, 24))]
    d_vars += [("4x4/Conv/weight", _r(3, 3, 25, 24)), ("4x4/Conv/bias", _r(24)),
               ("4x4/Dense0/weight", _r(24 * 16, 24)), ("4x4/Dense0/bias", _r(24)),
               ("Output/weight", _r(24, 1)), ("Output/bias", _r(1))]
    d_state = FakeNet("D_stylegan2", d_vars,
                      static_kwargs={"mbstd_group_size": 2})

    cft = _ref_convert_from_tf()
    D_t = cft.convert_from_tf(d_state).eval()
    # NOTE reference bug: convert_from_tf never assigns the dense head
    # (Dense0/Output are left at random init, convert_from_tf.py:271-303);
    # patch the oracle with the correct mapping so full outputs compare.
    dv = dict(d_vars)
    with torch.no_grad():
        D_t.dense[0].layer.weight.copy_(torch.from_numpy(dv["4x4/Dense0/weight"].T))
        D_t.dense[0].bias.copy_(torch.from_numpy(dv["4x4/Dense0/bias"]))
        D_t.dense[1].layer.weight.copy_(torch.from_numpy(dv["Output/weight"].T))
        D_t.dense[1].bias.copy_(torch.from_numpy(dv["Output/bias"]))

    params, cfg = tfconv.convert_discriminator_tf(d_state)
    assert cfg.channels == (16, 24)
    assert cfg.mbstd_group_size == 2

    imgs = rng.uniform(-1, 1, (4, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = D_t(torch.from_numpy(imgs)).numpy()
    got = np.asarray(jax.jit(
        lambda p, a: sg2.discriminator_apply(p, a, cfg, policy=FP32))(
            params, jnp.asarray(imgs)))
    assert got.shape == want.shape == (4, 1)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_pickle_stub_roundtrip(tmp_path):
    """A pickle referencing dnnlib.tflib.network.Network loads via the stub
    unpickler without dnnlib installed."""
    import pickle
    import sys

    mod = types.ModuleType("dnnlib.tflib.network")
    Network = type("Network", (), {})
    Network.__module__ = "dnnlib.tflib.network"
    Network.__qualname__ = "Network"
    mod.Network = Network
    sys.modules.setdefault("dnnlib", types.ModuleType("dnnlib"))
    sys.modules.setdefault("dnnlib.tflib", types.ModuleType("dnnlib.tflib"))
    sys.modules["dnnlib.tflib.network"] = mod
    try:
        obj = Network()
        obj.__dict__.update({"build_func_name": "G_main",
                             "variables": [("x", np.ones(2))]})
        path = tmp_path / "net.pkl"
        with open(path, "wb") as f:
            pickle.dump(obj, f)
    finally:
        del sys.modules["dnnlib.tflib.network"]
    loaded = tfconv.load_tf_pickle(str(path))
    assert loaded.build_func_name == "G_main"
