"""Orbax GA-state checkpoint backend round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.checkpoint import (
    load_state,
    load_state_orbax,
    save_state,
    save_state_orbax,
)
from clip_glass_tpu.evolve.algorithm import GAState


@pytest.fixture
def state():
    return GAState(X=jnp.asarray(np.random.default_rng(0).normal(size=(8, 5)),
                                 jnp.float32),
                   F=jnp.zeros((8, 2)), key=jax.random.PRNGKey(3),
                   gen=jnp.int32(11))


def test_orbax_roundtrip(state, tmp_path):
    save_state_orbax(state, str(tmp_path))
    r = load_state_orbax(str(tmp_path))
    np.testing.assert_array_equal(np.asarray(r.X), np.asarray(state.X))
    np.testing.assert_array_equal(np.asarray(r.key), np.asarray(state.key))
    assert int(r.gen) == 11
    assert load_state_orbax(str(tmp_path / "nope")) is None


def test_npz_and_orbax_agree(state, tmp_path):
    save_state(state, str(tmp_path), "cfg")
    save_state_orbax(state, str(tmp_path))
    a = load_state(str(tmp_path))
    b = load_state_orbax(str(tmp_path))
    np.testing.assert_array_equal(np.asarray(a.X), np.asarray(b.X))
    assert int(a.gen) == int(b.gen)