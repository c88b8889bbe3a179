"""Edge-case hardening across the public surfaces."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.config import get_config
from clip_glass_tpu.evolve.algorithm import make_step, operators_for_config
from clip_glass_tpu.evolve.nds import crowding_distance, non_dominated_rank
from clip_glass_tpu.tokenizers import get_clip_tokenizer, get_gpt2_tokenizer, tokenize


def test_odd_pop_size_rejected():
    cfg = get_config("StyleGAN2_ffhq_nod").replace(pop_size=7)
    ops = operators_for_config(cfg)
    with pytest.raises(ValueError, match="even"):
        make_step(ops, lambda X, ctx, key: X[:, :1], 7, "ga")


def test_unknown_config_rejected():
    with pytest.raises(KeyError, match="unknown config"):
        get_config("nope")


def test_tokenizers_empty_string():
    assert get_gpt2_tokenizer().encode("") == []
    assert get_clip_tokenizer().encode("") == []
    out = tokenize("")
    assert out.shape == (1, 77)
    assert out[0, 0] == 49406 and out[0, 1] == 49407


def test_tokenizers_whitespace_only():
    # GPT-2 keeps whitespace tokens; CLIP's cleaner strips them
    assert get_gpt2_tokenizer().encode("   ") != []
    assert get_clip_tokenizer().encode("   ") == []


def test_nds_identical_points():
    """All-identical fitness: everyone is rank 0 (nobody strictly dominates)."""
    F = jnp.ones((6, 2))
    rank = np.asarray(non_dominated_rank(F))
    np.testing.assert_array_equal(rank, 0)
    crowd = np.asarray(crowding_distance(F, jnp.asarray(rank)))
    assert np.isfinite(crowd).all() or np.isinf(crowd).any()  # no NaNs
    assert not np.isnan(crowd).any()


def test_nds_single_objective_column():
    F = jnp.asarray([[3.0], [1.0], [2.0]])
    rank = np.asarray(non_dominated_rank(F))
    np.testing.assert_array_equal(rank, [2, 0, 1])


def test_operator_closure_over_replaced_bounds():
    """operators_for_config must honor config.replace'd bounds."""
    cfg = get_config("StyleGAN2_ffhq_nod").replace(n_var=4, xl=-1.0, xu=1.0)
    ops = operators_for_config(cfg)
    key = jax.random.PRNGKey(0)
    x1 = jnp.full((8, 4), 0.9)
    x2 = jnp.full((8, 4), -0.9)
    o1, o2 = ops.cross(key, x1, x2)
    assert float(jnp.abs(jnp.concatenate([o1, o2])).max()) <= 1.0
    m = ops.mutate(key, x1)
    assert float(jnp.abs(m).max()) <= 1.0
