"""GA search checkpoint / resume.

The reference's GA driver has NO resume path — only periodic artifact dumps
and a final result pickle (reference run.py:29-51, 79-101; SURVEY.md §5.4).
Here the full search state (population X, fitness F, PRNG key, generation
counter) is a small pytree saved as npz every save cadence, making long
searches preemption-safe: `run.py --resume` continues bit-exactly where the
dump left off (same key stream, same population).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from clip_glass_tpu.evolve.algorithm import GAState
from clip_glass_tpu.parallel import distributed as dist

STATE_FILE = "ga_state.npz"


def save_state(state: GAState, folder: str, config_name: str = "") -> str:
    path = os.path.join(folder, STATE_FILE)
    # fetch is a collective (process_allgather) when state spans hosts, so
    # EVERY process runs it; only process 0 touches the filesystem (the
    # reference's rank-0 checkpointing, train.py:560-575).
    X, F = dist.fetch(state.X), dist.fetch(state.F)
    key, gen = dist.fetch(state.key), dist.fetch(state.gen)
    if not dist.is_primary():
        return path
    os.makedirs(folder, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, X=X, F=F, key=key, gen=gen,
                 config=np.asarray(config_name))
    os.replace(tmp, path)  # atomic: never a torn checkpoint
    return path


def load_state(folder: str) -> Optional[GAState]:
    path = os.path.join(folder, STATE_FILE)
    if not os.path.exists(path):
        return None
    with np.load(path) as d:
        return GAState(X=jnp.asarray(d["X"]), F=jnp.asarray(d["F"]),
                       key=jnp.asarray(d["key"]), gen=jnp.asarray(d["gen"]))


def checkpoint_config_name(folder: str) -> Optional[str]:
    path = os.path.join(folder, STATE_FILE)
    if not os.path.exists(path):
        return None
    with np.load(path) as d:
        return str(d["config"]) if "config" in d else None


# ---------------------------------------------------------------- orbax

def save_state_orbax(state: GAState, folder: str) -> str:
    """Orbax backend (async-capable, multi-host-aware) for the same GA state;
    npz remains the default for its zero-dependency portability."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(folder, "orbax_state"))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state._asdict(), force=True)
    return path


def load_state_orbax(folder: str) -> Optional[GAState]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(folder, "orbax_state"))
    if not os.path.exists(path):
        return None
    ckptr = ocp.PyTreeCheckpointer()
    d = ckptr.restore(path)
    return GAState(X=jnp.asarray(d["X"]), F=jnp.asarray(d["F"]),
                   key=jnp.asarray(d["key"]), gen=jnp.asarray(d["gen"]))
