"""Device mesh + population sharding.

The reference's only distributed machinery is the Trainer's NCCL
all_reduce/broadcast (reference stylegan2/train.py:275-430), and it scales
search only by host-side minibatch loops (reference models.py:75-130). The
TPU-native scale-out instead shards the POPULATION axis of the GA over a
1-D `jax.sharding.Mesh`:

- genomes X [pop, n_var] and fitness F [pop, n_obj] carry
  NamedSharding(P('pop')), model params are replicated;
- the jitted generation step runs under GSPMD: the generator+CLIP forward
  (all the FLOPs) partitions cleanly along the batch axis with zero
  communication, XLA inserts the tiny all-gather of F/X needed by global
  survival (O(pop * n_var) bytes, riding ICI);
- nothing else changes — the same step function runs on 1 chip or a pod.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

POP_AXIS = "pop"


def make_mesh(devices: Optional[Sequence] = None, axis: str = POP_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else list(jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def population_sharding(mesh: Mesh, axis: str = POP_AXIS) -> NamedSharding:
    """Rows of [pop, ...] arrays split across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh):
    """Place a GAState on the mesh: X/F population-sharded, key/gen replicated."""
    pop = population_sharding(mesh)
    rep = replicated_sharding(mesh)
    return type(state)(
        X=jax.device_put(state.X, pop),
        F=jax.device_put(state.F, pop),
        key=jax.device_put(state.key, rep),
        gen=jax.device_put(state.gen, rep),
    )
