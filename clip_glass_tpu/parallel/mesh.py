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


def clip_tp_spec(clip_params, mesh: Mesh, axis: str = "model"):
    """Sharding SPEC (pytree of NamedShardings matching `clip_params`) for
    Megatron-style tensor parallelism of the CLIP towers over `axis`:
    MLP c_fc column-split / c_proj row-split, attention QKV head-split /
    out-proj row-split. GSPMD inserts the (single) psum per block."""
    rep = NamedSharding(mesh, P())
    if axis not in mesh.axis_names:
        return jax.tree.map(lambda _: rep, clip_params)

    rules = {
        "mlp": {"c_fc_weight": P(None, None, axis), "c_fc_bias": P(None, axis),
                "c_proj_weight": P(None, axis, None), "c_proj_bias": P()},
        "attn": {"in_proj_weight": P(None, None, axis), "in_proj_bias": P(None, axis),
                 "out_proj_weight": P(None, axis, None), "out_proj_bias": P()},
    }

    def towers(tp):
        out = {}
        for k, v in tp.items():
            if k == "blocks":
                out[k] = {
                    grp: {name: NamedSharding(
                        mesh, rules.get(grp, {}).get(name, P()))
                        for name in sub}
                    for grp, sub in v.items()
                }
            else:
                out[k] = jax.tree.map(lambda _: rep, v)
        return out

    return {
        "visual": towers(clip_params["visual"]),
        "text": towers(clip_params["text"]),
        "logit_scale": rep,
    }


def shard_clip_tp(clip_params, mesh: Mesh, axis: str = "model"):
    """Place the CLIP params tensor-parallel over `axis` (see clip_tp_spec).
    The scoring tower gets a model axis on 2-D meshes; the generator stays
    replicated (its per-population batch parallelism dominates)."""
    spec = clip_tp_spec(clip_params, mesh, axis)
    return jax.tree.map(jax.device_put, clip_params, spec)


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
