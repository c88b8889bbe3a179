"""Multi-host (multi-process) initialization and host-side data movement.

TPU-native equivalent of the reference trainer's per-rank rendezvous
(reference stylegan2/train.py:258-277: MASTER_ADDR/MASTER_PORT env vars, one
process per GPU rank, torch.distributed NCCL init). On TPU the unit is one
process per HOST: `jax.distributed.initialize` connects every process to a
coordinator, after which `jax.devices()` is the GLOBAL device list and one
`jax.sharding.Mesh` over it makes every existing jitted step multi-host —
GSPMD inserts the collectives; there is no per-rank code path.

Mesh-layout doctrine (SURVEY.md §5.8, scaling-book): axes whose collectives
run EVERY step at model-tensor granularity (the CLIP tensor-parallel `model`
axis) must stay inside one host's devices so they ride ICI; the population /
search / training-batch axes are embarrassingly parallel — one small
all-gather of [pop, n_var] per GA generation, one gradient reduce per train
step — and may span hosts (DCN). `make_global_mesh` encodes that: the
process dimension always lands on the LEADING (pop/batch) axis and the model
axis is carved out of each process's local devices.

Host-side reads change under multi-host: a process-spanning jax.Array is not
fully addressable, so `np.asarray(state.X)` raises. `fetch` below is the one
chokepoint — identity-cheap in single-process mode, a tiled
`multihost_utils.process_allgather` when distributed — and `is_primary()`
gates file writes to process 0 (every process computes; one process owns the
artifact directory, matching the reference's rank-0 checkpointing,
train.py:560-575).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

ENV_SPEC = "CGT_DISTRIBUTED"

_initialized = False


def initialize(spec: Optional[str] = None) -> bool:
    """Gate `jax.distributed.initialize` on a spec string (flag or env).

    spec forms (CLI `--distributed`, or the CGT_DISTRIBUTED env var):
      - ``"auto"``                   — cluster auto-detection (TPU pods: the
        metadata server supplies coordinator/count/index; GKE/SLURM likewise)
      - ``"<host:port>,<num>,<id>"`` — explicit rendezvous, the direct analog
        of the reference's MASTER_ADDR/MASTER_PORT + rank (train.py:258-277)
      - ``None`` / ``""``            — single-process; no-op, returns False

    Must run before the first JAX backend touch. Idempotent: a second call
    (with any spec) after successful initialization is a no-op returning
    True, so library entry points can call it defensively.
    """
    global _initialized
    if _initialized:
        return True
    spec = spec if spec is not None else os.environ.get(ENV_SPEC, "")
    if not spec:
        return False
    if spec == "auto":
        jax.distributed.initialize()
    else:
        parts = spec.split(",")
        if len(parts) != 3:
            raise ValueError(
                f"--distributed spec {spec!r}: expected 'auto' or "
                "'<host:port>,<num_processes>,<process_id>'")
        jax.distributed.initialize(coordinator_address=parts[0],
                                   num_processes=int(parts[1]),
                                   process_id=int(parts[2]))
    _initialized = True
    return True


def active() -> bool:
    """True when this runtime spans more than one process."""
    return jax.process_count() > 1


def is_primary() -> bool:
    """Process 0 owns file artifacts (checkpoints, image dumps, result
    pickles); every process still computes and must reach the same
    collectives in the same order."""
    return jax.process_index() == 0


def fetch(x) -> np.ndarray:
    """Device array -> full host ndarray, on every process.

    Single-process (or fully-addressable array): plain np.asarray. A
    process-spanning array: tiled `process_allgather` — each process
    contributes its addressable shards over DCN and receives the full
    value, so checkpoint/artifact code downstream is topology-blind.
    """
    if (not hasattr(x, "is_fully_addressable") or x.is_fully_addressable
            or getattr(x, "is_fully_replicated", False)):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def fetch_tree(tree):
    """`fetch` over a pytree."""
    return jax.tree.map(fetch, tree)


def make_global_mesh(model_axis_size: int = 1,
                     pop_axis: str = "pop",
                     model_axis: str = "model",
                     devices: Optional[Sequence] = None) -> Mesh:
    """A mesh over ALL processes' devices with the model axis intra-host.

    Global devices are ordered process-major (jax.devices() groups by
    process), so reshaping to [n_global // model, model] with
    model_axis_size dividing the per-process device count keeps every
    model-axis group inside one host: its per-block psums ride ICI, and
    only the pop/batch axis (one small all-gather per generation) crosses
    DCN. model_axis_size=1 returns the 1-D pop mesh every existing
    `--mesh` caller uses.
    """
    devices = list(devices) if devices is not None else list(jax.devices())
    local = jax.local_device_count()
    if model_axis_size > 1:
        if local % model_axis_size:
            raise ValueError(
                f"model_axis_size {model_axis_size} must divide the "
                f"per-process device count {local} (the model axis must "
                "not span hosts: its per-block collectives belong on ICI)")
        arr = np.asarray(devices).reshape(-1, model_axis_size)
        return Mesh(arr, (pop_axis, model_axis))
    return Mesh(np.asarray(devices), (pop_axis,))


def global_batch_from_local(mesh: Mesh, local_batch: np.ndarray,
                            axis=None):
    """Assemble per-process host batches into one batch-sharded global array
    (the trainer's data-parallel input path: each host loads ITS slice of
    the global batch — reference train.py's per-rank DataLoader — and the
    global array stitches them, zero cross-host data movement).

    Single-process meshes take the plain device_put path. `axis` (a mesh
    axis name, or a tuple of names collapsed onto the batch dimension)
    defaults to the mesh's leading axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    axis = axis if axis is not None else mesh.axis_names[0]
    spec = PartitionSpec(tuple(axis) if isinstance(axis, (tuple, list))
                         else axis)
    if not active():
        return jax.device_put(np.asarray(local_batch),
                              NamedSharding(mesh, spec))
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(
        np.asarray(local_batch), mesh, spec)
