"""Mixed-precision policy.

The reference CLIP runs fp16 linear/attention weights with fp32 LayerNorms
(reference clip/model.py:152-158, 339-360). On TPU the analogous policy is
bfloat16 compute with fp32 normalization statistics and fp32 parameters —
bf16 keeps the MXU at full rate while fp32 LN preserves the fitness signal
(cosine similarities differ by <1e-2 from fp32, gated in tests).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    "int32": jnp.int32,
}


def resolve_dtype(d):
    if isinstance(d, str):
        return _DTYPES[d]
    return d


@dataclasses.dataclass(frozen=True)
class Policy:
    """param_dtype: storage; compute_dtype: matmul/conv inputs; norm in fp32."""

    param_dtype: object = jnp.float32
    compute_dtype: object = jnp.bfloat16

    @staticmethod
    def make(param_dtype="float32", compute_dtype="bfloat16") -> "Policy":
        return Policy(resolve_dtype(param_dtype), resolve_dtype(compute_dtype))

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_param(self, x):
        return jnp.asarray(x, self.param_dtype)


FP32 = Policy(jnp.float32, jnp.float32)
BF16 = Policy(jnp.float32, jnp.bfloat16)


def precast_params(params, policy: Policy, exclude_prefixes: tuple = ()):
    """Pre-cast every float leaf of a FROZEN param tree to the compute
    dtype, once, except leaves whose path contains a key starting with one
    of `exclude_prefixes` (the leaves a forward reads RAW in fp32 — norm
    scales/stats etc.; each model names its own set, e.g.
    clip.model.PRECAST_EXCLUDE).

    Exact when every non-excluded consumer feeds the leaf through
    policy.cast_compute first (bf16(w) is bitwise the value the uncast
    program computes; cast_compute on an already-bf16 leaf is a no-op) —
    asserted bitwise per model in tests. As jit INPUTS, fp32 weights
    re-convert inside EVERY generation step; staged trees also halve the
    frozen weights' HBM footprint."""
    def cast(path, leaf):
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype,
                                                            jnp.floating):
            return leaf
        for p in path:
            key = getattr(p, "key", None)
            if isinstance(key, str) and any(
                    key.startswith(e) for e in exclude_prefixes):
                return leaf
        return policy.cast_compute(leaf)

    return jax.tree_util.tree_map_with_path(cast, params)
