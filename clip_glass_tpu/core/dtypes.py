"""Mixed-precision policy.

The reference CLIP runs fp16 linear/attention weights with fp32 LayerNorms
(reference clip/model.py:152-158, 339-360). On TPU the analogous policy is
bfloat16 compute with fp32 normalization statistics and fp32 parameters —
bf16 keeps the MXU at full rate while fp32 LN preserves the fitness signal
(cosine similarities differ by <1e-2 from fp32, gated in tests).
"""

from __future__ import annotations

import dataclasses

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
