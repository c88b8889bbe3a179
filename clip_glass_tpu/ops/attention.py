"""Multi-head attention (lax/einsum formulation).

Matches torch nn.MultiheadAttention's eager math as used by the reference
CLIP blocks (reference clip/model.py:164-187): fused QKV in-projection,
1/sqrt(head_dim) scaling, additive mask, fp32 softmax, output projection.
Batch-first throughout. A fused Pallas kernel for the population-batched
small-sequence shapes of this workload lives in ops/pallas/attention.py;
this module is the portable reference path and the CPU fallback.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.dtypes import Policy, FP32


def multi_head_attention(x, in_proj_w, in_proj_b, out_proj_w, out_proj_b,
                         n_head: int, mask: Optional[jnp.ndarray] = None,
                         policy: Policy = FP32):
    """x: [B, T, D]; in_proj_w: [D, 3D]; out_proj_w: [D, D] (right-multiply
    layout — torch's [3D, D] weights are transposed on import)."""
    B, T, D = x.shape
    hd = D // n_head
    qkv = x @ policy.cast_compute(in_proj_w) + policy.cast_compute(in_proj_b)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, T, n_head, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    if mask is not None:
        logits = logits + jnp.asarray(mask, jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    return out @ policy.cast_compute(out_proj_w) + policy.cast_compute(out_proj_b)
