"""GPT-2 (124M) language model with scan-based KV-cache decoding, TPU-native.

Behavioral reference: gpt2/model.py (tanh-GELU 12-13, TF LayerNorm 15-28,
Conv1D 30-43, scaled causal attention with `w*b - 1e10*(1-b)` masking 45-95,
tied LM head 194-212) and the autoregressive loop of gpt2/sample.py:21-36
(temperature, top-k, argmax when sample=False — the CLIP-GLaSS setting,
reference config.py:19).

TPU-first design:
- All 12 blocks parameter-stacked; one `lax.scan` over layers per token step.
- Decoding is `lax.scan` over a PREALLOCATED [L, 2, B, H, T_max, hd] KV cache
  with position masking — fixed shapes, no concatenation, the whole
  prefill+decode compiles to a single XLA program. The reference instead
  grows `past` tensors per step on the host loop (gpt2/sample.py:26-35).
- Conv1D weights are already [in, out]; no transposes on import.
- Every search genome has identical length (dim_z + len(init_tokens)),
  so there is no padding/ragged handling anywhere.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.dtypes import Policy, FP32

NEG_BIG = -1e10


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5


GPT2_124M = GPT2Config()
TINY = GPT2Config(vocab_size=50257, n_positions=128, n_embd=64, n_layer=2,
                  n_head=2)


# ---------------------------------------------------------------- init

def init(key, cfg: GPT2Config = GPT2_124M, std: float = 0.02):
    D = cfg.n_embd
    ks = jax.random.split(key, 2 + cfg.n_layer)

    def block(k):
        k = jax.random.split(k, 4)
        return {
            "ln_1": {"g": jnp.ones((D,)), "b": jnp.zeros((D,))},
            "attn": {
                "c_attn_w": std * jax.random.normal(k[0], (D, 3 * D)),
                "c_attn_b": jnp.zeros((3 * D,)),
                "c_proj_w": std * jax.random.normal(k[1], (D, D)),
                "c_proj_b": jnp.zeros((D,)),
            },
            "ln_2": {"g": jnp.ones((D,)), "b": jnp.zeros((D,))},
            "mlp": {
                "c_fc_w": std * jax.random.normal(k[2], (D, 4 * D)),
                "c_fc_b": jnp.zeros((4 * D,)),
                "c_proj_w": std * jax.random.normal(k[3], (4 * D, D)),
                "c_proj_b": jnp.zeros((D,)),
            },
        }

    blocks = [block(ks[2 + i]) for i in range(cfg.n_layer)]
    return {
        "wte": std * jax.random.normal(ks[0], (cfg.vocab_size, D)),
        "wpe": std * jax.random.normal(ks[1], (cfg.n_positions, D)),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_f": {"g": jnp.ones((D,)), "b": jnp.zeros((D,))},
    }


# ---------------------------------------------------------------- forward

def _ln(x, p, eps):
    x32 = jnp.asarray(x, jnp.float32)
    u = jnp.mean(x32, -1, keepdims=True)
    s = jnp.mean(jnp.square(x32 - u), -1, keepdims=True)
    y = (x32 - u) * jax.lax.rsqrt(s + eps)
    return (y * p["g"] + p["b"]).astype(x.dtype)


def _gelu(x):
    # tanh approximation (reference gpt2/model.py:12-13)
    return 0.5 * x * (1 + jnp.tanh(math.sqrt(2 / math.pi)
                                   * (x + 0.044715 * jnp.power(x, 3))))


def _block_step(x, bp, cache_kv, pos_offset, cfg: GPT2Config, policy: Policy):
    """One transformer block over x: [B, T, D] with optional KV cache.

    cache_kv: None or [2, B, H, T_max, hd] holding keys/values for positions
    < pos_offset; returns (out, new_kv_for_this_x) where new_kv covers x's
    positions [pos_offset, pos_offset+T).
    """
    B, T, D = x.shape
    H = cfg.n_head
    hd = D // H
    h = _ln(x, bp["ln_1"], cfg.layer_norm_epsilon)
    qkv = h @ policy.cast_compute(bp["attn"]["c_attn_w"]) + policy.cast_compute(bp["attn"]["c_attn_b"])
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)  # [B,H,T,hd]

    q, k, v = heads(q), heads(k), heads(v)

    if cache_kv is None:
        keys, vals = k, v
        key_pos = jnp.arange(T)
    elif T == 1:
        # Decode fast path: the cache is READ-ONLY here — the new token's
        # (k, v) is scored separately and returned as a tiny [2,B,H,1,hd]
        # slab for the caller to scatter into the big cache ONCE per step.
        # (The earlier formulation updated and re-stacked the full cache in
        # every layer of every step: ~3 extra copies of the whole cache per
        # decoded token, 22+ ms of pure copy per 30-token pop-100 decode.)
        T_max = cache_kv.shape[-2]
        lo = jnp.einsum("bhqd,bhkd->bhqk", q, cache_kv[0],
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
        ln = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
        # reference masking semantics (gpt2/model.py:66-67): cache slots at
        # positions >= pos_offset are stale -> masked; the appended new
        # token is position pos_offset itself (q_pos == key_pos, unmasked)
        mask = (jnp.arange(T_max)[None, None, None, :]
                < pos_offset).astype(jnp.float32)
        lo = lo * mask + NEG_BIG * (1.0 - mask)
        w = jax.nn.softmax(jnp.concatenate([lo, ln], axis=-1), axis=-1)
        w = w.astype(v.dtype)
        a = jnp.einsum("bhqk,bhkd->bhqd", w[..., :T_max], cache_kv[1]) \
            + w[..., T_max:] * v
        a = a.transpose(0, 2, 1, 3).reshape(B, T, D)
        a = a @ policy.cast_compute(bp["attn"]["c_proj_w"]) \
            + policy.cast_compute(bp["attn"]["c_proj_b"])
        x = x + a
        h = _ln(x, bp["ln_2"], cfg.layer_norm_epsilon)
        h = _gelu(h @ policy.cast_compute(bp["mlp"]["c_fc_w"])
                  + policy.cast_compute(bp["mlp"]["c_fc_b"]))
        h = h @ policy.cast_compute(bp["mlp"]["c_proj_w"]) \
            + policy.cast_compute(bp["mlp"]["c_proj_b"])
        return x + h, jnp.stack([k, v])
    else:
        T_max = cache_kv.shape[-2]
        keys = jax.lax.dynamic_update_slice_in_dim(
            cache_kv[0], k, pos_offset, axis=2)
        vals = jax.lax.dynamic_update_slice_in_dim(
            cache_kv[1], v, pos_offset, axis=2)
        key_pos = jnp.arange(T_max)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, keys,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    q_pos = pos_offset + jnp.arange(T)
    # reference masking: w*b - 1e10*(1-b) (gpt2/model.py:66-67)
    mask = (key_pos[None, :] <= q_pos[:, None]).astype(jnp.float32)
    logits = logits * mask + NEG_BIG * (1.0 - mask)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    a = jnp.einsum("bhqk,bhkd->bhqd", w, vals)
    a = a.transpose(0, 2, 1, 3).reshape(B, T, D)
    a = a @ policy.cast_compute(bp["attn"]["c_proj_w"]) + policy.cast_compute(bp["attn"]["c_proj_b"])
    x = x + a

    h = _ln(x, bp["ln_2"], cfg.layer_norm_epsilon)
    h = _gelu(h @ policy.cast_compute(bp["mlp"]["c_fc_w"]) + policy.cast_compute(bp["mlp"]["c_fc_b"]))
    h = h @ policy.cast_compute(bp["mlp"]["c_proj_w"]) + policy.cast_compute(bp["mlp"]["c_proj_b"])
    x = x + h
    new_kv = None if cache_kv is None else jnp.stack([keys, vals])
    return x, new_kv


def forward(params, input_ids, cfg: GPT2Config = GPT2_124M,
            cache: Optional[jnp.ndarray] = None, pos_offset=0,
            policy: Policy = FP32) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """input_ids: [B, T] -> (logits [B, T, V], new_cache).

    cache: None, a stacked [L, 2, B, H, T_max, hd] array, or a per-layer
    TUPLE of [2, B, H, T_max, hd] arrays. With a cache, positions
    [pos_offset, pos_offset+T) are written and attention spans the full
    cache with position masking. The tuple form unrolls the layer loop with
    STATIC layer indices, so every cache read is a view — the stacked
    form's rolled fori_loop must dynamic_index_in_dim the layer cache,
    which XLA materializes as a full per-layer copy every layer of every
    token (measured 46% of the decode loop wall-clock at batch 400:
    38.7 of 83 ms in dynamic-slice fusions). sample_sequence uses the
    tuple form; the stacked form remains for incremental external use.
    """
    x = policy.cast_compute(params["wte"][input_ids])
    pos = pos_offset + jnp.arange(input_ids.shape[1])
    x = x + policy.cast_compute(params["wpe"][pos])

    if cache is None:
        def body(h, bp):
            h, _ = _block_step(h, bp, None, 0, cfg, policy)
            return h, None
        x, _ = jax.lax.scan(body, x, params["blocks"])
        new_cache = None
    elif isinstance(cache, (tuple, list)):
        new_cache = []
        for l in range(cfg.n_layer):
            bp = jax.tree.map(lambda a: a[l], params["blocks"])
            x, new_kv = _block_step(x, bp, cache[l], pos_offset, cfg, policy)
            if input_ids.shape[1] == 1:
                # fast path returned only the new token's [2,B,H,1,hd] slab
                new_cache.append(jax.lax.dynamic_update_slice(
                    cache[l], new_kv.astype(cache[l].dtype),
                    (0, 0, 0, pos_offset, 0)))
            else:
                new_cache.append(new_kv)   # full updated layer cache
        new_cache = tuple(new_cache)
    elif input_ids.shape[1] == 1:
        # decode fast path: fori_loop carrying the cache, each layer writing
        # only its [2,B,H,1,hd] new-token slab in place (a scan's ys would
        # rebuild the whole cache buffer every step — measured 13 ms of
        # dynamic-update copies per 30-token pop-100 decode).
        # Measured round 3 and kept: statically UNROLLING this loop (weight
        # slices become views fused into the matmuls, removing the
        # dynamic_index_in_dim weight-copy pass) leaves the decode device
        # time unchanged (42.5 vs 40.2 ms/generation at pop 100) — the
        # sequential token loop is per-op LATENCY-bound (~1.1 ms/token over
        # ~75 small ops), not weight-bandwidth-bound, so the rolled form
        # wins on compile time and program size.
        def body(l, carry):
            h, c = carry
            bp = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, l, 0,
                                                       keepdims=False),
                params["blocks"])
            layer_cache = jax.lax.dynamic_index_in_dim(c, l, 0,
                                                       keepdims=False)
            h, new_kv = _block_step(h, bp, layer_cache, pos_offset, cfg,
                                    policy)
            c = jax.lax.dynamic_update_slice(
                c, new_kv[None].astype(c.dtype),
                (l, 0, 0, 0, pos_offset, 0))
            return h, c
        x, new_cache = jax.lax.fori_loop(0, cfg.n_layer, body, (x, cache))
    else:
        def body(h, xs):
            bp, layer_cache = xs
            h, new_kv = _block_step(h, bp, layer_cache, pos_offset, cfg, policy)
            return h, new_kv
        x, new_cache = jax.lax.scan(body, x, (params["blocks"], cache))

    x = _ln(x, params["ln_f"], cfg.layer_norm_epsilon)
    logits = x @ policy.cast_compute(params["wte"]).T
    return logits, new_cache


# ---------------------------------------------------------------- sampling

def _select_next(logits, temperature, top_k, sample, key):
    """Next-token rule of reference gpt2/sample.py:10-34: temperature scale,
    top-k floor mask to -1e10, then multinomial (stochastic) or top-1.

    Deterministic path (sample=False, the CLIP-GLaSS default,
    reference config.py:19): the top-k mask only ever REMOVES non-maximal
    logits, so argmax(masked) == argmax(unmasked) — the mask is elided.
    This is bit-exact (verified) and removes a lax.top_k over the 50257-wide
    vocab from every decode step (measured 250 -> 85 ms for a 30-token
    pop-100 decode on a v5e: top_k was 2/3 of the decode wall-clock)."""
    if temperature <= 0:
        # the argmax elision below (and the reference's division) both
        # presuppose a positive temperature
        raise ValueError(f"temperature must be > 0, got {temperature}")
    logits = jnp.asarray(logits, jnp.float32)
    if not sample:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1]
        logits = jnp.where(logits < kth[:, None], NEG_BIG, logits)
    return jax.random.categorical(key, logits, axis=-1)


def sample_sequence(params, context, length: int, cfg: GPT2Config = GPT2_124M,
                    temperature: float = 1.0, top_k: int = 0,
                    sample: bool = False, key=None,
                    policy: Policy = FP32) -> jnp.ndarray:
    """context: [B, T0] int32 -> [B, T0 + length] generated ids.

    One jittable program: prefill fills the cache for the T0 context tokens,
    then `lax.scan` decodes `length` tokens (reference gpt2/sample.py:21-36;
    deterministic argmax path is the CLIP-GLaSS default, config.py:19).
    """
    B, T0 = context.shape
    T_max = T0 + length
    H, hd = cfg.n_head, cfg.n_embd // cfg.n_head
    # per-layer cache tuple: static layer indices in forward's unrolled
    # path make cache reads views instead of per-layer dynamic-slice
    # copies (46% of the decode loop, see forward's docstring)
    cache = tuple(jnp.zeros((2, B, H, T_max, hd), policy.compute_dtype)
                  for _ in range(cfg.n_layer))
    if key is None:
        key = jax.random.PRNGKey(0)

    # Pre-cast the matmul weights ONCE, outside the decode scan: XLA does
    # not reliably hoist the per-use compute-dtype casts out of the while
    # loop, and a 124M-param fp32 read + bf16 write per decoded token
    # dominates the memory-bound decode. Values are identical (the layers
    # cast to compute dtype at use anyway; cast of a cast is a no-op).
    # LayerNorm params are untouched: _ln consumes them in fp32.
    params = dict(params)
    params["blocks"] = {**params["blocks"],
                        "attn": jax.tree.map(policy.cast_compute,
                                             params["blocks"]["attn"]),
                        "mlp": jax.tree.map(policy.cast_compute,
                                            params["blocks"]["mlp"])}
    params["wte"] = policy.cast_compute(params["wte"])
    params["wpe"] = policy.cast_compute(params["wpe"])

    logits, cache = forward(params, context, cfg, cache, 0, policy)
    key, sub = jax.random.split(key)
    nxt = _select_next(logits[:, -1], temperature, top_k, sample, sub)

    def step(carry, _):
        tok, cache, pos, key = carry
        logits, cache = forward(params, tok[:, None], cfg, cache, pos, policy)
        key, sub = jax.random.split(key)
        nxt = _select_next(logits[:, -1], temperature, top_k, sample, sub)
        return (nxt, cache, pos + 1, key), tok

    # the prefill already produced generated token #1; scan the rest
    (last, _, _, _), toks = jax.lax.scan(
        step, (nxt, cache, T0, key), None, length=length - 1)
    gen = jnp.concatenate([toks.T, last[:, None]], axis=1)  # [B, length]
    return jnp.concatenate([context, gen], axis=1)
