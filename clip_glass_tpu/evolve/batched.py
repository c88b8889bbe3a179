"""Multi-search batching: K independent searches, one compiled program.

The reference serves ONE target per process (reference run.py:22 — a single
`--target` string drives the whole run), so throughput at its pinned
population sizes (16 for StyleGAN2, 32 for BigGAN512 — reference
config.py:85,65) is capped by how well a pop-sized batch feeds the MXU.
This module runs K searches — same config/weights, DIFFERENT targets — as
one `jax.vmap`-batched generation step: the convolutions execute at batch
K*pop (the measured-throughput sweet spot: the flagship per-candidate rate
at batch 64 is ~6% (bf16) / ~9% (int8) above batch 16), while every search
keeps the reference's per-search semantics bitwise:

- selection / crossover / mutation / dedup / survival vmap per-search
  (fixed shapes, no cross-search interaction by construction);
- D's minibatch-std groups see only their own search's batch (vmap
  semantics), exactly like K separate processes;
- only the `target` leaf of the parameter bundle is batched ([K, 1, D]
  CLIP features); weights/noise stay unbatched — no memory duplication.

Scale-out: the SEARCH axis is embarrassingly parallel (survival is
per-search), so sharding state along it (parallel.shard_state places axis
0 on the mesh's data axis) runs K searches across chips with zero
cross-chip collectives — the serving layout. Population sharding within a
search (test_parallel.py) composes on a 2-D mesh if pop is also large.

img2txt (GPT-2) batches through the same API. On backends with
pure_callback support the BPE round trip serializes per search inside one
jitted program (vmap_method="sequential"); on host-staged backends (the
axon tunnel) the DEVICE stages still batch across searches — one decode
scan at batch K*pop and one CLIP scoring dispatch, with only the host BPE
running per search (Generator.host_eval_population_batched). The decode is
the latency-bound stage of the GPT-2 workload (~10% MFU at batch 100), so
K-batching it multiplies arithmetic per dispatched op without adding ops.
Stochastic decode (config.stochastic, non-reference) keeps the per-search
host loop — the batched scan would share one sampling key.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from clip_glass_tpu.evolve.algorithm import (Algorithm, GAState, Result,
                                             extract_result, make_jit_chunk)
from clip_glass_tpu.parallel.distributed import fetch


def batched_targets_bundle(problem, targets) -> dict:
    """The parameter bundle with the `target` leaf stacked to [K, 1, D]
    (one CLIP feature row per search; everything else shared). Target
    features are computed in ONE encode call over all K prompts/images
    (Generator.encode_targets)."""
    gen = problem.generator
    bundle = dict(gen.bundle)
    bundle["target"] = gen.encode_targets(list(targets))[:, None, :]
    return bundle


def _ctx_axes(ctx) -> dict:
    """vmap in_axes pytree-prefix for the batched bundle: only `target`
    carries the search axis."""
    return {k: (0 if k == "target" else None) for k in ctx}


@dataclasses.dataclass
class BatchedAlgorithm:
    """K-search batched counterpart of `Algorithm` (same driver surface:
    init / step_fn / _jit_chunk / ctx / pop_size / algorithm). State leaves
    carry a leading search axis: X [K, pop, n_var], F [K, pop, n_obj],
    key [K, 2], gen [K]."""
    base: Algorithm        # single-search algorithm (ops/eval_fn/pop_size)
    ctx: dict              # batched bundle (target leaf [K, 1, D])
    n_search: int
    # evaluate the searches in on-device chunks of this many searches
    # (lax.map over the search axis): peak activation memory is that of one
    # chunk, so K is decoupled from HBM — the search-axis analogue of
    # config.eval_microbatch (K=16 x pop 16 at 1024px exceeds a single
    # v5e's HBM unchunked; chunks of 8 run at the K=8 rate)
    search_microbatch: Optional[int] = None
    # host-staged backends: batched eval fn (off [K,pop,nv], ctx, keys [K])
    # -> F [K,pop,n_obj] that batches the DEVICE stages across searches
    # (Generator.host_eval_population_batched); None = per-search host loop
    host_eval_batched: Optional[Callable] = None

    # driver-surface passthroughs
    @property
    def pop_size(self) -> int:
        return self.base.pop_size

    @property
    def algorithm(self) -> str:
        return self.base.algorithm

    @property
    def host_eval(self) -> bool:
        return self.base.host_eval

    def _axes(self):
        return _ctx_axes(self.ctx)

    def init(self, key) -> GAState:
        """Per-search keys derive from ONE split of `key` — search i of the
        batch reproduces an independent run seeded with split(key, K)[i]."""
        algo = self.base
        keys = jax.random.split(key, self.n_search)
        if self.host_eval:
            if self.host_eval_batched is not None:
                # batched mirror of Algorithm.init's host branch: one
                # vmapped sampling dispatch + one batched staged eval
                @jax.jit
                def _bsample(ks):
                    def one(k):
                        k_init, k_eval, k2 = jax.random.split(k, 3)
                        return algo.ops.sample(k_init, algo.pop_size), \
                            k_eval, k2
                    return jax.vmap(one)(ks)

                X0, k_evals, k2 = _bsample(keys)
                F0 = self.host_eval_batched(X0, self.ctx, k_evals)
                return GAState(X0, F0, k2,
                               jnp.zeros((self.n_search,), jnp.int32))
            states = [dataclasses.replace(algo, ctx=self._slice_ctx(i))
                      .init(keys[i]) for i in range(self.n_search)]
            return _stack_states(states)

        @jax.jit
        def _binit(keys, ctx):
            def one(k, c):
                k_init, k_eval, k2 = jax.random.split(k, 3)
                X0 = algo.ops.sample(k_init, algo.pop_size)
                F0 = algo.eval_fn(X0, c, k_eval)
                return GAState(X0, F0, k2, jnp.int32(0))
            binit = jax.vmap(one, in_axes=(0, self._axes()))
            return self._search_chunked(binit)(keys, ctx)

        return _binit(keys, self.ctx)

    def step_fn(self) -> Callable:
        if self.host_eval:
            if self.host_eval_batched is not None:
                # vmapped jitted halves around ONE batched staged eval: the
                # device decode/score run at batch K*pop per generation
                from clip_glass_tpu.evolve.algorithm import make_step_halves
                vary, survive = make_step_halves(
                    self.base.ops, self.base.pop_size, self.base.algorithm)
                vary_v = jax.jit(jax.vmap(vary))
                survive_v = jax.jit(jax.vmap(survive))

                def bstep(state: GAState, ctx=None) -> GAState:
                    ctx = ctx if ctx is not None else self.ctx
                    off, k_eval, key = vary_v(state)
                    F_off = self.host_eval_batched(off, ctx, k_eval)
                    return survive_v(state, off, F_off, key)

                return bstep

            step = self.base.step_fn()

            def looped(state: GAState, ctx=None) -> GAState:
                ctx = ctx if ctx is not None else self.ctx
                outs = [step(_slice_state(state, i), _slice_ctx_of(ctx, i))
                        for i in range(self.n_search)]
                return _stack_states(outs)
            return looped
        return self._search_chunked(
            jax.vmap(self.base.step_fn(), in_axes=(0, self._axes())))

    def _search_chunked(self, vfn: Callable) -> Callable:
        """Wrap a vmapped-over-searches fn(batched_first_arg, ctx) in
        `lax.map` chunks of `search_microbatch` searches: one chunk's
        activations live at a time (identical results — searches are
        independent, so chunking is pure scheduling)."""
        smb = self.search_microbatch
        K = self.n_search
        if not smb or K <= smb:
            return vfn
        if K % smb:
            raise ValueError(
                f"search_microbatch {smb} must divide n_search {K}")
        nc = K // smb

        def chunked(batched, ctx=None):
            ctx = ctx if ctx is not None else self.ctx
            chunk = lambda x: x.reshape((nc, smb) + x.shape[1:])
            rest = {k: v for k, v in ctx.items() if k != "target"}
            out = lax.map(
                lambda bt: vfn(bt[0], {**rest, "target": bt[1]}),
                (jax.tree.map(chunk, batched), chunk(ctx["target"])))
            return jax.tree.map(
                lambda x: x.reshape((K,) + x.shape[2:]), out)

        return chunked

    def _slice_ctx(self, i: int) -> dict:
        return _slice_ctx_of(self.ctx, i)

    @functools.cached_property
    def _jit_chunk(self):
        return make_jit_chunk(self.step_fn(), self.host_eval)


def _slice_ctx_of(ctx: dict, i: int) -> dict:
    out = dict(ctx)
    out["target"] = ctx["target"][i]
    return out


def _slice_state(state: GAState, i: int) -> GAState:
    return GAState(state.X[i], state.F[i], state.key[i], state.gen[i])


def _stack_states(states: List[GAState]) -> GAState:
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *states)


def _auto_search_microbatch(K: int) -> Optional[int]:
    """Measured default for the HOST-STAGED batched img2txt evaluation:
    decode in >= 2 groups so group g+1's device decode overlaps group g's
    host BPE round trip (host_eval_population_batched enqueues every
    group's decode before the first tokenization). One group serializes
    decode -> BPE and costs ~25% (K=8 flagship GPT2: plain 1811 vs
    groups-of-4 2425 cand/s); groups of 1 give back the win to per-group
    dispatch latency (1860). Two groups measured best (groups-of-2 at
    K=8: 2330), so: the largest proper divisor, None when K < 4 or K is
    prime (the only split would be groups of 1). DESIGN.md §11."""
    if K < 4:
        return None
    for p in range(2, int(K ** 0.5) + 1):
        if K % p == 0:
            return K // p
    return None


def make_batched(problem, targets, force_host_eval: bool = False,
                 search_microbatch: Optional[int] = None) -> BatchedAlgorithm:
    """K-search batched algorithm from a GenerationProblem + K targets.
    The problem's own config.target only seeds its (unused) single-target
    features; each batched search scores against its `targets[i]`.

    img2txt backends with pure_callback support keep ONE jitted program (the
    BPE round trips serialize per search via vmap_method="sequential");
    host-staged backends (the axon tunnel, or force_host_eval=True) batch
    the device decode/score across searches with per-search host BPE
    (Generator.host_eval_population_batched) — except stochastic decode,
    which keeps the per-search loop (shared-key caveat in that docstring)."""
    algo = problem.make_algorithm(force_host_eval=force_host_eval)
    ctx = batched_targets_bundle(problem, list(targets))
    heb = None
    if algo.host_eval and not problem.config.stochastic:
        # host-staged path: default to the measured decode/BPE-overlap
        # grouping when the caller didn't choose one (chunking is pure
        # scheduling — per-search results are bitwise unchanged)
        smb_host = search_microbatch
        if smb_host is None:
            smb_host = _auto_search_microbatch(len(targets))
        gen = problem.generator
        heb = lambda off, c, keys: gen.host_eval_population_batched(
            off, c, keys, search_microbatch=smb_host)
        heb.search_microbatch = smb_host  # introspectable resolved value
    return BatchedAlgorithm(base=algo, ctx=ctx, n_search=len(targets),
                            search_microbatch=search_microbatch,
                            host_eval_batched=heb)


def minimize_batched(balgo: BatchedAlgorithm, n_gen: int, key,
                     callback: Optional[Callable] = None, save_each: int = 50,
                     verbose: bool = False,
                     state: Optional[GAState] = None) -> List[Result]:
    """Run K searches to completion; returns one `Result` per search (same
    shape as evolve.minimize's, reference run.py:79-96). `callback(state)`
    receives the BATCHED state between chunks."""
    if state is None:
        state = balgo.init(key)
    run_chunk = balgo._jit_chunk
    done = 0
    while done < n_gen:
        chunk = min(save_each, n_gen - done)
        state = run_chunk(state, balgo.ctx, chunk)
        done += chunk
        if verbose:
            F = fetch(state.F)                   # [K, pop, n_obj]
            best = F.min(axis=1)
            print(f"gen {int(state.gen[0]):5d}  "
                  f"best/search={np.array2string(best, precision=4)}")
        if callback is not None:
            callback(state)

    pop_X = fetch(state.X)
    pop_F = fetch(state.F)
    return [extract_result(pop_X[i], pop_F[i], balgo.algorithm,
                           _slice_state(state, i))
            for i in range(balgo.n_search)]
