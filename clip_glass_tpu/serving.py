"""Continuous-batching search serving: a fixed-slot server over the
multi-search batched engine.

The reference serves one target per process (reference run.py:22): a new
prompt pays a fresh process, model load, and compile. `evolve/batched.py`
already runs K simultaneous searches as ONE compiled program; this module
turns that into a *server*: K slots stay resident, requests queue, and a
finished slot is refilled with the next request by a data-only swap — the
slot's CLIP target-feature row and its GA state are overwritten; shapes
never change, so admission and harvest NEVER recompile. This is the
continuous-batching pattern from LLM serving (slot = sequence) applied to
latent-space search (slot = search), and it is the idiomatic TPU shape for
it: one static program, state resident in HBM, churn expressed as cheap
device-side scatters.

Semantics: each admitted request reproduces, bitwise, an independent
`evolve.minimize` run of the same config seeded with
`fold_in(server_key, ticket)` (tested in tests/test_serving.py) — slots
are isolated by construction (vmap; per-slot minibatch-std groups,
per-slot survival). Generations advance for ALL slots in `chunk`-sized
jitted dispatches; a request's `n_gen` is rounded UP to a multiple of
`chunk` (extra generations only continue refining that search's
population). Idle slots (queue drained) keep evolving their previous
target; their work is discarded on the next admission — the standard
padding cost of static-shape batching, reported by `stats()` as the
occupancy ratio.

Scale-out: the slot axis is the batched engine's search axis —
embarrassingly parallel, shardable over a mesh with zero cross-chip
collectives (evolve/batched.py docstring; tests/test_batched.py).
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import threading
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from clip_glass_tpu.evolve.algorithm import GAState, Result, extract_result
from clip_glass_tpu.evolve.batched import (_ctx_axes, _slice_ctx_of,
                                           _slice_state, make_batched)


@dataclasses.dataclass
class _Slot:
    ticket: Optional[int] = None   # None = idle (evolving a stale target)
    remaining: int = 0             # generations left before harvest


@dataclasses.dataclass
class ServerStats:
    ticks: int = 0                 # chunk dispatches issued
    completed: int = 0             # requests harvested
    useful_evals: int = 0          # candidate evaluations on occupied slots
    total_evals: int = 0           # including idle-slot padding work
    # initial-population evaluations for admitted requests (real scored
    # candidates — the GA's generation-0 fitness — but excluded from
    # useful_evals so rates stay comparable with steady-state numbers,
    # where the one-off init is amortized to nothing)
    admission_evals: int = 0

    @property
    def occupancy(self) -> float:
        return self.useful_evals / self.total_evals if self.total_evals else 0.0


class SearchServer:
    """Fixed-slot continuous-batching server for one config + weight set.

    >>> server = SearchServer(problem, n_slots=4, chunk=25)
    >>> t0 = server.submit("a red flower", n_gen=200)
    >>> t1 = server.submit("a wolf at night", n_gen=200)
    >>> server.run()                     # pump until queue + slots drain
    >>> server.results[t0].pop_X         # == independent run, bitwise

    `submit` is thread-safe (a driving thread may pump `run(forever=True)`
    while request threads submit); everything else must be called from the
    pumping thread.
    """

    def __init__(self, problem, n_slots: int, chunk: int = 25,
                 key=None, search_microbatch: Optional[int] = None,
                 force_host_eval: bool = False, mesh=None):
        if n_slots < 1 or chunk < 1:
            raise ValueError("n_slots and chunk must be >= 1")
        self.problem = problem
        self.chunk = int(chunk)
        self.key = key if key is not None else jax.random.PRNGKey(0)
        # Placeholder targets: the problem's own target fills idle slots.
        self.balgo = make_batched(
            problem, [problem.config.target] * n_slots,
            force_host_eval=force_host_eval,
            search_microbatch=search_microbatch)
        self.state: GAState = self.balgo.init(self.key)
        self._slots = [_Slot() for _ in range(n_slots)]
        self._queue: collections.deque = collections.deque()
        self._lock = threading.Lock()
        self._next_ticket = 0
        self._stop = False
        self.results: Dict[int, Result] = {}
        self.meta: Dict[int, str] = {}   # ticket -> target, set in submit()
        # ticket -> (feat, s0) admission work prepared while a chunk is in
        # flight (see _prefetch); consumed by _admit
        self._prepared: Dict[int, tuple] = {}
        self.stats = ServerStats()
        # Single-slot (re)init, compiled ONCE for the server's lifetime —
        # same op sequence as Algorithm.init so an admitted slot's
        # trajectory is bitwise an independent run's.
        base = self.balgo.base
        if base.host_eval:
            sample = jax.jit(base.ops.sample, static_argnums=1)

            def slot_init(key, ctx):
                k_init, k_eval, key = jax.random.split(key, 3)
                X0 = sample(k_init, base.pop_size)
                F0 = base.eval_fn(X0, ctx, k_eval)
                return GAState(X0, F0, key, jnp.int32(0))

            self._slot_init = slot_init
            self._batch_init = None
        else:
            @jax.jit
            def slot_init(key, ctx):
                k_init, k_eval, key = jax.random.split(key, 3)
                X0 = base.ops.sample(k_init, base.pop_size)
                F0 = base.eval_fn(X0, ctx, k_eval)
                return GAState(X0, F0, key, jnp.int32(0))

            self._slot_init = slot_init

            # Batched admission init: all pending requests' initial
            # populations evaluate in ONE vmapped program at full-batch
            # (n_slots x pop) MXU efficiency — a chain of single-slot
            # inits runs the convs at pop-sized batch, measurably slower
            # per candidate. Always called with exactly n_slots rows
            # (padded by repetition, pads discarded), so ONE executable
            # serves the server's lifetime. vmap(one) row i is bitwise
            # slot_init's output — the per-search-bitwise property the
            # whole batched engine rests on (tests/test_batched.py).
            @jax.jit
            def batch_init(keys, ctx):
                def one(k, c):
                    k_init, k_eval, k2 = jax.random.split(k, 3)
                    X0 = base.ops.sample(k_init, base.pop_size)
                    F0 = base.eval_fn(X0, c, k_eval)
                    return GAState(X0, F0, k2, jnp.int32(0))
                vinit = jax.vmap(one, in_axes=(0, _ctx_axes(ctx)))
                return self.balgo._search_chunked(vinit)(keys, ctx)

            self._batch_init = batch_init

        # Fused admission scatter: ONE donated program updates the ctx
        # target rows and every state leaf for all admitted slots. The
        # unfused form (per-leaf .at[idx].set chains) costs ~9 dispatch
        # round-trips per admission round — on a tunneled device that is
        # the dominant churn overhead. Always called with exactly n_slots
        # rows (padded by repeating the last admitted entry: duplicate
        # scatter indices writing identical values are deterministic), so
        # ONE executable serves the server's lifetime.
        def admit_scatter(state, target, idx, feats, rows):
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *rows)
            target = target.at[idx].set(jnp.stack(feats))
            state = GAState(*[b.at[idx].set(v)
                              for b, v in zip(state, stacked)])
            return state, target

        self._admit_scatter = jax.jit(admit_scatter, donate_argnums=(0, 1))

        # Block-form admission: rows `ridx` of a prepared init block
        # (feats2 [K,1,D] + bstate with leading K) land in slots `sidx`,
        # gather + scatter fused in the same single program — no
        # per-ticket row slicing ever touches the host dispatch path.
        def admit_gs(state, target, sidx, ridx, feats2, bstate):
            target = target.at[sidx].set(feats2[ridx])
            state = GAState(*[b.at[sidx].set(v[ridx])
                              for b, v in zip(state, bstate)])
            return state, target

        self._admit_gs = jax.jit(admit_gs, donate_argnums=(0, 1))

        # One-program tick (the fused fast path of tick()): harvest
        # snapshot + block-form admission + chunk advance as ONE donated
        # jitted dispatch. The tunneled device charges a dispatch RTT per
        # program at every tick boundary; the legacy sequence pays up to
        # three (gather, admit, chunk) where one suffices — the state never
        # needs to come up for air between them. The snapshot gathers the
        # PRE-admission rows (the finished searches' final populations);
        # admission is a dense masked select of the prepared block's rows
        # into their slots (bitwise the scatter form); the chunk is the
        # same fori_loop of vmapped steps _jit_chunk runs.
        if self._batch_init is not None:
            step = self.balgo.step_fn()

            @functools.partial(jax.jit, static_argnames="n_gens",
                               donate_argnums=(0, 1))
            def serve_step(state, target, rest_ctx, gather_idx, admit_mask,
                           perm, feats2, bstate, n_gens):
                snapshot = jax.tree.map(lambda x: x[gather_idx], state)

                def sel(old, new):
                    m = admit_mask.reshape(
                        admit_mask.shape + (1,) * (old.ndim - 1))
                    return jnp.where(m, new[perm], old)

                state = GAState(*[sel(o, n) for o, n in zip(state, bstate)])
                target = jnp.where(admit_mask[:, None, None],
                                   feats2[perm], target)
                ctx = {**rest_ctx, "target": target}
                state = jax.lax.fori_loop(
                    0, n_gens, lambda _, s: step(s, ctx), state)
                return state, target, snapshot

            self._serve_step = serve_step
        else:
            self._serve_step = None
        # Most recent prepared admission block, kept as the shape-matching
        # placeholder the fused step reads (masked out) on admission-free
        # ticks. Set on first _prepare_many; every dispatching tick after
        # the first admission has one (no slot is occupied before then).
        self._last_block = None
        # Fused harvest gather (one dispatch instead of one per leaf),
        # likewise padded to a fixed n_slots rows.
        self._gather = jax.jit(
            lambda s, i: jax.tree.map(lambda x: x[i], s))
        # One-dispatch per-ticket admission keys (a python loop of
        # fold_in's costs a round-trip each).
        self._fold_keys = jax.jit(
            lambda ts: jax.vmap(lambda t: jax.random.fold_in(self.key, t))(ts))

        # Scale-out: the slot axis is §11's search axis — embarrassingly
        # parallel, so serving shards whole searches over mesh devices with
        # ZERO cross-chip collectives in the steady state (admission's
        # block-row select and the harvest snapshot gather cross slots, but
        # those move KB-sized GA state, not model activations). Weights
        # replicate; slot-major leaves (state, target rows) shard.
        self.mesh = mesh
        if mesh is not None:
            if self._batch_init is None:
                raise ValueError(
                    "mesh serving requires the device-eval path (the "
                    "host-staged img2txt engine manages state layout "
                    "host-side)")
            from clip_glass_tpu.parallel.mesh import (POP_AXIS,
                                                      population_sharding,
                                                      replicated_sharding,
                                                      shard_state)
            n_dev = mesh.shape[POP_AXIS]
            if n_slots % n_dev:
                raise ValueError(f"n_slots {n_slots} must divide over the "
                                 f"mesh's {n_dev}-device slot axis")
            slotted = population_sharding(mesh)
            rep = replicated_sharding(mesh)
            self.state = shard_state(self.state, mesh)
            self.balgo.ctx = {
                k: (jax.device_put(v, slotted) if k == "target"
                    else jax.tree.map(lambda x: jax.device_put(x, rep), v))
                for k, v in self.balgo.ctx.items()}

    # ---------------------------------------------------------------- API

    @property
    def n_slots(self) -> int:
        return len(self._slots)

    def submit(self, target: str, n_gen: int) -> int:
        """Enqueue a search request; returns its ticket. `n_gen` rounds up
        to a multiple of `chunk`. Thread-safe. The target is recorded in
        `self.meta[ticket]` BEFORE the request becomes admittable, so a
        pump thread that harvests the request immediately still sees it."""
        if n_gen < 1:
            raise ValueError("n_gen must be >= 1")
        n_eff = -(-n_gen // self.chunk) * self.chunk
        with self._lock:
            ticket = self._next_ticket
            self._next_ticket += 1
            self.meta[ticket] = target
            self._queue.append((ticket, target, n_eff))
        return ticket

    def pending(self) -> int:
        with self._lock:
            return len(self._queue)

    def active(self) -> int:
        return sum(s.ticket is not None for s in self._slots)

    def tick(self) -> bool:
        """Harvest-admit-dispatch cycle: mark slots that finished on the
        previous dispatch free (keeping a reference to their final state),
        admit queued requests into free slots, advance every occupied slot
        by `chunk` generations, and only THEN pull the finished slots'
        results — the device→host transfer and the host-side result
        extraction overlap the next chunk's execution instead of idling
        the device. On the device-eval path the whole cycle is ONE donated
        jitted dispatch (`_serve_step`): harvest snapshot, admission
        select, chunk advance — the tunnel charges a dispatch RTT per
        program, so the legacy gather/admit/chunk sequence pays three
        boundary latencies where one suffices. Returns False when there
        was nothing to do."""
        # Finished slots (from the previous tick's dispatch): free their
        # bookkeeping now so admission can refill them this tick, but
        # extract results only after the next chunk is dispatched. Their
        # final populations are snapshot into a compact fresh pytree FIRST
        # (inside _serve_step, or by _gather on the legacy path) — the
        # chunk program donates its state argument, so the pre-dispatch
        # buffers are deleted once the next chunk is dispatched; the
        # snapshot owns independent buffers.
        harvest = []
        for i, slot in enumerate(self._slots):
            if slot.ticket is not None and slot.remaining <= 0:
                harvest.append((i, slot.ticket))
                slot.ticket, slot.remaining = None, 0
        rows, groups = self._pick_admissions()
        occupied = self.active()

        if self._serve_step is not None and occupied:
            return self._tick_fused(harvest, rows, groups, occupied)

        # legacy multi-program tick: host-eval engines (whose chunk is a
        # host loop) and the occupied=0 endgame (nothing to advance — a
        # fused dispatch would burn a whole idle chunk just to snapshot)
        snapshot = None
        if harvest:
            gidx = [i for i, _ in harvest]
            gidx += [gidx[-1]] * (self.n_slots - len(gidx))
            snapshot = self._gather(self.state,
                                    jnp.asarray(gidx, jnp.int32))
        self._apply_admissions(rows, groups)
        if occupied:
            self.state = self.balgo._jit_chunk(
                self.state, self.balgo.ctx, self.chunk)
            self._prefetch()
            self._account_dispatch(occupied)
        if harvest:
            host_state = jax.device_get(snapshot)
            for j, (_, ticket) in enumerate(harvest):
                self._harvest(j, ticket, host_state)
        return bool(occupied or harvest)

    def _tick_fused(self, harvest, rows, groups, occupied: int) -> bool:
        """One-program tick: gather + admit + chunk in a single donated
        dispatch. Admissions beyond the newest prepare block (only when a
        tick admits requests prepared across different prefetch rounds)
        pre-scatter through the legacy programs; the final block rides the
        fused dispatch as a masked dense select."""
        assert not rows, "row-form admissions only occur on the host path"
        groups = list(groups.values())
        fused = groups.pop() if groups else None
        if groups:
            self._apply_admissions([], dict(enumerate(groups)))
        K = self.n_slots
        gidx = [i for i, _ in harvest] or [0]
        gidx += [gidx[-1]] * (K - len(gidx))
        mask = [False] * K
        perm = [0] * K
        if fused is not None:
            feats2, bstate, pairs = fused
            for i, j in pairs:
                mask[i], perm[i] = True, j
        else:
            # admission-free tick: the newest block is a shape-matching
            # placeholder, fully masked out (first dispatch can't precede
            # the first admission, so one always exists)
            feats2, bstate = self._last_block
        rest_ctx = {k: v for k, v in self.balgo.ctx.items() if k != "target"}
        self.state, target, snapshot = self._serve_step(
            self.state, self.balgo.ctx["target"], rest_ctx,
            jnp.asarray(gidx, jnp.int32), jnp.asarray(mask),
            jnp.asarray(perm, jnp.int32), feats2, bstate, self.chunk)
        self.balgo.ctx["target"] = target
        # The dispatch above is async: while the chunk runs, prepare the
        # next queued requests' admission work (target CLIP-encode +
        # init) so the next admission only selects rows in.
        self._prefetch()
        self._account_dispatch(occupied)
        if harvest:
            # ONE device->host pull for all finished slots; with the chunk
            # in flight it completes as soon as the snapshot buffers land,
            # without waiting on (or stalling) the new dispatch.
            host_state = jax.device_get(snapshot)
            for j, (_, ticket) in enumerate(harvest):
                self._harvest(j, ticket, host_state)
        return True

    def _account_dispatch(self, occupied: int) -> None:
        self.stats.ticks += 1
        per_slot = self.balgo.pop_size * self.chunk
        self.stats.useful_evals += occupied * per_slot
        self.stats.total_evals += self.n_slots * per_slot
        for slot in self._slots:
            if slot.ticket is not None:
                slot.remaining -= self.chunk

    def run(self, forever: bool = False) -> None:
        """Pump ticks until the queue and all slots drain (or, with
        forever=True, until `stop()` — spin-waits on an empty queue only
        between submissions from other threads).

        With forever=False, every submit() that completed (returned) before
        run() observes an empty queue is served; a submit racing with that
        final check may be left queued for a later run()/tick() — callers
        mixing concurrent submits with a draining run() should use
        forever=True + stop(), or re-invoke run()."""
        self._stop = False
        while not self._stop:
            worked = self.tick()
            if worked:
                continue
            if not forever:
                with self._lock:   # re-check under the lock before exiting
                    if not self._queue:
                        return
            else:
                time.sleep(0.005)  # parked: wait for cross-thread submits

    def stop(self) -> None:
        self._stop = True

    def map(self, targets: Sequence[str], n_gen: int) -> List[Result]:
        """Convenience: submit all `targets`, run to completion, return
        results in submission order."""
        tickets = [self.submit(t, n_gen) for t in targets]
        self.run()
        return [self.results[t] for t in tickets]

    # ----------------------------------------------------------- internals

    def _prepare(self, ticket: int, target: str):
        """Slot-independent admission work for one request: the target's
        CLIP feature row and an initialized single-search state (same op
        sequence as Algorithm.init — bitwise an independent run's). The
        sliced ctx differs from the batched ctx only in its target row, so
        this never needs to know which slot the request will land in."""
        feat = self.problem.generator.encode_targets([target])
        rest = {k: v for k, v in self.balgo.ctx.items() if k != "target"}
        s0 = self._slot_init(jax.random.fold_in(self.key, ticket),
                             {**rest, "target": feat})
        return feat, s0

    def _prepare_many(self, items) -> Dict[int, tuple]:
        """Admission work for several requests at once: `items` is a list
        of (ticket, target). The host-eval path comes back in row form
        `(feat, s0)` via `_prepare`; otherwise requests come back in BLOCK
        form `(feats2, bstate, j)` — each block of up to n_slots requests
        initializes in ONE vmapped dispatch (targets encoded in one call,
        rows padded by repetition and discarded), and the per-request
        entries reference row `j` of the shared block arrays so admission
        never slices rows on the host (and the fused one-program tick can
        select them in without a separate scatter dispatch). Either way,
        per-request results are bitwise `_prepare`'s."""
        if not items:
            return {}
        if self._batch_init is None:
            return {t: self._prepare(t, tgt) for t, tgt in items}
        K = self.n_slots
        rest = {k: v for k, v in self.balgo.ctx.items() if k != "target"}
        out = {}
        for start in range(0, len(items), K):
            block = items[start:start + K]
            # pad to the compiled row count BEFORE encoding, so the target
            # encoder and the init program each keep ONE executable
            padded = block + [block[-1]] * (K - len(block))
            feats = self.problem.generator.encode_targets(
                [tgt for _, tgt in padded])                      # [K, D]
            keys = self._fold_keys(
                jnp.asarray([t for t, _ in padded], jnp.uint32))
            feats2 = feats[:, None, :]                           # [K, 1, D]
            bstate = self._batch_init(keys, {**rest, "target": feats2})
            self._last_block = (feats2, bstate)
            for j, (t, _) in enumerate(block):
                out[t] = (feats2, bstate, j)
        return out

    def _prefetch(self) -> None:
        """Prepare admission work for the head of the queue (up to one
        server's worth of requests) while the dispatched chunk is in
        flight. Pure dispatch — device programs queue behind the chunk;
        the host returns immediately."""
        with self._lock:
            head = [(t, tgt) for t, tgt, _ in list(self._queue)[:self.n_slots]]
        self._prepared.update(self._prepare_many(
            [(t, tgt) for t, tgt in head if t not in self._prepared]))

    def _pick_admissions(self):
        """Pop queued requests into free slots (bookkeeping + preparation
        only — no state writes). Returns (rows, groups): row-form entries
        (slot_index, feat, s0) from the host-eval path, and block-form
        groups id(bstate) -> (feats2, bstate, [(slot_index, block_row)])."""
        free = [i for i, s in enumerate(self._slots) if s.ticket is None]
        if not free:
            return [], {}
        picked = []   # (ticket, target, n_gen) popped this tick
        with self._lock:
            while self._queue and len(picked) < len(free):
                picked.append(self._queue.popleft())
        if not picked:
            return [], {}
        self._prepared.update(self._prepare_many(
            [(t, tgt) for t, tgt, _ in picked if t not in self._prepared]))
        self.stats.admission_evals += len(picked) * self.balgo.pop_size
        rows = []      # row-form entries: (slot_index, feat, s0)
        groups = {}    # block-form: id(bstate) -> [feats2, bstate, pairs]
        for (ticket, _, n_gen), i in zip(picked, free):
            prep = self._prepared.pop(ticket)
            if len(prep) == 2:
                rows.append((i, prep[0], prep[1]))
            else:
                feats2, bstate, j = prep
                groups.setdefault(id(bstate),
                                  (feats2, bstate, []))[2].append((i, j))
            self._slots[i].ticket = ticket
            self._slots[i].remaining = n_gen
        return rows, groups

    def _apply_admissions(self, rows, groups) -> None:
        """Scatter-program admission (the legacy/host path): ONE fused
        donated program per group updates ctx target + every state leaf
        for all its admitted slots, padded to the compiled n_slots row
        count (duplicate indices write identical values) so each program
        stays a single lifetime executable."""
        if not rows and not groups:
            return

        def pad(seq):
            return jnp.asarray(seq + [seq[-1]] * (self.n_slots - len(seq)),
                               dtype=jnp.int32)

        if rows:
            while len(rows) < self.n_slots:
                rows.append(rows[-1])
            self.state, self.balgo.ctx["target"] = self._admit_scatter(
                self.state, self.balgo.ctx["target"],
                pad([i for i, _, _ in rows]),
                [f for _, f, _ in rows], [s0 for _, _, s0 in rows])
        for feats2, bstate, pairs in groups.values():
            self.state, self.balgo.ctx["target"] = self._admit_gs(
                self.state, self.balgo.ctx["target"],
                pad([i for i, _ in pairs]), pad([j for _, j in pairs]),
                feats2, bstate)

    def _harvest(self, j: int, ticket: int, host_state: GAState) -> None:
        """Extract the result for `ticket` from row `j` of the compacted
        harvest pytree (host-side)."""
        s = _slice_state(host_state, j)
        self.results[ticket] = extract_result(
            s.X, s.F, self.balgo.algorithm, s)
        self.stats.completed += 1
