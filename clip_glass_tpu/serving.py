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
import threading
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from clip_glass_tpu.evolve.algorithm import GAState, Result, extract_result
from clip_glass_tpu.evolve.batched import (_slice_ctx_of, _slice_state,
                                           make_batched)


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
                 force_host_eval: bool = False):
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
        else:
            @jax.jit
            def slot_init(key, ctx):
                k_init, k_eval, key = jax.random.split(key, 3)
                X0 = base.ops.sample(k_init, base.pop_size)
                F0 = base.eval_fn(X0, ctx, k_eval)
                return GAState(X0, F0, key, jnp.int32(0))

            self._slot_init = slot_init

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
        """Admit queued requests into free slots, advance every slot by
        `chunk` generations (one jitted dispatch), harvest finished slots.
        Returns False when there was nothing to do."""
        self._admit()
        occupied = self.active()
        if occupied == 0:
            return False
        self.state = self.balgo._jit_chunk(
            self.state, self.balgo.ctx, self.chunk)
        # The dispatch above is async: while the chunk runs, prepare the
        # next queued requests' admission work (target CLIP-encode +
        # single-slot init) so the next _admit only scatters. The host-side
        # cost (tokenization, cache lookups, dispatch RPC over the device
        # tunnel) overlaps the in-flight chunk instead of extending the
        # inter-chunk gap.
        self._prefetch()
        self.stats.ticks += 1
        per_slot = self.balgo.pop_size * self.chunk
        self.stats.useful_evals += occupied * per_slot
        self.stats.total_evals += self.n_slots * per_slot
        finished = []
        for i, slot in enumerate(self._slots):
            if slot.ticket is None:
                continue
            slot.remaining -= self.chunk
            if slot.remaining <= 0:
                finished.append(i)
        if finished:
            # ONE device->host pull for all finished slots (the pull is the
            # only synchronization point in the serve loop; per-slot pulls
            # would pay the transfer latency once per harvest)
            host_state = jax.device_get(self.state)
            for i in finished:
                self._harvest(i, host_state)
        return True

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

    def _prefetch(self) -> None:
        """Prepare admission work for the head of the queue (up to one
        server's worth of requests) while the dispatched chunk is in
        flight. Pure dispatch — device programs queue behind the chunk;
        the host returns immediately."""
        with self._lock:
            head = list(self._queue)[:self.n_slots]
        for ticket, target, _ in head:
            if ticket not in self._prepared:
                self._prepared[ticket] = self._prepare(ticket, target)

    def _admit(self) -> None:
        for i, slot in enumerate(self._slots):
            if slot.ticket is not None:
                continue
            with self._lock:
                if not self._queue:
                    return
                ticket, target, n_gen = self._queue.popleft()
            feat, s0 = (self._prepared.pop(ticket, None)
                        or self._prepare(ticket, target))
            self.balgo.ctx["target"] = \
                self.balgo.ctx["target"].at[i].set(feat)
            self.state = GAState(*[
                b.at[i].set(v) for b, v in zip(self.state, s0)])
            slot.ticket, slot.remaining = ticket, n_gen

    def _harvest(self, i: int, host_state: GAState) -> None:
        slot = self._slots[i]
        s = _slice_state(host_state, i)
        self.results[slot.ticket] = extract_result(
            s.X, s.F, self.balgo.algorithm, s)
        self.stats.completed += 1
        slot.ticket, slot.remaining = None, 0
