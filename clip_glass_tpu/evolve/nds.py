"""Non-dominated sorting + crowding distance, fully on-device.

The reference delegates these to pymoo's host-side numpy NSGA-II (reference
run.py:59-76). Here both run inside jit with fixed shapes: domination as an
O(n^2) boolean matrix (n = 2*pop <= 512 for every reference config — trivial
on the VPU), front ranks by longest-dominator-chain lengths via log-depth
max-plus matrix squaring (front peeling under `lax.while_loop` kept as an
env-selectable alternative; both are below per-op resolution in the
flagship step trace — the fixed-op-count form is preferred because its
latency cannot grow with the front count, whereas peeling serializes one
tiny masked pass per front, up to n for chain-shaped F), and pymoo's
exact crowding formula evaluated per front via lexicographic sorts and
segment reductions keyed by front id.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
from jax import lax


def domination_matrix(F: jnp.ndarray) -> jnp.ndarray:
    """D[i, j] = individual i dominates j (all objectives <=, one <)."""
    le = jnp.all(F[:, None, :] <= F[None, :, :], axis=-1)
    lt = jnp.any(F[:, None, :] < F[None, :, :], axis=-1)
    return le & lt


def non_dominated_rank(F: jnp.ndarray) -> jnp.ndarray:
    """Front index per individual (0 = Pareto front).

    Equivalent characterizations (both implemented, equivalence tested):
    front(i) = the peel round that removes i = the length in edges of the
    longest domination chain ending at i (induction on peel rounds: i is
    peeled in round k iff some dominator of i is peeled in round k-1).
    """
    if os.environ.get("CLIP_GLASS_NDS") == "peel":
        return _rank_by_peeling(F)
    return _rank_by_chain_lengths(F)


def _rank_by_chain_lengths(F: jnp.ndarray) -> jnp.ndarray:
    """Longest-dominator-chain lengths by (max, +) matrix squaring.

    The domination relation is a strict partial order (a DAG), so the
    longest path into each node is finite and computable by repeated
    squaring of the path-length matrix over the (max, +) semiring:
    P[i, j] = longest path i->j in edges (0 on the diagonal, -inf when
    unreachable). ceil(log2(n-1)) squarings cover every chain — a FIXED
    op count vs the peeling loop's data-dependent ~#fronts trip count,
    whose per-iteration cond sync serializes on the TPU's per-op latency
    (the same tail that bounds GPT-2 decode, DESIGN.md §9).
    """
    n = F.shape[0]
    if n <= 2:
        # 0/1 fronts only: rank = 1 iff the other individual dominates
        D = domination_matrix(F)
        return jnp.any(D, axis=0).astype(jnp.int32)
    D = domination_matrix(F)
    neg = jnp.int32(-(n + 1))  # "-inf": any sum stays < 0 (paths <= n-1)
    eye = jnp.eye(n, dtype=bool)
    P = jnp.where(D, jnp.int32(1), neg)
    P = jnp.where(eye, jnp.int32(0), P)
    # diagonal zeros make squaring monotone (k=i or k=j reproduces P), so
    # P after m squarings holds longest paths among those <= 2^m edges
    for _ in range(max(1, math.ceil(math.log2(n - 1)))):
        P = jnp.max(P[:, :, None] + P[None, :, :], axis=1)
        P = jnp.minimum(P, n)  # cap: sums of two negs may underflow toward 2*neg only; cap keeps int32 far from wrap
    return jnp.max(P, axis=0).astype(jnp.int32)  # includes P[j,j]=0


def _rank_by_peeling(F: jnp.ndarray) -> jnp.ndarray:
    """Front peeling under lax.while_loop (the direct transcription of the
    NSGA-II definition; retained as the reference implementation for the
    equivalence test and via CLIP_GLASS_NDS=peel)."""
    D = domination_matrix(F)
    n = F.shape[0]

    def cond(state):
        rank, _ = state
        return jnp.any(rank < 0)

    def body(state):
        rank, front = state
        unassigned = rank < 0
        dominated = jnp.any(D & unassigned[:, None], axis=0)
        current = unassigned & ~dominated
        return jnp.where(current, front, rank), front + 1

    rank0 = jnp.full((n,), -1, jnp.int32)
    rank, _ = lax.while_loop(cond, body, (rank0, jnp.int32(0)))
    return rank


def crowding_distance(F: jnp.ndarray, rank: jnp.ndarray) -> jnp.ndarray:
    """pymoo-0.4.2 crowding distance computed within each front.

    Per objective: sort front members, gap to sorted neighbors normalized by
    the front's objective range (0 when the range collapses), boundaries inf;
    total = mean over objectives. Replicates pymoo's duplicate handling
    (calc_crowding_distance's `index_dist_is_zero` loops): a zero gap
    inherits the nearest NONZERO gap in sort order, so duplicated objective
    values share the distance to the adjacent distinct values instead of
    crowding each other out.
    """
    n, n_obj = F.shape

    def per_objective(f):
        # lexicographic: primary front rank, secondary objective value
        order = jnp.lexsort((f, rank))
        f_sorted = f[order]
        r_sorted = rank[order]

        same_prev = jnp.concatenate([jnp.array([False]), r_sorted[1:] == r_sorted[:-1]])
        same_next = jnp.concatenate([r_sorted[1:] == r_sorted[:-1], jnp.array([False])])
        prev_val = jnp.concatenate([f_sorted[:1], f_sorted[:-1]])
        next_val = jnp.concatenate([f_sorted[1:], f_sorted[-1:]])

        # per-front objective range via segment reductions keyed by front id
        fmax = jax.ops.segment_max(f, rank, num_segments=n)
        fmin = jax.ops.segment_min(f, rank, num_segments=n)
        norm = (fmax - fmin)[rank][order]

        gap_prev = jnp.where(same_prev, f_sorted - prev_val, jnp.inf)
        gap_next = jnp.where(same_next, next_val - f_sorted, jnp.inf)

        # pymoo duplicate quirk: zero gaps inherit the nearest nonzero gap
        # (forward fill for gap_prev, backward fill for gap_next). Front
        # boundaries are inf, so fills never cross fronts.
        idx = jnp.arange(n)
        last_nz = lax.cummax(jnp.where(gap_prev != 0, idx, -1))
        gap_prev = gap_prev[jnp.maximum(last_nz, 0)]
        next_nz = n - 1 - lax.cummax(
            jnp.where(gap_next[::-1] != 0, idx, -1))[::-1]
        gap_next = gap_next[jnp.minimum(next_nz, n - 1)]

        # norm == 0: constant objective inside the front -> contribution 0
        # (pymoo sets norm=nan then zeroes the resulting nans; inf boundaries
        # in such fronts also become 0 for this objective)
        d = jnp.where(norm > 0, gap_prev / norm + gap_next / norm, 0.0)

        inv = jnp.argsort(order)
        return d[inv]

    dists = jax.vmap(per_objective, in_axes=1, out_axes=1)(F)
    crowd = jnp.sum(dists, axis=1) / n_obj

    # fronts with <= 2 members: all inf (pymoo calc_crowding_distance n<=2 path
    # generalized per front; boundaries already inf, this covers interior-less
    # fronts whose both gaps were finite-normalized away)
    front_sizes = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), rank, num_segments=n)
    crowd = jnp.where(front_sizes[rank] <= 2, jnp.inf, crowd)
    return crowd
