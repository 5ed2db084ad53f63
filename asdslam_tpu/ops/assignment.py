"""Matching-engine assignment policies — aslam_cv2 matcher parity.

The reference vendors aslam_cv2, whose matcher package ships two generic
matching engines over a candidate-score list (src/aslam_cv2/aslam_cv_matcher:
``MatchingEngineGreedy`` / ``MatchingEngineNonExclusive``, exercised by
test-matcher.cc and test-matcher-non-exclusive.cc).  The SLAM pipeline itself
only uses ORBmatcher's best-row policy (subsumed by ops/match.py), but the
engines are part of the vendored capability surface, so the two assignment
policies are provided here as batched kernels over a dense score matrix:

* ``non_exclusive_assignment`` — every row takes its best admissible column;
  columns may be claimed by many rows (MatchingEngineNonExclusive).
* ``greedy_assignment`` — globally best-first one-to-one assignment: the
  highest-scoring (row, col) pair is committed, both are retired, repeat.
  Equivalent to aslam's sorted-candidate greedy engine.  Implemented as a
  fixed-trip ``lax.while_loop`` over the masked matrix — each trip commits
  one pair, so the trip count is bounded by min(N, M) and shapes stay
  static (XLA-friendly; no data-dependent candidate lists).

Scores follow aslam's convention: HIGHER is better, `valid` gates
admissible pairs.  For descriptor distances pass ``-dist``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -jnp.inf


def non_exclusive_assignment(score: jnp.ndarray, valid: jnp.ndarray,
                             min_score: float = -jnp.inf):
    """Row-wise best admissible column, columns reusable.

    Returns (col_idx [N] int32, col_score [N], assigned [N] bool)."""
    s = jnp.where(valid, score, NEG)
    idx = jnp.argmax(s, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(s, idx[:, None], axis=1)[:, 0]
    ok = jnp.isfinite(best) & (best >= min_score)
    return jnp.where(ok, idx, -1), best, ok


@functools.partial(jax.jit, static_argnames=("max_assignments",))
def greedy_assignment(score: jnp.ndarray, valid: jnp.ndarray,
                      min_score: float = -jnp.inf,
                      max_assignments: int = 0):
    """Globally best-first one-to-one assignment (MatchingEngineGreedy).

    score: [N, M] (higher better), valid: [N, M] admissible pairs.
    Returns (col_of_row [N] int32 with -1 for unassigned, assigned [N] bool).

    Scope: each trip runs a full dense argmax, i.e. O(min(N, M) * N * M)
    total — sized for aslam's engine-parity workloads (hundreds of
    candidates), NOT for the 2000x2000 feature-matching hot path, which
    uses ops/match.py's single-pass matchers.  If a hot path ever needs
    one-to-one semantics, commit all row- AND column-wise maxima per trip
    (mutual-best pairs are always safe to take together) to cut the trip
    count to O(log) in practice.
    """
    N, M = score.shape
    trips = max_assignments or min(N, M)
    s0 = jnp.where(valid, score, NEG)
    s0 = jnp.where(s0 >= min_score, s0, NEG)

    def cond(state):
        k, s, _ = state
        return (k < trips) & jnp.isfinite(jnp.max(s))

    def body(state):
        k, s, col_of_row = state
        flat = jnp.argmax(s)
        i, j = flat // M, flat % M
        col_of_row = col_of_row.at[i].set(j.astype(jnp.int32))
        # retire row i and column j
        s = s.at[i, :].set(NEG).at[:, j].set(NEG)
        return k + 1, s, col_of_row

    _, _, col_of_row = jax.lax.while_loop(
        cond, body, (jnp.int32(0), s0, jnp.full((N,), -1, jnp.int32)))
    return col_of_row, col_of_row >= 0
