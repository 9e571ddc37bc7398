"""PAF line-integral limb scoring + greedy bipartite matching, fixed-shape.

Re-design of the reference's hottest host loop
(``/root/reference/pose_detector.py:135-181``): for every limb and every
candidate (joint_a, joint_b) peak pair, integrate the part-affinity field
along the segment (10 rounded sample points), dot with the segment's unit
vector, apply a distance prior, and validity-gate; then greedily 1:1-match
candidates per limb in descending score order.

The dynamic pair lists become a dense ``(num_limbs, K, K)`` score/valid
tensor computed by one batched gather + einsum — exactly the fixed-shape
reformulation SURVEY.md section 7 step 3 calls for.  Greedy matching is a
``lax.scan`` over the stably-sorted candidate list, preserving the
reference's tie-breaking (enumeration order a-major then b, as produced by
the nested loops at ``:137-138`` and Python's stable ``sorted`` at ``:158``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpupose.config import InferenceConfig
from tpupose.ops.peaks import Peaks


class Connections(NamedTuple):
    """Static-shape accepted connections per limb.

    a_slot, b_slot: (L, K) int32 peak slot indices into the per-joint peak
                    tables (-1 when the entry is unused)
    score:          (L, K) float32 connection integral score
    valid:          (L, K) bool, True for accepted connections, in greedy
                    acceptance order (descending score)
    """

    a_slot: jnp.ndarray
    b_slot: jnp.ndarray
    score: jnp.ndarray
    valid: jnp.ndarray


def score_candidates(paf_rows: jnp.ndarray, hw, ax, ay, a_valid,
                     bx, by, b_valid, img_len, cfg: InferenceConfig):
    """Dense candidate scores for one limb.

    paf_rows: (H*W, 2) — per-pixel (x, y) PAF components (reference
    channel layout ``pose_detector.py:147``, pre-transposed so the sample
    gather below returns both components per index from ONE row gather).
    hw: static (H, W).  ax..b_valid: (K,) peak tables.
    Returns (scores, valid): (K, K) with rows = joint_a candidates.
    """
    k = ax.shape[0]
    h, w = hw
    n_pts = cfg.n_integ_points

    vx = bx[None, :] - ax[:, None]          # (K, K)
    vy = by[None, :] - ay[:, None]
    norm = jnp.sqrt(vx * vx + vy * vy)
    nonzero = norm > 0
    safe_norm = jnp.where(nonzero, norm, 1.0)
    ux, uy = vx / safe_norm, vy / safe_norm

    # 10 sample points, linspace inclusive of both endpoints, rounded with
    # numpy's round-half-to-even (jnp.round matches np.round).
    t = jnp.linspace(0.0, 1.0, n_pts)       # (P,)
    xs = ax[:, None, None] + vx[:, :, None] * t  # (K, K, P)
    ys = ay[:, None, None] + vy[:, :, None] * t
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h - 1)
    flat_idx = yi * w + xi                   # (K, K, P)

    # Gather (HW, 2) ROWS so both PAF channels return from ONE gather:
    # measured 3.5x the two per-channel flat gathers on a v5e (1.25 vs
    # 4.36 ms for all 19 limbs at 584x584, bit-identical results) —
    # element gathers along the lane dim are the slow path on TPU,
    # two-wide rows amortize the per-index cost.
    got = jnp.take(paf_rows, flat_idx.reshape(-1), axis=0)
    got = got.reshape(k, k, n_pts, 2)
    inner = (got[..., 0] * ux[:, :, None]
             + got[..., 1] * uy[:, :, None])                 # (K, K, P)

    integ = jnp.mean(inner, axis=-1)
    penalty = jnp.minimum(
        cfg.limb_length_ratio * img_len / safe_norm - cfg.length_penalty_value,
        0.0)
    score = integ + penalty

    n_valid_pts = jnp.sum(inner > cfg.inner_product_thresh, axis=-1)
    valid = (
        nonzero
        & (n_valid_pts > cfg.n_integ_points_thresh)
        & (score > 0.0)
        & a_valid[:, None]
        & b_valid[None, :]
    )
    return score, valid


def greedy_match(score: jnp.ndarray, valid: jnp.ndarray, n_a, n_b):
    """Greedy 1:1 matching for one limb (ref ``pose_detector.py:172-177``).

    score/valid: (K, K).  Candidates are visited in descending score with
    stable ties in a-major enumeration order; a candidate is accepted when
    neither endpoint is already used, stopping after ``min(n_a, n_b)``
    acceptances.  Returns (a_slot, b_slot, out_score, out_valid): (K,).

    Accepting in sorted order while skipping used endpoints is equivalent
    to repeatedly taking the highest-scoring still-free candidate, so
    instead of a K^2-step sequential scan this runs a ``while_loop`` of
    (acceptances + 1) iterations whose body is one vectorized masked
    argmax — no sort at all, and the sequential depth drops from K^2
    (=1024 at K=32) to the number of people.  ``jnp.argmax`` returns the
    FIRST maximum in row-major (a-major, then b) order — exactly the
    reference's stable tie-break (Python ``sorted`` over the nested-loop
    enumeration at ``:137-138,158``).
    """
    k = score.shape[0]
    flat_valid = valid.reshape(-1)
    flat_score = jnp.where(flat_valid, score.reshape(-1), -jnp.inf)
    max_conn = jnp.minimum(n_a, n_b).astype(jnp.int32)

    def cond(state):
        _, _, n_taken, _, _, _, done = state
        return ~done & (n_taken < max_conn)

    def body(state):
        used_a, used_b, n_taken, out_a, out_b, out_s, _ = state
        free_score = jnp.where(
            flat_valid & ~used_a.repeat(k) & ~jnp.tile(used_b, k),
            flat_score, -jnp.inf)
        pos = jnp.argmax(free_score)    # first max = a-major tie-break
        take = jnp.isfinite(free_score[pos])
        a, b, s = pos // k, pos % k, flat_score[pos]
        used_a = used_a.at[a].set(used_a[a] | take)
        used_b = used_b.at[b].set(used_b[b] | take)
        out_a = jnp.where(take, out_a.at[n_taken].set(a), out_a)
        out_b = jnp.where(take, out_b.at[n_taken].set(b), out_b)
        out_s = jnp.where(take, out_s.at[n_taken].set(s), out_s)
        n_taken = n_taken + take.astype(jnp.int32)
        return (used_a, used_b, n_taken, out_a, out_b, out_s, ~take)

    init = (
        jnp.zeros((k,), bool), jnp.zeros((k,), bool), jnp.int32(0),
        jnp.full((k,), -1, jnp.int32), jnp.full((k,), -1, jnp.int32),
        jnp.zeros((k,), jnp.float32), jnp.asarray(False),
    )
    used_a, used_b, n_taken, out_a, out_b, out_s, _ = jax.lax.while_loop(
        cond, body, init)
    out_valid = jnp.arange(k) < n_taken
    return out_a, out_b, out_s, out_valid


def compute_connections(pafs: jnp.ndarray, peaks: Peaks, img_len,
                        cfg: InferenceConfig,
                        limbs_a: jnp.ndarray,
                        limbs_b: jnp.ndarray) -> Connections:
    """All-limb candidate scoring + matching.

    pafs: (2*L, H, W) with limb i in channels (2i, 2i+1).
    limbs_a/limbs_b: (L,) int32 joint indices of each limb's endpoints.
    """
    num_limbs = limbs_a.shape[0]
    hw = pafs.shape[-2:]
    # (L, HW, 2): one transpose up front so every limb's sample gather
    # pulls both PAF components per index (see score_candidates).
    paf_rows = pafs.reshape(num_limbs, 2, -1).transpose(0, 2, 1)
    return compute_connections_from_rows(
        paf_rows, hw, peaks, img_len, cfg, limbs_a, limbs_b)


def compute_connections_from_rows(paf_rows: jnp.ndarray, hw, peaks: Peaks,
                                  img_len, cfg: InferenceConfig,
                                  limbs_a: jnp.ndarray,
                                  limbs_b: jnp.ndarray) -> Connections:
    """``compute_connections`` on pre-transposed sample rows.

    paf_rows: (L, H*W, 2); hw: static (H, W).  Callers that already hold
    the PAF in row layout (e.g. precise-mode scale tails emitting it
    directly from the final resize einsum) skip the (2L, H, W) transpose
    entirely — it is pure data movement at 584² that the cross-scale
    averaging program otherwise re-materializes per frame."""

    def per_limb(rows, ja, jb):
        ax, ay = peaks.x[ja], peaks.y[ja]
        bx, by = peaks.x[jb], peaks.y[jb]
        av, bv = peaks.valid[ja], peaks.valid[jb]
        score, valid = score_candidates(
            rows, hw, ax, ay, av, bx, by, bv, img_len, cfg)
        n_a = jnp.sum(av).astype(jnp.int32)
        n_b = jnp.sum(bv).astype(jnp.int32)
        return greedy_match(score, valid, n_a, n_b)

    a_slot, b_slot, score, valid = jax.vmap(per_limb)(
        paf_rows, limbs_a, limbs_b)
    return Connections(a_slot=a_slot, b_slot=b_slot, score=score, valid=valid)
