"""Greedy keypoint-to-person grouping, fixed-shape on device + NumPy oracle.

Re-design of ``/root/reference/pose_detector.py:183-265``: connections are
folded one at a time (limbs in topology order, accepted connections in their
greedy order) into a table of person "subsets"; each subset row holds the
peak slot per joint plus accumulated score and joint count.  The four cases:

* one subset already holds either endpoint -> attach joint_b;
* two distinct subsets hold the endpoints -> merge when joint-disjoint,
  otherwise attach the missing endpoint(s) to both;
* no subset holds them -> spawn a new subset (except the shoulder-ear
  limbs 9/13, ref ``:237``);
* >=3 matching subsets -> ignore.

Finally subsets with <3 limbs or mean score <0.2 are dropped.

The order-sensitive parts are replicated exactly (SURVEY.md section 7 hard
part (a)): the reference appends new subsets at the end of the array and
``np.delete`` preserves relative order, so iterating fixed slots in creation
order while marking deleted slots inactive visits subsets in the identical
sequence.

Peaks are addressed as (joint, slot) pairs instead of the reference's global
peak ids — a bijective relabeling: ids are only ever compared within one
joint column.

Two implementations with identical semantics:
``group_keypoints_numpy`` (host oracle, used in tests and as a fallback)
and ``group_keypoints`` (jit-able ``lax.fori_loop`` device version so the
whole postprocess runs with zero host round-trips).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.config import (
    LIMBS,
    LIMBS_FROM,
    LIMBS_TO,
    NON_SPAWNING_LIMBS,
    NUM_JOINTS,
    InferenceConfig,
)
from tpupose.ops.paf import Connections
from tpupose.ops.peaks import Peaks


class Subsets(NamedTuple):
    """Fixed-shape person-subset table.

    joint_slot: (S, 18) int32 — peak slot per joint, -1 if absent
    score:      (S,) float32 — accumulated peak+connection score
    count:      (S,) float32 — joint count.  Float, not int: the reference
                stores subsets in one float array and its merge case
                (``pose_detector.py:215-217``) executes
                ``found_subset_1[-2:] += score`` which adds the connection
                score to BOTH the score column and the count column.  That
                quirk is replicated for bit-parity.
    valid:      (S,) bool — survives the final limb-count/score filter
    spawns_suppressed: () int32 — subset spawns refused because the static
                table was full (saturation signal; 0 = exact reference
                semantics)
    """

    joint_slot: jnp.ndarray
    score: jnp.ndarray
    count: jnp.ndarray
    valid: jnp.ndarray
    spawns_suppressed: jnp.ndarray = 0


# ---------------------------------------------------------------------------
# Device implementation
# ---------------------------------------------------------------------------


def group_keypoints(connections: Connections, peaks: Peaks,
                    cfg: InferenceConfig) -> Subsets:
    """Fold all connections into subsets on device.

    Grouping is inherently sequential (each fold reads the subset table the
    previous folds produced), but almost all of the (L x K) connection
    slots are invalid padding.  The loop therefore runs as a
    ``while_loop`` over a COMPACTED index list — valid connections first,
    in exactly the reference's (limb-major, greedy-acceptance) order — so
    the sequential depth is the actual number of accepted connections
    (~people x limbs) instead of L*K = 608 fixed steps.
    """
    num_limbs = connections.a_slot.shape[0]
    k = connections.a_slot.shape[1]
    s_cap = cfg.max_subsets

    limbs_a = jnp.asarray(LIMBS_FROM)
    limbs_b = jnp.asarray(LIMBS_TO)
    spawning = jnp.asarray(
        [l not in NON_SPAWNING_LIMBS for l in range(num_limbs)])

    flat_valid = connections.valid.reshape(-1)          # (L*K,)
    # stable partition: valid-first, original order preserved
    compact = jnp.argsort(~flat_valid, stable=True)
    n_valid = jnp.sum(flat_valid).astype(jnp.int32)

    def body(i, state):
        joint_slot, score, count, active, n_created, n_suppressed = state
        idx = compact[i]
        l = idx // k
        c = idx % k
        ja, jb = limbs_a[l], limbs_b[l]
        ind_a = connections.a_slot[l, c]
        ind_b = connections.b_slot[l, c]
        conn_score = connections.score[l, c]
        conn_valid = connections.valid[l, c]
        peak_score_a = peaks.score[ja, ind_a]
        peak_score_b = peaks.score[jb, ind_b]

        match = active & (
            (joint_slot[:, ja] == ind_a) | (joint_slot[:, jb] == ind_b))
        cnt = jnp.sum(match).astype(jnp.int32)
        s1 = jnp.argmax(match)                       # first matching slot
        match2 = match.at[s1].set(False)
        s2 = jnp.argmax(match2)                      # second matching slot

        # --- case 1: single subset holds one endpoint -> attach joint_b ---
        do1 = conn_valid & (cnt == 1) & (joint_slot[s1, jb] != ind_b)
        joint_slot = jnp.where(
            do1, joint_slot.at[s1, jb].set(ind_b), joint_slot)
        count = jnp.where(do1, count.at[s1].add(1.0), count)
        score = jnp.where(
            do1, score.at[s1].add(peak_score_b + conn_score), score)

        # --- case 2: two subsets ---
        is2 = conn_valid & (cnt == 2)
        disjoint = ~jnp.any((joint_slot[s1] >= 0) & (joint_slot[s2] >= 0))
        # 2a: merge s2 into s1, deactivate s2.
        do_merge = is2 & disjoint
        merged = joint_slot[s1] + joint_slot[s2] + 1
        joint_slot = jnp.where(
            do_merge, joint_slot.at[s1].set(merged), joint_slot)
        score = jnp.where(
            do_merge,
            score.at[s1].add(score[s2] + conn_score), score)
        # Reference quirk: ``found_subset_1[-2:] += score`` also adds the
        # connection score to the joint-count column (``:217``).
        count = jnp.where(
            do_merge, count.at[s1].add(count[s2] + conn_score), count)
        joint_slot = jnp.where(
            do_merge, joint_slot.at[s2].set(-1), joint_slot)
        score = jnp.where(do_merge, score.at[s2].set(0.0), score)
        count = jnp.where(do_merge, count.at[s2].set(0.0), count)
        active = jnp.where(do_merge, active.at[s2].set(False), active)

        # 2b: overlapping membership -> fill missing endpoint(s) per subset
        # (ref ``pose_detector.py:219-235``: if joint_a missing set it,
        # elif joint_b missing set it — independently for both subsets).
        do_fill = is2 & ~disjoint

        def fill(js, sc, ct, slot_idx):
            a_missing = js[slot_idx, ja] == -1
            b_missing = js[slot_idx, jb] == -1
            set_a = do_fill & a_missing
            set_b = do_fill & ~a_missing & b_missing
            js = jnp.where(set_a, js.at[slot_idx, ja].set(ind_a), js)
            js = jnp.where(set_b, js.at[slot_idx, jb].set(ind_b), js)
            add = jnp.where(
                set_a, peak_score_a + conn_score,
                jnp.where(set_b, peak_score_b + conn_score, 0.0))
            inc = (set_a | set_b).astype(jnp.float32)
            ct = ct.at[slot_idx].add(inc)
            sc = sc.at[slot_idx].add(add)
            return js, sc, ct

        joint_slot, score, count = fill(joint_slot, score, count, s1)
        joint_slot, score, count = fill(joint_slot, score, count, s2)

        # --- case 0: spawn a new subset ---
        want_new = conn_valid & (cnt == 0) & spawning[l]
        do_new = want_new & (n_created < s_cap)
        n_suppressed = n_suppressed + (
            want_new & (n_created >= s_cap)).astype(jnp.int32)
        slot = jnp.minimum(n_created, s_cap - 1)
        joint_slot = jnp.where(
            do_new,
            joint_slot.at[slot, ja].set(ind_a).at[slot, jb].set(ind_b),
            joint_slot)
        count = jnp.where(do_new, count.at[slot].set(2.0), count)
        score = jnp.where(
            do_new,
            score.at[slot].set(peak_score_a + peak_score_b + conn_score),
            score)
        active = jnp.where(do_new, active.at[slot].set(True), active)
        n_created = n_created + do_new.astype(jnp.int32)

        return joint_slot, score, count, active, n_created, n_suppressed

    init = (
        jnp.full((s_cap, NUM_JOINTS), -1, jnp.int32),
        jnp.zeros((s_cap,), jnp.float32),
        jnp.zeros((s_cap,), jnp.float32),
        jnp.zeros((s_cap,), bool),
        jnp.int32(0),
        jnp.int32(0),
    )

    def while_cond(carry):
        i, _ = carry
        return i < n_valid

    def while_body(carry):
        i, state = carry
        return i + 1, body(i, state)

    _, (joint_slot, score, count, active, _, n_suppressed) = (
        jax.lax.while_loop(while_cond, while_body, (jnp.int32(0), init)))

    # Final filter (ref ``pose_detector.py:248``): count here is the joint
    # count (column -1 in the reference); the limb threshold is applied to
    # it exactly as the reference does.
    safe_count = jnp.maximum(count, 1.0)
    keep = (
        active
        & (count >= cfg.n_subset_limbs_thresh)
        & (score / safe_count >= cfg.subset_score_thresh)
    )
    return Subsets(joint_slot=joint_slot, score=score, count=count,
                   valid=keep, spawns_suppressed=n_suppressed)


def subsets_to_poses(subsets: Subsets, peaks: Peaks) -> Tuple[jnp.ndarray,
                                                              jnp.ndarray]:
    """Convert the subset table to dense pose arrays
    (ref ``pose_detector.py:252-265``).

    Returns (poses, person_valid): poses (S, 18, 3) with columns (x, y, v)
    where v=2 for present joints and rows zeroed for absent ones; invalid
    person rows are all zero.  Scores are ``subsets.score`` as in the
    reference (``:516``: raw accumulated score, not the mean).
    """
    s_cap, num_joints = subsets.joint_slot.shape
    slots = jnp.clip(subsets.joint_slot, 0, None)
    joints = jnp.arange(num_joints)
    xs = peaks.x[joints[None, :], slots]          # (S, 18)
    ys = peaks.y[joints[None, :], slots]
    present = (subsets.joint_slot >= 0) & subsets.valid[:, None]
    poses = jnp.stack(
        [jnp.where(present, xs, 0.0),
         jnp.where(present, ys, 0.0),
         jnp.where(present, 2.0, 0.0)], axis=-1)
    return poses, subsets.valid


# ---------------------------------------------------------------------------
# NumPy oracle (reference-exact semantics, dynamic shapes)
# ---------------------------------------------------------------------------


def group_keypoints_numpy(connections_per_limb, peak_scores,
                          cfg: InferenceConfig):
    """Host oracle with the reference's dynamic-list semantics.

    connections_per_limb: list (len 19) of lists of (a_slot, b_slot, score).
    peak_scores: (18, K) array of peak scores.
    Returns list of dict(joint_slot=np.ndarray(18,), score, count) for
    subsets passing the final filter.
    """
    subsets = []  # each: {"j": int array(18), "score": float, "count": int}

    for l, conns in enumerate(connections_per_limb):
        ja, jb = LIMBS[l]
        for ind_a, ind_b, conn_score in conns:
            found = [i for i, s in enumerate(subsets)
                     if s["j"][ja] == ind_a or s["j"][jb] == ind_b]
            if len(found) == 1:
                s = subsets[found[0]]
                if s["j"][jb] != ind_b:
                    s["j"][jb] = ind_b
                    s["count"] += 1
                    s["score"] += peak_scores[jb, ind_b] + conn_score
            elif len(found) == 2:
                s1, s2 = subsets[found[0]], subsets[found[1]]
                if not np.any((s1["j"] >= 0) & (s2["j"] >= 0)):
                    s1["j"] = s1["j"] + s2["j"] + 1
                    s1["score"] += s2["score"] + conn_score
                    # Reference quirk (``pose_detector.py:217``): the merge
                    # adds the connection score to the count column too.
                    s1["count"] += s2["count"] + conn_score
                    del subsets[found[1]]
                else:
                    for s in (s1, s2):
                        if s["j"][ja] == -1:
                            s["j"][ja] = ind_a
                            s["count"] += 1
                            s["score"] += peak_scores[ja, ind_a] + conn_score
                        elif s["j"][jb] == -1:
                            s["j"][jb] = ind_b
                            s["count"] += 1
                            s["score"] += peak_scores[jb, ind_b] + conn_score
            elif len(found) == 0 and l not in NON_SPAWNING_LIMBS:
                j = -np.ones(NUM_JOINTS, np.int64)
                j[ja], j[jb] = ind_a, ind_b
                subsets.append({
                    "j": j,
                    "score": (peak_scores[ja, ind_a]
                              + peak_scores[jb, ind_b] + conn_score),
                    "count": 2,
                })
            # len(found) >= 3: ignored, as in the reference.

    return [
        s for s in subsets
        if s["count"] >= cfg.n_subset_limbs_thresh
        and s["score"] / s["count"] >= cfg.subset_score_thresh
    ]
