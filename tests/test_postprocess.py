"""PAF matching + grouping + full postprocess vs the NumPy oracles."""

import numpy as np
import jax.numpy as jnp

from tpupose.config import LIMBS, NUM_JOINTS, NUM_LIMBS, InferenceConfig
from tpupose.ops import postprocess_pose
from tpupose.ops.grouping import (
    group_keypoints,
    group_keypoints_numpy,
)
from tpupose.ops.paf import Connections, compute_connections
from tpupose.ops.peaks import Peaks

from oracles import oracle_connections, oracle_peaks

CFG = InferenceConfig(max_peaks_per_joint=8, max_subsets=32)


def _render_scene(rng, n_people=3, hw=(46, 62)):
    """Render synthetic heatmaps+PAFs from random, well-separated poses."""
    h, w = hw
    heatmaps = np.zeros((NUM_JOINTS + 1, h, w), np.float32)
    pafs = np.zeros((2 * NUM_LIMBS, h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    poses = []
    for p in range(n_people):
        cx = 8 + (w - 16) * (p + 0.5) / n_people + rng.uniform(-2, 2)
        cy = h / 2 + rng.uniform(-6, 6)
        joints = {}
        for j in range(NUM_JOINTS):
            if rng.rand() < 0.15:
                continue  # drop some joints
            joints[j] = (cx + rng.uniform(-6, 6), cy + rng.uniform(-12, 12))
        poses.append(joints)

    for joints in poses:
        for j, (x, y) in joints.items():
            heatmaps[j] += np.exp(
                -((yy - y) ** 2 + (xx - x) ** 2) / (2 * 1.5 ** 2))
        for l, (ja, jb) in enumerate(LIMBS):
            if ja not in joints or jb not in joints:
                continue
            ax, ay = joints[ja]
            bx, by = joints[jb]
            vx, vy = bx - ax, by - ay
            norm = np.hypot(vx, vy)
            if norm < 1e-3:
                continue
            ux, uy = vx / norm, vy / norm
            d_along = ux * (xx - ax) + uy * (yy - ay)
            d_perp = np.abs(-uy * (xx - ax) + ux * (yy - ay))
            band = (d_along >= 0) & (d_along <= norm) & (d_perp <= 2.0)
            pafs[2 * l][band] = ux
            pafs[2 * l + 1][band] = uy
    heatmaps = np.clip(heatmaps, 0, 1)
    return pafs, heatmaps


def _peaks_from_oracle(ref_peaks, k):
    """Pack the oracle's dynamic peak lists into a static Peaks table.

    Raises loudly when a joint overflows ``k`` — a silent ``[:k]`` would
    feed the device a truncated table while the oracle consumes the full
    lists, producing an opaque mismatch downstream (recalibrate the test
    scene or raise ``k`` instead)."""
    x = np.zeros((NUM_JOINTS, k), np.float32)
    y = np.zeros((NUM_JOINTS, k), np.float32)
    s = np.zeros((NUM_JOINTS, k), np.float32)
    v = np.zeros((NUM_JOINTS, k), bool)
    for j, plist in enumerate(ref_peaks):
        if len(plist) > k:
            raise AssertionError(
                f"test scene overflows capacity: joint {j} has "
                f"{len(plist)} peaks > k={k}")
        for i, (px, py, ps) in enumerate(plist):
            x[j, i], y[j, i], s[j, i], v[j, i] = px, py, ps, True
    return Peaks(x=jnp.asarray(x), y=jnp.asarray(y), score=jnp.asarray(s),
                 valid=jnp.asarray(v))


def _connections_to_lists(conn: Connections):
    out = []
    for l in range(NUM_LIMBS):
        valid = np.asarray(conn.valid[l])
        out.append([
            (int(conn.a_slot[l, i]), int(conn.b_slot[l, i]),
             float(conn.score[l, i]))
            for i in range(valid.shape[0]) if valid[i]
        ])
    return out


def test_connections_match_oracle():
    limbs_a = jnp.asarray([a for a, _ in LIMBS], jnp.int32)
    limbs_b = jnp.asarray([b for _, b in LIMBS], jnp.int32)
    for seed in (7, 21, 22, 23, 24):
        rng = np.random.RandomState(seed)
        pafs, heatmaps = _render_scene(rng, n_people=1 + seed % 4)
        ref_peaks = oracle_peaks(heatmaps[:-1], CFG)
        peaks = _peaks_from_oracle(ref_peaks, CFG.max_peaks_per_joint)
        img_len = heatmaps.shape[2]

        got = _connections_to_lists(compute_connections(
            jnp.asarray(pafs), peaks, img_len, CFG, limbs_a, limbs_b))
        ref = oracle_connections(pafs, ref_peaks, img_len, CFG)

        for l in range(NUM_LIMBS):
            assert len(got[l]) == len(ref[l]), f"seed {seed} limb {l}"
            for (ga, gb, gs), (ra, rb, rs) in zip(got[l], ref[l]):
                assert (ga, gb) == (ra, rb), \
                    f"seed {seed} limb {l}: {got[l]} vs {ref[l]}"
                np.testing.assert_allclose(gs, rs, atol=1e-5)


def test_grouping_matches_oracle():
    rng = np.random.RandomState(8)
    for trial in range(5):
        pafs, heatmaps = _render_scene(rng, n_people=2 + trial % 3)
        ref_peaks = oracle_peaks(heatmaps[:-1], CFG)
        peaks = _peaks_from_oracle(ref_peaks, CFG.max_peaks_per_joint)
        img_len = heatmaps.shape[2]
        ref_conns = oracle_connections(pafs, ref_peaks, img_len, CFG)

        peak_scores = np.asarray(peaks.score)
        ref_subsets = group_keypoints_numpy(ref_conns, peak_scores, CFG)

        # Feed identical connections to the device implementation.
        k = CFG.max_peaks_per_joint
        a = np.full((NUM_LIMBS, k), -1, np.int32)
        b = np.full((NUM_LIMBS, k), -1, np.int32)
        s = np.zeros((NUM_LIMBS, k), np.float32)
        v = np.zeros((NUM_LIMBS, k), bool)
        for l, conns in enumerate(ref_conns):
            for i, (ia, ib, sc) in enumerate(conns):
                a[l, i], b[l, i], s[l, i], v[l, i] = ia, ib, sc, True
        conn = Connections(a_slot=jnp.asarray(a), b_slot=jnp.asarray(b),
                           score=jnp.asarray(s), valid=jnp.asarray(v))

        got = group_keypoints(conn, peaks, CFG)
        got_rows = [
            (tuple(np.asarray(got.joint_slot[i])), float(got.score[i]),
             float(got.count[i]))
            for i in range(CFG.max_subsets) if bool(got.valid[i])
        ]
        ref_rows = [
            (tuple(r["j"]), float(r["score"]), float(r["count"]))
            for r in ref_subsets
        ]
        assert len(got_rows) == len(ref_rows), f"trial {trial}"
        # Order-insensitive MULTISET comparison (each ref row consumed at
        # most once, so duplicate-emission bugs cannot hide).
        remaining = list(ref_rows)
        for gr in got_rows:
            match = next(
                (i for i, rr in enumerate(remaining)
                 if rr[0] == gr[0]
                 and abs(rr[1] - gr[1]) < 1e-4
                 and abs(rr[2] - gr[2]) < 1e-4), None)
            assert match is not None, \
                f"trial {trial}: {gr} not in {remaining}"
            remaining.pop(match)


def test_full_postprocess_matches_oracle_pipeline():
    rng = np.random.RandomState(9)
    pafs, heatmaps = _render_scene(rng, n_people=3)
    img_len = heatmaps.shape[2]

    # Oracle pipeline.
    ref_peaks = oracle_peaks(heatmaps[:-1], CFG)
    ref_conns = oracle_connections(pafs, ref_peaks, img_len, CFG)
    peaks_packed = _peaks_from_oracle(ref_peaks, CFG.max_peaks_per_joint)
    peak_scores = np.asarray(peaks_packed.score)
    ref_subsets = group_keypoints_numpy(ref_conns, peak_scores, CFG)
    # Multiset of (pose, score): duplicates and per-subset score bugs
    # must fail (a set-of-poses comparison would hide both).
    ref_entries = []
    for r in ref_subsets:
        joints = []
        for j in range(NUM_JOINTS):
            slot = r["j"][j]
            if slot >= 0:
                px, py, _ = ref_peaks[j][slot]
                joints.append((px, py, 2))
            else:
                joints.append((0, 0, 0))
        ref_entries.append((tuple(joints), round(float(r["score"]), 4)))

    # Device pipeline.
    result = postprocess_pose(jnp.asarray(pafs), jnp.asarray(heatmaps),
                              img_len, CFG)
    got_entries = []
    for i in range(CFG.max_subsets):
        if bool(result.valid[i]):
            pose = np.asarray(result.poses[i])
            got_entries.append((
                tuple((int(x), int(y), int(v)) for x, y, v in pose),
                round(float(result.scores[i]), 4)))

    assert sorted(got_entries) == sorted(ref_entries)
    assert int(result.num_peaks) == sum(len(p) for p in ref_peaks)


def test_postprocess_respects_nms_mode():
    """cfg.nms_mode plumbs through to the peak stage: a 2-pixel plateau is
    two peaks under the GPU ``>=`` rule and none under the CPU rule."""
    h, w = 46, 62
    heatmaps = np.zeros((NUM_JOINTS + 1, h, w), np.float32)
    heatmaps[0, 20, 30] = 3.0
    heatmaps[0, 20, 31] = 3.0
    pafs = jnp.zeros((2 * NUM_LIMBS, h, w))

    conv = postprocess_pose(pafs, jnp.asarray(heatmaps), w,
                            InferenceConfig(nms_mode="conv"))
    assert int(conv.num_peaks) == 2
    scipy_mode = postprocess_pose(pafs, jnp.asarray(heatmaps), w,
                                  InferenceConfig())
    assert int(scipy_mode.num_peaks) == 0


def test_peak_capacity_saturation_is_counted():
    """>K peaks of one joint: the table truncates (known deviation) and
    the overflow is surfaced in Peaks.dropped / PoseResult.peaks_dropped."""
    from tpupose.ops.peaks import find_peaks

    h, w = 46, 62
    heatmaps = np.zeros((NUM_JOINTS + 1, h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    n_bumps = 12
    for i in range(n_bumps):
        cy, cx = 8 + 10 * (i // 4), 8 + 15 * (i % 4)
        heatmaps[0] += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 4.0)
    cfg = InferenceConfig(max_peaks_per_joint=8)

    peaks = find_peaks(jnp.asarray(heatmaps[:-1]), cfg.gaussian_sigma,
                       cfg.heatmap_peak_thresh, cfg.max_peaks_per_joint)
    assert int(jnp.sum(peaks.valid)) == 8
    assert int(peaks.dropped) == n_bumps - 8

    result = postprocess_pose(
        jnp.zeros((2 * NUM_LIMBS, h, w)), jnp.asarray(heatmaps), w, cfg)
    assert int(result.peaks_dropped) == n_bumps - 8

    # within capacity: counter stays 0 (outputs = exact reference)
    ok = find_peaks(jnp.asarray(heatmaps[:-1]), cfg.gaussian_sigma,
                    cfg.heatmap_peak_thresh, 16)
    assert int(ok.dropped) == 0


def test_subset_capacity_saturation_is_counted():
    """More spawning connections than max_subsets: the extra spawns are
    refused and counted in Subsets.spawns_suppressed."""
    k = 8
    a = np.full((NUM_LIMBS, k), -1, np.int32)
    b = np.full((NUM_LIMBS, k), -1, np.int32)
    s = np.zeros((NUM_LIMBS, k), np.float32)
    v = np.zeros((NUM_LIMBS, k), bool)
    # limb 0 (neck->hip): 4 disjoint connections, all spawning
    for i in range(4):
        a[0, i], b[0, i], s[0, i], v[0, i] = i, i, 0.9, True
    conn = Connections(a_slot=jnp.asarray(a), b_slot=jnp.asarray(b),
                       score=jnp.asarray(s), valid=jnp.asarray(v))
    x = np.tile(np.arange(k, dtype=np.float32) * 5, (NUM_JOINTS, 1))
    peaks = Peaks(x=jnp.asarray(x), y=jnp.asarray(x),
                  score=jnp.full((NUM_JOINTS, k), 0.5),
                  valid=jnp.ones((NUM_JOINTS, k), bool))

    cfg_small = InferenceConfig(max_peaks_per_joint=k, max_subsets=2)
    got = group_keypoints(conn, peaks, cfg_small)
    assert int(got.spawns_suppressed) == 2
    cfg_big = InferenceConfig(max_peaks_per_joint=k, max_subsets=8)
    assert int(group_keypoints(conn, peaks, cfg_big).spawns_suppressed) == 0


def test_detector_warns_once_on_saturation():
    import warnings as warnings_mod

    import pytest

    from tpupose.detectors import PoseDetector
    from tpupose.ops.postprocess import PoseResult

    det = PoseDetector("posenet", params={"params": {}})
    s_cap = 4
    result = PoseResult(
        poses=jnp.zeros((s_cap, NUM_JOINTS, 3)),
        scores=jnp.zeros((s_cap,)),
        valid=jnp.zeros((s_cap,), bool),
        num_peaks=jnp.int32(40),
        peaks_dropped=jnp.int32(8),
        spawns_suppressed=jnp.int32(2),
    )
    with pytest.warns(RuntimeWarning, match="capacity saturated"):
        det._emit(result, 1.0, 1.0)
    with warnings_mod.catch_warnings():
        warnings_mod.simplefilter("error")  # second hit must NOT warn
        det._emit(result, 1.0, 1.0)


def test_greedy_match_ties_and_stress():
    """Adversarial stress for the sort-free matcher: many seeds, duplicate
    scores (tie-break must follow a-major enumeration order), saturated
    endpoints, and varying candidate counts — vs a direct transcription of
    the reference's sorted-scan greedy (pose_detector.py:158,172-177)."""
    from tpupose.ops.paf import greedy_match

    def oracle(score, valid, n_a, n_b):
        k = score.shape[0]
        cands = [(score[a, b], a, b)
                 for a in range(k) for b in range(k) if valid[a, b]]
        cands.sort(key=lambda c: -c[0])  # stable: a-major preserved
        used_a, used_b, out = set(), set(), []
        for s, a, b in cands:
            if a not in used_a and b not in used_b:
                out.append((a, b, s))
                used_a.add(a)
                used_b.add(b)
                if len(out) >= min(n_a, n_b):
                    break
        return out

    rng = np.random.RandomState(0)
    for trial in range(30):
        k = rng.choice([4, 8])
        # quantized scores force frequent exact ties
        score = rng.randint(0, 4, (k, k)).astype(np.float32) / 4.0
        n_a = rng.randint(0, k + 1)
        n_b = rng.randint(0, k + 1)
        # valid pairs only exist between actual peaks (as in the real
        # pipeline, where score_candidates gates by a_valid & b_valid)
        valid = rng.rand(k, k) < rng.uniform(0.2, 0.9)
        valid[n_a:, :] = False
        valid[:, n_b:] = False
        ref = oracle(score, valid, n_a, n_b)

        a, b, s, v = greedy_match(jnp.asarray(score), jnp.asarray(valid),
                                  jnp.int32(n_a), jnp.int32(n_b))
        got = [(int(a[i]), int(b[i]), float(s[i]))
               for i in range(k) if bool(v[i])]
        assert len(got) == len(ref), f"trial {trial}: {got} vs {ref}"
        for (ga, gb, gs), (ra, rb, rs) in zip(got, ref):
            assert (ga, gb) == (ra, rb), f"trial {trial}: {got} vs {ref}"
            np.testing.assert_allclose(gs, rs, atol=1e-6)
