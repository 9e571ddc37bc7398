"""Drawing overlay smoke tests + targeted grouping merge/fill cases."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpupose.config import InferenceConfig
from tpupose.detectors import (
    draw_face_keypoints,
    draw_hand_keypoints,
    draw_person_pose,
)
from tpupose.ops.grouping import group_keypoints, group_keypoints_numpy
from tpupose.ops.paf import Connections
from tpupose.ops.peaks import Peaks

CV2 = pytest.importorskip("cv2")


class TestDrawing:
    def test_draw_person_pose(self):
        img = np.zeros((60, 80, 3), np.uint8)
        pose = np.zeros((18, 3))
        pose[:, 0] = np.linspace(10, 70, 18)
        pose[:, 1] = np.linspace(10, 50, 18)
        pose[:, 2] = 2
        out = draw_person_pose(img, pose[None])
        assert out.shape == img.shape
        assert out.any()  # limbs + joints drawn

    def test_draw_person_pose_empty(self):
        img = np.zeros((60, 80, 3), np.uint8)
        out = draw_person_pose(img, np.empty((0, 18, 3)))
        assert not out.any()

    def test_draw_face_and_hand(self):
        img = np.zeros((60, 80, 3), np.uint8)
        face_kpts = [[10 + i % 40, 10 + i // 4, 0.9] for i in range(70)]
        out = draw_face_keypoints(img, face_kpts, (0, 0))
        assert out.any()
        hand_kpts = [[5 + 3 * i, 20, 0.9] for i in range(21)]
        out2 = draw_hand_keypoints(img, hand_kpts, (0, 0))
        assert out2.any()
        # None entries (below-threshold keypoints) are skipped
        out3 = draw_face_keypoints(img, [None] * 70, (0, 0))
        assert not out3.any()


def _mk_peaks(k=4):
    """Peaks with distinct scores at every (joint, slot)."""
    x = np.tile(np.arange(k, dtype=np.float32), (18, 1))
    y = np.tile(np.arange(18, dtype=np.float32)[:, None], (1, k))
    score = 0.5 + 0.01 * (np.arange(18)[:, None] * k
                          + np.arange(k)[None, :]).astype(np.float32)
    valid = np.ones((18, k), bool)
    return Peaks(x=jnp.asarray(x), y=jnp.asarray(y),
                 score=jnp.asarray(score), valid=jnp.asarray(valid))


def _run_both(conn_lists, k=4):
    """Feed identical connection lists to device + oracle grouping."""
    cfg = InferenceConfig(max_peaks_per_joint=k, max_subsets=16,
                          n_subset_limbs_thresh=0, subset_score_thresh=0.0)
    peaks = _mk_peaks(k)
    a = np.full((19, k), -1, np.int32)
    b = np.full((19, k), -1, np.int32)
    s = np.zeros((19, k), np.float32)
    v = np.zeros((19, k), bool)
    for l, conns in enumerate(conn_lists):
        for i, (ia, ib, sc) in enumerate(conns):
            a[l, i], b[l, i], s[l, i], v[l, i] = ia, ib, sc, True
    conn = Connections(a_slot=jnp.asarray(a), b_slot=jnp.asarray(b),
                       score=jnp.asarray(s), valid=jnp.asarray(v))
    got = group_keypoints(conn, peaks, cfg)
    got_rows = sorted(
        (tuple(np.asarray(got.joint_slot[i])), round(float(got.score[i]), 4),
         round(float(got.count[i]), 4))
        for i in range(16) if bool(got.valid[i]))
    ref = group_keypoints_numpy(conn_lists, np.asarray(peaks.score), cfg)
    ref_rows = sorted(
        (tuple(r["j"]), round(float(r["score"]), 4),
         round(float(r["count"]), 4)) for r in ref)
    assert got_rows == ref_rows
    return got_rows


class TestGroupingCases:
    def test_merge_disjoint_subsets(self):
        """Reachable merge: S_x spawned at limb 15 {nose0, reye0}; S_y
        assembled via limbs 7+9 {rsh0, relb0, rear0}; limb 17's
        (reye0, rear0) matches S_x via ja and S_y via jb with NO shared
        joint column -> case 2a merge."""
        conns = [[] for _ in range(19)]
        conns[7] = [(0, 0, 1.0)]    # spawn S_y {rsh0, relb0}
        conns[9] = [(0, 0, 0.9)]    # attach rear0 -> S_y (non-spawning ok)
        conns[15] = [(0, 0, 0.8)]   # spawn S_x {nose0, reye0}
        conns[17] = [(0, 0, 0.7)]   # bridge: merge S_x into S_y
        subsets = _run_both(conns)
        # merge happened: one combined subset holding joints from both
        # sides, and the reference quirk added the bridge's connection
        # score to the count column -> non-integer count
        merged = [s for s in subsets
                  if s[0][2] >= 0 and s[0][14] >= 0]  # rsh AND right eye
        assert len(merged) == 1
        assert abs(merged[0][2] - round(merged[0][2])) > 1e-6

    def test_fill_overlapping_subsets(self):
        """Reachable case-2b fill: S_x {neck0,rwaist0,nose1,reye1} and
        S_y {neck1,rsh0,relb0,rear0,nose0,reye0} overlap in the neck/nose/
        reye columns; limb 17's (reye1, rear0) matches S_x via ja and S_y
        via jb -> fill attaches rear0 to S_x too."""
        conns = [[] for _ in range(19)]
        conns[0] = [(0, 0, 1.0)]                  # spawn S_x {neck0,rwaist0}
        conns[6] = [(1, 0, 1.0)]                  # spawn S_y {neck1,rsh0}
        conns[7] = [(0, 0, 0.9)]                  # relb0 -> S_y
        conns[9] = [(0, 0, 0.9)]                  # rear0 -> S_y
        conns[14] = [(1, 0, 0.8), (0, 1, 0.7)]    # nose0->S_y, nose1->S_x
        conns[15] = [(0, 0, 0.6), (1, 1, 0.5)]    # reye0->S_y, reye1->S_x
        conns[17] = [(1, 0, 0.4)]                 # bridge -> FILL
        subsets = _run_both(conns)
        # fill proof: BOTH surviving subsets hold rear slot 0 (joint 16)
        rears = sorted(s[0][16] for s in subsets)
        assert rears == [0, 0], subsets

    def test_three_plus_matches_ignored(self):
        """>= 3 matching subsets -> the connection is dropped.  Extends the
        fill scenario: after the limb-17 fill, S_x and S_y BOTH hold
        rear0, and a third subset S_z holds reye2; a further (reye2,
        rear0) connection then matches 3 subsets.  (The second limb-17
        connection reuses rear0, which the 1:1 matcher would not emit —
        fine here: both implementations must process the same list
        identically, as the reference grouping would.)"""
        base = [[] for _ in range(19)]
        base[0] = [(0, 0, 1.0)]
        base[6] = [(1, 0, 1.0)]
        base[7] = [(0, 0, 0.9)]
        base[9] = [(0, 0, 0.9)]
        base[14] = [(1, 0, 0.8), (0, 1, 0.7), (2, 2, 0.65)]  # S_z {neck2,nose2}
        base[15] = [(0, 0, 0.6), (1, 1, 0.5), (2, 2, 0.45)]  # reye2 -> S_z
        base[17] = [(1, 0, 0.4)]
        with_extra = [list(c) for c in base]
        with_extra[17] = [(1, 0, 0.4), (2, 0, 0.3)]  # matches S_x,S_y,S_z
        a = _run_both(base)
        b = _run_both(with_extra)
        assert a == b  # the 3-subset connection changed nothing

    def test_non_spawning_limb(self):
        """Shoulder-ear limbs (9, 13) never create new subsets."""
        conns = [[] for _ in range(19)]
        conns[9] = [(0, 0, 1.0)]
        conns[13] = [(1, 1, 1.0)]
        subsets = _run_both(conns)
        assert subsets == []

    def test_random_stress_vs_oracle(self):
        rng = np.random.RandomState(3)
        for trial in range(10):
            conns = [[] for _ in range(19)]
            for l in range(19):
                used_a, used_b = set(), set()
                for _ in range(rng.randint(0, 4)):
                    a, b = rng.randint(4), rng.randint(4)
                    if a in used_a or b in used_b:
                        continue
                    used_a.add(a)
                    used_b.add(b)
                    conns[l].append((a, b, float(rng.rand())))
                # sort by score desc = greedy acceptance order
                conns[l].sort(key=lambda c: -c[2])
            _run_both(conns)
