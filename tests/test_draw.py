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


class TestGroupingCases:
    def test_merge_disjoint_subsets(self):
        """Limb 0 (neck-Rwaist) and limb 1 (Rwaist-Rknee) spawn/merge;
        then limb 6 (neck-Rshoulder) attaches to the merged subset."""
        conns = [[] for _ in range(19)]
        conns[0] = [(0, 0, 1.0)]   # spawns subset A: neck0, rwaist0
        conns[2] = [(1, 1, 1.0)]   # limb 2 rknee-rfoot spawns subset B
        conns[1] = [(0, 1, 1.0)]   # rwaist0-rknee1 joins A and B -> merge
        conns[6] = [(0, 2, 0.5)]   # attach rshoulder2 to merged subset
        _run_both(conns)

    def test_fill_overlapping_subsets(self):
        """Two subsets share a joint column value -> case 2b fill path."""
        conns = [[] for _ in range(19)]
        conns[0] = [(0, 0, 1.0), (1, 1, 0.9)]  # two people spawned
        # limb 14 neck-nose: neck0 belongs to person A; nose1 not yet
        # anywhere; but craft a second connection so BOTH subsets match:
        conns[14] = [(0, 1, 0.8), (1, 0, 0.7)]
        # limb 15 nose-Reye: nose1 (in A now) and nose0 (in B) both match
        conns[15] = [(1, 1, 0.6), (0, 0, 0.5)]
        _run_both(conns)

    def test_non_spawning_limb(self):
        """Shoulder-ear limbs (9, 13) never create new subsets."""
        conns = [[] for _ in range(19)]
        conns[9] = [(0, 0, 1.0)]
        conns[13] = [(1, 1, 1.0)]
        _run_both(conns)

    def test_three_plus_matches_ignored(self):
        """>= 3 matching subsets -> connection ignored (ref drops it)."""
        conns = [[] for _ in range(19)]
        # three subsets all containing distinct neck slots
        conns[0] = [(0, 0, 1.0), (1, 1, 0.9), (2, 2, 0.8)]
        # limb 6 neck-Rshoulder with neck slot 0: matches subset 1 only...
        # craft a case where 3 subsets share the rshoulder column:
        conns[6] = [(0, 3, 1.0)]
        conns[7] = [(3, 0, 1.0)]   # rshoulder3-relbow0 attaches
        _run_both(conns)

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
