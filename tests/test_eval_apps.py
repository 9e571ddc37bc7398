"""Tests for the OKS evaluator, demo cascade, and streaming camera app."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_postprocess import _render_scene  # noqa: E402

from tpupose.config import (  # noqa: E402
    FaceConfig,
    HandConfig,
    InferenceConfig,
)
from tpupose.evaluation import (  # noqa: E402
    KeypointEvaluator,
    compute_oks,
    pose18_to_coco17,
    poses_to_results,
)

CV2 = pytest.importorskip("cv2")

SMALL_CFG = InferenceConfig(
    img_size=64, heatmap_size=64, max_peaks_per_joint=8, max_subsets=16)


class _StubModel:
    """Stands in for CocoPoseNet: emits fixed synthetic pafs/heatmaps
    resized to the input's stride-8 grid, stacked to 6 stages.

    The heatmaps are scaled by a ±5% factor derived from each frame's
    mean pixel value, so DISTINCT frames yield distinct detection
    scores (same keypoints) — frame<->result misalignment in pipelined,
    batched, or evaluator code paths then shows up as score mismatches
    instead of passing vacuously."""

    def __init__(self, pafs, heatmaps):
        self._pafs = np.transpose(pafs, (1, 2, 0))[None]        # NHWC
        self._heatmaps = np.transpose(heatmaps, (1, 2, 0))[None]

    def apply(self, variables, x):
        from tpupose.ops.resize import resize_cv2_linear

        b, h, w = x.shape[0], x.shape[1] // 8, x.shape[2] // 8
        paf = resize_cv2_linear(jnp.asarray(self._pafs), (h, w))
        hm = resize_cv2_linear(jnp.asarray(self._heatmaps), (h, w))
        # (B, 1, 1, 1) per-frame amplitude from the preprocessed frame
        # (x is ~[-0.5, 0.5] after /255 - 0.5)
        amp = 1.0 + 0.1 * jnp.mean(
            x.reshape(b, -1), axis=1)[:, None, None, None]

        def stack(a, scale=None):
            a = jnp.broadcast_to(a, (b,) + a.shape[1:])
            if scale is not None:
                a = a * scale
            return jnp.broadcast_to(a[None], (6,) + a.shape)

        return stack(paf), stack(hm, amp)


def _write_video(path, n_frames, wh=(124, 92), fps=10.0, seed=0):
    """Write ``n_frames`` random frames to ``path`` (wh = (width, height))
    — the one fixture-video helper shared by every camera-app test."""
    wr = CV2.VideoWriter(str(path), CV2.VideoWriter_fourcc(*"mp4v"),
                         fps, wh)
    rng = np.random.RandomState(seed)
    for _ in range(n_frames):
        wr.write(rng.randint(0, 255, (wh[1], wh[0], 3), dtype=np.uint8))
    wr.release()


def _stub_pose_detector(precise=False, n_people=2, seed=3):
    from tpupose.detectors import PoseDetector

    rng = np.random.RandomState(seed)
    pafs, heatmaps = _render_scene(rng, n_people=n_people, hw=(46, 62))
    det = PoseDetector("posenet", params={"params": {}}, cfg=SMALL_CFG,
                       precise=precise)
    det.model = _StubModel(pafs, heatmaps)
    return det


def _gt_from_pose17(kpts17, area=3000.0):
    return {
        "keypoints": [float(v) for row in kpts17 for v in row],
        "num_keypoints": int((kpts17[:, 2] > 0).sum()),
        "area": area,
        "iscrowd": 0,
        "bbox": [float(kpts17[:, 0].min()), float(kpts17[:, 1].min()),
                 float(np.ptp(kpts17[:, 0])), float(np.ptp(kpts17[:, 1]))],
    }


def _random_kpts17(rng, lo=50, hi=250):
    k = np.zeros((17, 3))
    k[:, 0] = rng.uniform(lo, hi, 17)
    k[:, 1] = rng.uniform(lo, hi, 17)
    k[:, 2] = 2
    return k


class TestOKS:
    def test_perfect_match_oks_one(self):
        rng = np.random.RandomState(0)
        k = _random_kpts17(rng)
        gt = _gt_from_pose17(k)
        assert compute_oks(k, gt) == pytest.approx(1.0)

    def test_distance_decreases_oks(self):
        rng = np.random.RandomState(0)
        k = _random_kpts17(rng)
        gt = _gt_from_pose17(k)
        near = k.copy()
        near[:, 0] += 2
        far = k.copy()
        far[:, 0] += 30
        assert compute_oks(near, gt) > compute_oks(far, gt)

    def test_unlabeled_gt_uses_bbox(self):
        gt = {"keypoints": [0.0] * 51, "num_keypoints": 0,
              "area": 900.0, "bbox": [100, 100, 30, 30], "iscrowd": 1}
        inside = np.full((17, 3), 110.0)
        outside = np.full((17, 3), 500.0)
        assert compute_oks(inside, gt) == pytest.approx(1.0)
        assert compute_oks(outside, gt) < 0.01


class TestEvaluator:
    def _make_scene(self, rng, n=3):
        gts, dts = [], []
        for i in range(n):
            k = _random_kpts17(rng, lo=60 + 120 * i, hi=140 + 120 * i)
            gts.append(_gt_from_pose17(k))
            dts.append({
                "keypoints": [float(v) for row in k for v in row],
                "score": 0.9 - 0.1 * i,
            })
        return dts, gts

    def test_perfect_detections_ap_one(self):
        rng = np.random.RandomState(1)
        ev = KeypointEvaluator()
        for _ in range(4):
            dts, gts = self._make_scene(rng)
            ev.add_image(dts, gts)
        stats = ev.summarize()
        assert stats["AP"] == pytest.approx(1.0)
        assert stats["AR"] == pytest.approx(1.0)

    def test_missed_detections_lower_ap(self):
        rng = np.random.RandomState(2)
        ev = KeypointEvaluator()
        for _ in range(4):
            dts, gts = self._make_scene(rng)
            ev.add_image(dts[:1], gts)  # detect 1 of 3
        stats = ev.summarize()
        assert 0.0 < stats["AP"] < 0.5

    def test_false_positives_lower_ap(self):
        rng = np.random.RandomState(3)
        ev_clean = KeypointEvaluator()
        ev_fp = KeypointEvaluator()
        for _ in range(4):
            dts, gts = self._make_scene(rng)
            ev_clean.add_image(dts, gts)
            fp = {"keypoints": [float(v) for v in
                                _random_kpts17(rng, 400, 500).reshape(-1)],
                  "score": 0.95}
            ev_fp.add_image(dts + [fp], gts)
        assert ev_fp.summarize()["AP"] < ev_clean.summarize()["AP"]

    def test_crowd_gt_ignored(self):
        """A detection matching only a crowd gt is neither TP nor FP."""
        rng = np.random.RandomState(4)
        ev = KeypointEvaluator()
        dts, gts = self._make_scene(rng, n=2)
        crowd = {"keypoints": [0.0] * 51, "num_keypoints": 0,
                 "area": 10000.0, "bbox": [400, 400, 100, 100],
                 "iscrowd": 1}
        in_crowd = {"keypoints": [float(v) for v in
                                  np.full((17, 3), 450.0).reshape(-1)],
                    "score": 0.99}
        ev.add_image(dts + [in_crowd], gts + [crowd])
        assert ev.summarize()["AP"] == pytest.approx(1.0)


class TestPoseToCoco:
    def test_roundtrip_mapping(self):
        pose = np.zeros((18, 3))
        pose[:, 0] = np.arange(18)
        pose[:, 1] = np.arange(18) * 2
        pose[:, 2] = 2
        k = pose18_to_coco17(pose)
        # COCO idx 0 = Nose (joint 0), idx 5 = LeftShoulder (joint 5)
        assert k[0, 0] == 0
        assert k[5, 0] == 5
        res = poses_to_results(pose[None], [10.0], img_id=7)
        assert res[0]["image_id"] == 7
        assert len(res[0]["keypoints"]) == 51


class TestDemoCascade:
    def test_run_cascade_stubbed(self, tmp_path):
        from tpupose.apps.demo import run_cascade
        from tpupose.detectors import FaceDetector, HandDetector

        img = np.random.RandomState(0).randint(
            0, 255, (92, 124, 3), dtype=np.uint8)
        pose_det = _stub_pose_detector()
        face_det = FaceDetector("facenet", cfg=FaceConfig(img_size=64))
        hand_det = HandDetector("handnet", cfg=HandConfig(img_size=64))
        res_img, results = run_cascade(img, pose_det, face_det, hand_det)
        assert res_img.shape == img.shape
        assert len(results["poses"]) >= 1


class TestCameraApp:
    def test_video_pipeline(self, tmp_path, monkeypatch):
        import tpupose.detectors as det_mod
        from tpupose.apps import camera

        video = str(tmp_path / "in.mp4")
        _write_video(video, 5, wh=(124, 92))

        stub = _stub_pose_detector()  # build before patching the symbol
        monkeypatch.setattr(det_mod, "PoseDetector",
                            lambda *a, **kw: stub)
        out = str(tmp_path / "out.mp4")
        camera.main(["pose", "--video", video, "--headless",
                     "--save", out, "--max-frames", "4"])
        assert os.path.exists(out)
        cap = CV2.VideoCapture(out)
        n = int(cap.get(CV2.CAP_PROP_FRAME_COUNT))
        cap.release()
        assert n >= 3

    def test_video_pipeline_precise_streaming(self, tmp_path, monkeypatch):
        """--precise: the multi-scale pipeline runs through the same
        submit/collect software pipelining as the fast path (the
        reference's precise mode is strictly serial)."""
        import tpupose.detectors as det_mod
        from tpupose.apps import camera

        video = str(tmp_path / "in.mp4")
        _write_video(video, 4, wh=(64, 48))

        stub = _stub_pose_detector(precise=True)
        monkeypatch.setattr(det_mod, "PoseDetector",
                            lambda *a, **kw: stub)
        out = str(tmp_path / "out.mp4")
        camera.main(["pose", "--video", video, "--headless", "--precise",
                     "--save", out, "--max-frames", "3"])
        cap = CV2.VideoCapture(out)
        n = int(cap.get(CV2.CAP_PROP_FRAME_COUNT))
        cap.release()
        assert n >= 2

    def test_precise_batched_video(self, tmp_path, monkeypatch):
        """--precise --batch: groups of frames run the full multi-scale
        pyramid through batched fused programs."""
        import tpupose.detectors as det_mod
        from tpupose.apps import camera

        video = str(tmp_path / "in.mp4")
        _write_video(video, 4, wh=(64, 48))

        stub = _stub_pose_detector(precise=True)
        monkeypatch.setattr(det_mod, "PoseDetector",
                            lambda *a, **kw: stub)
        out = str(tmp_path / "out.mp4")
        camera.main(["pose", "--video", video, "--headless", "--precise",
                     "--batch", "2", "--save", out, "--max-frames", "4"])
        cap = CV2.VideoCapture(out)
        n = int(cap.get(CV2.CAP_PROP_FRAME_COUNT))
        cap.release()
        assert n >= 3

    def test_haar_cascade_path_prefers_vendored_file(self):
        """The reference ships models/haarcascade_frontalface_alt.xml; the
        vendored copy restores Haar face mode on headless cv2 builds that
        lack cv2.data.haarcascades."""
        from tpupose.apps.camera import haar_cascade_path

        path = haar_cascade_path()
        assert os.path.exists(path)
        assert "tpupose" in path and path.endswith(
            "haarcascade_frontalface_alt.xml")


class TestBatchedPrecise:
    @pytest.mark.parametrize("device_pyramid", [True, False])
    def test_detect_batch_precise_matches_single(self, device_pyramid):
        """Batched multi-scale inference (new capability; the reference's
        precise mode is a serial per-frame per-scale loop) must equal the
        single-frame precise path per frame — in BOTH pyramid modes (the
        cfg.device_pyramid parity knob must not be silently voided by
        batching)."""
        import dataclasses

        det = _stub_pose_detector(precise=True)
        det.cfg = dataclasses.replace(det.cfg,
                                      device_pyramid=device_pyramid)
        rng = np.random.RandomState(5)
        imgs = rng.randint(0, 255, (3, 60, 76, 3), np.uint8)
        singles = [det(img) for img in imgs]
        batched = det.detect_batch(imgs)
        assert len(batched) == 3
        for (bp, bs), (sp, ss) in zip(batched, singles):
            np.testing.assert_allclose(bp, sp, atol=1e-4)
            np.testing.assert_allclose(bs, ss, atol=1e-4)


class TestBatchedCrops:
    def test_face_batch_matches_single(self):
        from tpupose.detectors import FaceDetector

        det = FaceDetector("facenet", cfg=FaceConfig(img_size=64))
        rng = np.random.RandomState(5)
        crops = [rng.randint(0, 255, (40 + 8 * i, 36 + 4 * i, 3),
                             dtype=np.uint8) for i in range(3)]
        batched = det.detect_batch(crops)
        for crop, got in zip(crops, batched):
            single = det(crop)
            assert got == single

    def test_hand_batch_matches_single_with_flip(self):
        from tpupose.detectors import HandDetector

        det = HandDetector("handnet", cfg=HandConfig(img_size=64))
        rng = np.random.RandomState(6)
        crops = [rng.randint(0, 255, (44, 52, 3), dtype=np.uint8)
                 for _ in range(2)]
        sides = ["left", "right"]
        batched = det.detect_batch(crops, sides)
        for crop, side, got in zip(crops, sides, batched):
            single = det(crop, hand_type=side)
            assert got == single

    def test_empty_batches(self):
        from tpupose.detectors import FaceDetector, HandDetector

        assert FaceDetector(
            "facenet", cfg=FaceConfig(img_size=64)).detect_batch([]) == []
        assert HandDetector(
            "handnet",
            cfg=HandConfig(img_size=64)).detect_batch([], []) == []


class TestEvaluatorProtocolRules:
    def test_crowd_rematchable_by_multiple_dts(self):
        """Two detections overlapping one crowd region: both ignored,
        neither a false positive (official evaluateImg semantics)."""
        rng = np.random.RandomState(10)
        ev = KeypointEvaluator()
        k = _random_kpts17(rng, lo=60, hi=140)
        gts = [_gt_from_pose17(k)]
        crowd = {"keypoints": [0.0] * 51, "num_keypoints": 0,
                 "area": 10000.0, "bbox": [400, 400, 100, 100],
                 "iscrowd": 1}
        good = {"keypoints": [float(v) for row in k for v in row],
                "score": 0.9, "area": 6000.0}
        in_crowd = [{"keypoints": [float(v) for v in
                                   np.full((17, 3), 420.0 + 10 * i
                                           ).reshape(-1)],
                     "score": 0.8 - 0.1 * i, "area": 5000.0}
                    for i in range(2)]
        ev.add_image([good] + in_crowd, gts + [crowd])
        assert ev.summarize()["AP"] == pytest.approx(1.0)

    def test_out_of_range_unmatched_dt_ignored(self):
        """A large-person detection under the 'medium' range is ignored
        when unmatched, not counted as FP."""
        from tpupose.evaluation import AREA_RANGES, _accumulate, \
            _evaluate_image

        rng = np.random.RandomState(11)
        k_med = _random_kpts17(rng, lo=100, hi=150)   # ~50x50 extent
        gt_med = _gt_from_pose17(k_med, area=2500.0)
        dt_med = {"keypoints": [float(v) for row in k_med for v in row],
                  "score": 0.9, "area": 2500.0}
        # far-away large detection (area > 96^2)
        k_large = _random_kpts17(rng, lo=400, hi=520)
        dt_large = {"keypoints": [float(v) for row in k_large for v in row],
                    "score": 0.95, "area": float(120 * 120)}
        e = _evaluate_image([dt_med, dt_large], [gt_med],
                            AREA_RANGES["medium"])
        stats = _accumulate([e])
        assert stats["AP"] == pytest.approx(1.0)


class TestHandDerivedAPFixture:
    """Anchors the AP protocol to numbers derived BY HAND from the official
    COCO evaluation definition (no pycocotools on this box; the arithmetic
    is documented step by step so any structural misreading of the
    protocol fails against an independently derived expectation).

    Scenario (2 images, 2 GTs, 3 detections, category person):
      img1: GT_A fully visible at P (area 2500).  D1 = exact copy,
            score .9 -> OKS 1.  D2 far away, score .8 -> OKS ~= 0 (FP).
      img2: GT_B with ONE visible keypoint (nose, sigma .026).  D3 at
            offset d with OKS = exp(-d^2 / (2*area*(2*.026)^2)) ~= .72,
            score .85.

    Per threshold t <= .70 (5 of the 10 thresholds): D1 TP, D3 TP, D2 FP.
      score-sorted: [.9 TP, .85 TP, .8 FP]; tp=[1,2,2], fp=[0,0,1],
      recall=[.5,1,1], precision=[1,1,2/3] -> envelope [1,1,2/3];
      101-pt interpolation: every recall grid point <= 1 maps to
      precision 1 -> AP_t = 1, recall_t = 1.
    Per threshold t >= .75 (the other 5): D3 unmatched -> FP.
      tp=[1,1,1], fp=[0,1,2], recall=[.5,.5,.5],
      precision=[1,.5,1/3] -> envelope [1,.5,1/3]; grid points r <= .5
      (51 of 101) map to precision 1, the rest past the last recall -> 0
      -> AP_t = 51/101, recall_t = .5.

    AP   = (5*1 + 5*51/101) / 10 = .5 + 25.5/101  ~= .752475
    AP50 = 1.0;  AP75 = 51/101 ~= .504950;  AR = (5*1 + 5*.5)/10 = .75
    Areas are all 2500 (inside [32^2, 96^2]) -> AP_medium = AP;
    no GT in the large range -> AP_large = -1 (undefined convention).
    """

    def _scenario(self):
        area = 2500.0
        rng = np.random.RandomState(0)
        pose_a = _random_kpts17(rng, 100, 200)
        gt_a = _gt_from_pose17(pose_a, area=area)
        d1 = {"keypoints": [float(v) for r in pose_a for v in r],
              "score": 0.9, "area": area}
        far = pose_a.copy()
        far[:, :2] += 5000
        d2 = {"keypoints": [float(v) for r in far for v in r],
              "score": 0.8, "area": area}

        # GT_B: only the nose (kpt 0, sigma .026) labeled
        pose_b = np.zeros((17, 3))
        pose_b[0] = (300.0, 300.0, 2)
        gt_b = {"keypoints": [float(v) for r in pose_b for v in r],
                "num_keypoints": 1, "area": area, "iscrowd": 0,
                "bbox": [290.0, 290.0, 20.0, 20.0]}
        target_oks = 0.72
        d = float(np.sqrt(-np.log(target_oks) * 2 * area * (2 * 0.026) ** 2))
        det_b = pose_b.copy()
        det_b[0, 0] += d
        d3 = {"keypoints": [float(v) for r in det_b for v in r],
              "score": 0.85, "area": area}
        return [([d1, d2], [gt_a]), ([d3], [gt_b])]

    def test_matches_hand_derived_numbers(self):
        images = self._scenario()
        ev = KeypointEvaluator()
        for dts, gts in images:
            ev.add_image(dts, gts)
        stats = ev.summarize()
        assert stats["AP"] == pytest.approx(0.5 + 25.5 / 101, abs=1e-9)
        assert stats["AP50"] == pytest.approx(1.0, abs=1e-9)
        assert stats["AP75"] == pytest.approx(51 / 101, abs=1e-9)
        assert stats["AR"] == pytest.approx(0.75, abs=1e-9)
        assert stats["AP_medium"] == pytest.approx(stats["AP"], abs=1e-9)
        assert stats["AP_large"] == -1.0

    def test_reference_transcription_agrees_on_fixture(self):
        from cocoeval_reference import evaluate_and_summarize

        stats = evaluate_and_summarize(self._scenario())
        assert stats["AP"] == pytest.approx(0.5 + 25.5 / 101, abs=1e-9)
        assert stats["AP75"] == pytest.approx(51 / 101, abs=1e-9)
        assert stats["AR"] == pytest.approx(0.75, abs=1e-9)
        assert stats["AP_large"] == -1.0


class TestEvaluatorVsIndependentTranscription:
    """Randomized cross-check: KeypointEvaluator vs a structurally
    different transcription of the official cocoeval (array-oriented
    T x R x A accumulation, ``tests/cocoeval_reference.py``) across
    scenarios with crowds, unlabeled GTs, area-range mixes, hallucinated
    detections, and score ties."""

    def _random_images(self, rng, n_images):
        images = []
        for img in range(n_images):
            gts, dts = [], []
            for _ in range(rng.randint(0, 4)):
                k = _random_kpts17(rng, 50, 400)
                # some GTs partially labeled, some unlabeled, some crowd
                drop = rng.rand(17) < rng.uniform(0, 0.7)
                k[drop] = 0
                area = float(rng.choice([500, 2500, 12000]))
                gt = {
                    "keypoints": [float(v) for r in k for v in r],
                    "num_keypoints": int((k[:, 2] > 0).sum()),
                    "area": area,
                    "iscrowd": int(rng.rand() < 0.2),
                    "bbox": [float(k[:, 0].min()), float(k[:, 1].min()),
                             float(max(np.ptp(k[:, 0]), 1.0)),
                             float(max(np.ptp(k[:, 1]), 1.0))],
                }
                gts.append(gt)
                if rng.rand() < 0.8:  # a detection near this GT
                    d = k.copy()
                    d[:, :2] += rng.normal(0, rng.uniform(0.5, 8), (17, 2))
                    d[:, 2] = 1
                    dts.append({
                        "keypoints": [float(v) for r in d for v in r],
                        # quantized scores force ties
                        "score": round(float(rng.uniform(0.1, 1.0)), 1),
                        "area": float(rng.choice([500, 2500, 12000])),
                    })
            for _ in range(rng.randint(0, 2)):  # hallucinations
                d = _random_kpts17(rng, 50, 400)
                dts.append({
                    "keypoints": [float(v) for r in d for v in r],
                    "score": round(float(rng.uniform(0.1, 1.0)), 1),
                    "area": float(rng.choice([500, 2500, 12000])),
                })
            images.append((dts, gts))
        return images

    @pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6])
    def test_agreement(self, seed):
        from cocoeval_reference import evaluate_and_summarize

        rng = np.random.RandomState(seed)
        images = self._random_images(rng, n_images=rng.randint(2, 6))
        ev = KeypointEvaluator()
        for dts, gts in images:
            ev.add_image([dict(d) for d in dts], [dict(g) for g in gts])
        got = ev.summarize()
        ref = evaluate_and_summarize(images)
        for key in ("AP", "AP50", "AP75", "AP_medium", "AP_large", "AR"):
            assert got[key] == pytest.approx(ref[key], abs=1e-9), \
                f"seed {seed} {key}: {got[key]} vs {ref[key]}"


class TestEmptyImageFPs:
    def test_detections_on_person_free_images_count_as_fps(self):
        """All-images eval: hallucinations on empty images lower AP."""
        rng = np.random.RandomState(12)
        ev_clean = KeypointEvaluator()
        ev_halluc = KeypointEvaluator()
        for _ in range(3):
            k = _random_kpts17(rng)
            gts = [_gt_from_pose17(k)]
            dt = {"keypoints": [float(v) for row in k for v in row],
                  "score": 0.8, "area": 3000.0}
            ev_clean.add_image([dt], gts)
            ev_halluc.add_image([dt], gts)
        # an empty image with a confident hallucination
        fp = {"keypoints": [float(v) for v in
                            _random_kpts17(rng).reshape(-1)],
              "score": 0.99, "area": 3000.0}
        ev_clean.add_image([], [])
        ev_halluc.add_image([fp], [])
        assert ev_halluc.summarize()["AP"] < ev_clean.summarize()["AP"]


class TestCameraFaceMode:
    def test_face_video_pipeline(self, tmp_path, monkeypatch):
        """Haar-cascade face mode runs end-to-end on a video file."""
        import tpupose.detectors as det_mod
        from tpupose.apps import camera
        from tpupose.detectors import FaceDetector

        if not hasattr(CV2, "CascadeClassifier"):
            pytest.skip("cv2 build lacks objdetect (CascadeClassifier)")

        video = str(tmp_path / "in.mp4")
        _write_video(video, 3, wh=(124, 92))

        stub = FaceDetector("facenet", cfg=FaceConfig(img_size=64))
        monkeypatch.setattr(det_mod, "FaceDetector",
                            lambda *a, **kw: stub)
        out = str(tmp_path / "out.mp4")
        camera.main(["face", "--video", video, "--headless",
                     "--save", out, "--max-frames", "3"])
        cap = CV2.VideoCapture(out)
        assert int(cap.get(CV2.CAP_PROP_FRAME_COUNT)) == 3
        cap.release()


    def test_face_video_pipeline_pose_source(self, tmp_path, monkeypatch):
        """--face-source pose: faces located via the pose network (no
        Haar objdetect needed)."""
        import tpupose.detectors as det_mod
        from tpupose.apps import camera
        from tpupose.detectors import FaceDetector

        video = str(tmp_path / "in.mp4")
        _write_video(video, 3, wh=(124, 92))

        face_stub = FaceDetector("facenet", cfg=FaceConfig(img_size=64))
        pose_stub = _stub_pose_detector()
        monkeypatch.setattr(det_mod, "FaceDetector",
                            lambda *a, **kw: face_stub)
        monkeypatch.setattr(det_mod, "PoseDetector",
                            lambda *a, **kw: pose_stub)
        out = str(tmp_path / "out.mp4")
        camera.main(["face", "--video", video, "--headless",
                     "--save", out, "--max-frames", "3",
                     "--face-source", "pose"])
        cap = CV2.VideoCapture(out)
        assert int(cap.get(CV2.CAP_PROP_FRAME_COUNT)) == 3
        cap.release()

    def test_submit_collect_matches_detect_crops(self):
        from tpupose.detectors import HandDetector
        from tpupose.config import HandConfig

        det = HandDetector("handnet", cfg=HandConfig(img_size=64))
        rng = np.random.RandomState(21)
        crops = [rng.randint(0, 255, (40 + 3 * i, 46, 3), dtype=np.uint8)
                 for i in range(3)]
        types = ["left", "right", "left"]
        serial = det.detect_batch(crops, types)
        flips = [t == "left" for t in types]
        pipelined = det.collect_crops(det.submit_crops(crops, flips))
        assert serial == pipelined
        assert det.submit_crops([]) == []
        assert det.collect_crops([]) == []

    def test_face_mode_overlaps_submit_with_collect(self, tmp_path,
                                                    monkeypatch):
        """Pipelining invariant: frame N's crops are DISPATCHED before
        frame N-1's results are collected (the reference face loop is
        strictly serial)."""
        import tpupose.detectors as det_mod
        from tpupose.apps import camera
        from tpupose.detectors import FaceDetector

        video = str(tmp_path / "in.mp4")
        _write_video(video, 3, wh=(124, 92))

        face_stub = FaceDetector("facenet", cfg=FaceConfig(img_size=64))
        pose_stub = _stub_pose_detector()
        events = []
        real_submit = face_stub.submit_crops
        real_collect = face_stub.collect_crops

        def submit(crops, flips=None):
            events.append("S")
            return real_submit(crops, flips)

        def collect(pending):
            events.append("C")
            return real_collect(pending)

        monkeypatch.setattr(face_stub, "submit_crops", submit)
        monkeypatch.setattr(face_stub, "collect_crops", collect)
        monkeypatch.setattr(det_mod, "FaceDetector",
                            lambda *a, **kw: face_stub)
        monkeypatch.setattr(det_mod, "PoseDetector",
                            lambda *a, **kw: pose_stub)
        out = str(tmp_path / "out.mp4")
        camera.main(["face", "--video", video, "--headless",
                     "--save", out, "--max-frames", "3",
                     "--face-source", "pose"])
        # 3 frames: S0 S1 C0 S2 C1 C2 — two submits before the first
        # collect, equal counts overall
        assert events[:2] == ["S", "S"]
        assert events.count("S") == 3 and events.count("C") == 3
        cap = CV2.VideoCapture(out)
        assert int(cap.get(CV2.CAP_PROP_FRAME_COUNT)) == 3
        cap.release()
