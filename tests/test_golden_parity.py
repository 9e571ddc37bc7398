"""End-to-end parity harness on the reference's real images.

Runs the FULL device pipeline (uint8 frame -> CNN forward -> map resize ->
on-device peaks/PAF/grouping -> pose tables) on
``/root/reference/data/{person,people,dinner}.png`` against the complete
NumPy-oracle pipeline (``oracles.oracle_full_pipeline``) fed the exact maps
the device postprocess consumed (``PoseDetector.compute_maps`` shares the
traced map code with the detection programs) — closing the integration gap
left by the synthetic-scene unit tests (BASELINE.md target 1; golden images
``/root/reference/README.md:72-119``).

No pretrained weights exist on this box, and a randomly initialized CNN
emits ~1e-3-amplitude maps (no peaks).  The harness therefore uses
DETERMINISTIC calibrated weights: random init (seed 42) with the final
stage-6 output convs scaled per channel so each joint's blurred heatmap has
a handful of above-threshold peaks and PAF channels have unit amplitude —
the network still computes every real conv, and the postprocess sees
realistic irregular maps.

When real weights appear, ``scripts/make_goldens.py`` records golden pose
tables and ``test_recorded_goldens`` (auto-skipped today) compares against
them — dropping in ``coco_posenet.npz`` is the only change needed.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from oracles import oracle_full_pipeline  # noqa: E402

from tpupose.config import InferenceConfig  # noqa: E402

CV2 = pytest.importorskip("cv2")

REF_DATA = "/root/reference/data"
IMAGES = ["person", "people", "dinner"]

# Relaxed subset filter so chance chains in the random PAF field yield
# nonempty pose tables (applied identically on both sides); capacity
# raised so spawned subsets stay below the static table size.
HARNESS_CFG = InferenceConfig(max_subsets=128, n_subset_limbs_thresh=2,
                              subset_score_thresh=0.05)

GOLDEN_WEIGHTS = os.environ.get(
    "TPUPOSE_POSENET_NPZ",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "weights", "coco_posenet.npz"))
GOLDEN_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "goldens", "reference_goldens.json")


def _load(name):
    img = CV2.imread(os.path.join(REF_DATA, f"{name}.png"))
    if img is None:
        pytest.skip(f"reference image {name}.png unavailable")
    return img


from tpupose.utils.calibrate import calibrate_output_convs as _calibrate  # noqa: E402


def _assert_pose_tables_match(got_poses, got_scores, ref_poses, ref_scores,
                              atol=5e-3):
    """Order-insensitive multiset match of (pose, score) rows.

    Tolerance covers float64 (oracle) vs float32 (device) accumulation in
    the grouping score sums and the coordinate rescale products."""
    assert len(got_poses) == len(ref_poses), (
        f"{len(got_poses)} device poses vs {len(ref_poses)} oracle")
    remaining = list(range(len(ref_poses)))
    for gp, gs in zip(got_poses, got_scores):
        match = None
        for i in remaining:
            if (np.abs(ref_poses[i] - gp).max() <= atol
                    and abs(ref_scores[i] - gs) <= atol):
                match = i
                break
        assert match is not None, f"unmatched device pose (score {gs})"
        remaining.remove(match)


def _run_parity(det, img):
    maps, (sx, sy) = det.compute_maps(img)
    paf = np.asarray(maps[0])
    hm = np.asarray(maps[1])
    ref_poses, ref_scores, peaks = oracle_full_pipeline(
        paf, hm, det.cfg, scale_x=sx, scale_y=sy)
    got_poses, got_scores = det(img)

    # Non-vacuity: the calibrated weights must actually exercise the
    # pipeline (peaks found, subsets formed) or the parity proves nothing.
    assert sum(len(p) for p in peaks) > 20
    assert len(ref_poses) >= 1
    _assert_pose_tables_match(got_poses, got_scores, ref_poses, ref_scores)


@pytest.fixture(scope="module")
def fast_detector():
    from tpupose.detectors import PoseDetector

    # One instance for all images: person and people share the 368x368
    # input geometry, so the compiled programs are reused.
    return PoseDetector("posenet", cfg=HARNESS_CFG)


@pytest.mark.parametrize("name", IMAGES)
def test_fast_pipeline_matches_oracle_on_reference_image(
        fast_detector, name):
    img = _load(name)
    _calibrate(fast_detector, img)
    _run_parity(fast_detector, img)


@pytest.fixture(scope="module")
def conv_nms_detector():
    from dataclasses import replace

    from tpupose.detectors import PoseDetector

    return PoseDetector("posenet", cfg=replace(HARNESS_CFG, nms_mode="conv"))


@pytest.mark.parametrize("name", IMAGES)
def test_fast_pipeline_conv_nms_matches_oracle(conv_nms_detector, name):
    """The GPU-path NMS variant (nms_mode='conv': 17x17 zero-pad
    unnormalized-Gaussian conv, >= rule) through the FULL device pipeline
    on every reference image vs the oracle running the same semantics
    (oracle_full_pipeline switches peak oracles on cfg.nms_mode).  One
    module-scoped detector: square images share input geometry, so
    compiled programs are reused where shapes allow."""
    img = _load(name)
    _calibrate(conv_nms_detector, img)
    _run_parity(conv_nms_detector, img)


def test_precise_pipeline_matches_oracle_on_person():
    """Full multi-scale path: device 4-scale pyramid + cross-scale
    averaging + orig-resolution postprocess vs the oracle fed the averaged
    maps.  img_size reduced (the pipeline structure is identical; full-res
    precise compiles cost minutes on this box's single CPU core)."""
    from dataclasses import replace

    from tpupose.detectors import PoseDetector

    cfg = replace(HARNESS_CFG, img_size=184)
    det = PoseDetector("posenet", precise=True, cfg=cfg)
    img = _load("person")
    _calibrate(det, img)
    _run_parity(det, img)


@pytest.mark.skipif(
    not os.environ.get("TPUPOSE_SLOW_PARITY"),
    reason="full-size precise parity: ~4 full-scale compiles, minutes on "
           "this box's single CPU core — set TPUPOSE_SLOW_PARITY=1 to run "
           "(fast on the TPU box)")
@pytest.mark.parametrize("name", IMAGES)
def test_precise_pipeline_full_size_matches_oracle(name):
    """Reference-config (img_size=368) 4-scale precise pipeline end to end
    on every reference image (VERDICT r2 weak #7: the full-size precise
    path was exercised only at reduced geometry).

    max_peaks_per_joint is raised: the calibrated-random net emits up to
    ~52 peaks for one joint at full postprocess resolution on dinner.png,
    and the oracle refuses to compare past the static capacity (real
    weights are far sparser; capacity is a config knob, ``config.py``)."""
    from dataclasses import replace

    from tpupose.detectors import PoseDetector

    det = PoseDetector("posenet", precise=True,
                       cfg=replace(HARNESS_CFG, max_peaks_per_joint=64))
    img = _load(name)
    _calibrate(det, img)
    _run_parity(det, img)


@pytest.mark.skipif(
    not (os.path.exists(GOLDEN_WEIGHTS) and os.path.exists(GOLDEN_FILE)),
    reason="pretrained weights / recorded goldens not present "
           "(see scripts/make_goldens.py)")
@pytest.mark.parametrize("name", IMAGES)
def test_recorded_goldens(name):
    """Bit-parity keypoints against recorded goldens from the real
    ``coco_posenet.npz`` (BASELINE target 1).  Activates automatically
    once ``weights/coco_posenet.npz`` and the goldens file exist."""
    from tpupose.detectors import PoseDetector

    goldens = json.load(open(GOLDEN_FILE))
    entry = goldens[name]
    det = PoseDetector("posenet", weights_file=GOLDEN_WEIGHTS,
                       precise=entry.get("precise", False))
    poses, scores = det(_load(name))
    ref_poses = np.asarray(entry["poses"], np.float64)
    ref_scores = np.asarray(entry["scores"], np.float64)
    _assert_pose_tables_match(poses, scores, ref_poses, ref_scores)
