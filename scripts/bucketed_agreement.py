"""Bucketed-vs-exact pose agreement on the reference's real images —
pins the numerics of the geometry-bucketed eval path BEFORE COCO data
exists (VERDICT r4 #6), so real-AP numbers computed through
``apps/evaluate.py --bucketed`` are attributable the day they are run.

Runs the FULL pipeline twice per image with identical deterministic
calibrated weights (``utils/calibrate.py``): once through the exact
per-size path (golden-parity semantics) and once through
``BucketedPoseDetector`` (the fixed canvas palette every val2017 image
would ride).  Reports detection counts, matched-joint pixel deltas at
original resolution, and threshold fractions.  Expected sources of
drift: the extra aspect-preserving resize (cv2 linear + uint8
quantization) and the pad_value border band replacing the true image
edge — both documented in ``detectors/bucketed.py``.

Record the output in BASELINE.md (round 5 "bucketed eval numerics").

Usage::

    python scripts/bucketed_agreement.py [--mode fast|precise|both]
        [--canvas-long 640]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quant_agreement import IMAGES, REF_DATA, match_poses  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["fast", "precise", "both"])
    ap.add_argument("--canvas-long", type=int, default=640)
    args = ap.parse_args(argv)

    import cv2

    from tpupose.detectors import (BucketedPoseDetector, PoseDetector,
                                   best_canvas, canvas_palette)
    from tpupose.utils.calibrate import calibrate_output_convs

    pal = canvas_palette(args.canvas_long)
    modes = ["fast", "precise"] if args.mode == "both" else [args.mode]
    report = {"canvases": [list(c) for c in pal]}
    for mode in modes:
        precise = mode == "precise"
        det = PoseDetector("posenet", precise=precise)
        bucketed = BucketedPoseDetector(det, canvases=pal)
        calibrated = False
        for name in IMAGES:
            img = cv2.imread(os.path.join(REF_DATA, f"{name}.png"))
            if img is None:
                print(f"skip {name}: image unavailable", file=sys.stderr)
                continue
            if not calibrated:
                calibrate_output_convs(det, img)
                calibrated = True
            h, w = img.shape[:2]
            c_h, c_w = best_canvas(h, w, pal)
            s = min(c_h / h, c_w / w)

            poses_e, scores_e = det(img)          # exact per-size path
            poses_b, scores_b = bucketed(img)     # canvas path
            jd, sd, n_match = match_poses(poses_e, scores_e,
                                          poses_b, scores_b)
            jd = np.asarray(jd) if len(jd) else np.zeros(0)
            row = {
                "image_hw": [h, w],
                "canvas_hw": [c_h, c_w],
                "scale": round(s, 4),
                "n_exact": len(poses_e),
                "n_bucketed": len(poses_b),
                "n_matched": n_match,
                "joints_compared": int(jd.size),
                "frac_within_2px": float((jd <= 2).mean()) if jd.size else None,
                "frac_within_5px": float((jd <= 5).mean()) if jd.size else None,
                "max_joint_shift_px": float(jd.max()) if jd.size else None,
                "mean_joint_shift_px": float(jd.mean()) if jd.size else None,
                "mean_score_delta": float(np.mean(sd)) if sd else None,
            }
            report[f"{mode}/{name}"] = row
            print(f"{mode}/{name}: {row}", file=sys.stderr)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
