"""Keypoint-level agreement of the quantized (w8a8) pipeline vs f32 on
the reference's real images — the strongest quant-accuracy evidence this
box allows.

The synthetic fidelity tests (``tests/test_quant.py``) bound map-level
RMS on tiny random scenes; this probe runs the FULL serving pipeline
(fast single-scale AND mixed-precision multi-scale precise, the exact
programs ``--quant`` ships) on ``/root/reference/data/*.png`` with the
deterministic calibrated weights the parity harness uses
(``utils/calibrate.py`` — random nets are the WORST case for
quantization: dense noise activations, many near-threshold peaks), and
reports how the final pose tables differ:

- per-image detection counts (f32 vs quant),
- fraction of matched joints within 2px / 5px at original resolution,
- max joint shift and mean |score delta| over matched poses.

Real-AP deltas need released weights + COCO data (external gate,
BASELINE targets 1-2); record this probe's output in BASELINE.md.

Usage::

    python scripts/quant_agreement.py [--mode fast|precise|both]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DATA = "/root/reference/data"
IMAGES = ("person", "people", "dinner")


def match_poses(poses_f, scores_f, poses_q, scores_q):
    """Greedy nearest-pose matching on mean visible-joint distance.

    Returns per-matched-pose joint deltas (px, at original image
    resolution) and score deltas; unmatched pose counts on either side.
    A joint pairs only when visible (conf > 0) on BOTH sides."""
    used = set()
    joint_deltas, score_deltas = [], []
    for pf, sf in zip(poses_f, scores_f):
        best, best_d = None, np.inf
        for i, pq in enumerate(poses_q):
            if i in used:
                continue
            vis = (pf[:, 2] > 0) & (np.asarray(pq)[:, 2] > 0)
            if not vis.any():
                continue
            d = np.linalg.norm(pf[vis, :2] - np.asarray(pq)[vis, :2],
                               axis=1).mean()
            if d < best_d:
                best, best_d = i, d
        if best is None:
            continue
        used.add(best)
        pq = np.asarray(poses_q[best])
        vis = (pf[:, 2] > 0) & (pq[:, 2] > 0)
        joint_deltas.extend(
            np.linalg.norm(pf[vis, :2] - pq[vis, :2], axis=1).tolist())
        score_deltas.append(abs(float(sf) - float(scores_q[best])))
    return joint_deltas, score_deltas, len(used)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["fast", "precise", "both"])
    args = ap.parse_args(argv)

    import cv2
    import jax

    from tpupose.detectors import PoseDetector
    from tpupose.utils.calibrate import calibrate_output_convs

    modes = ["fast", "precise"] if args.mode == "both" else [args.mode]
    report = {}
    for mode in modes:
        precise = mode == "precise"
        for name in IMAGES:
            img = cv2.imread(os.path.join(REF_DATA, f"{name}.png"))
            if img is None:
                print(f"skip {name}: image unavailable", file=sys.stderr)
                continue
            det_f = PoseDetector("posenet", precise=precise)
            calibrate_output_convs(det_f, img)
            host = jax.device_get(det_f.variables)
            det_q = PoseDetector("posenet", precise=precise, params=host)
            # serving-representative calibration: the frame + its mirror
            det_q.quantize([img, img[:, ::-1]])

            poses_f, scores_f = det_f(img)
            poses_q, scores_q = det_q(img)
            jd, sd, n_match = match_poses(poses_f, scores_f,
                                          poses_q, scores_q)
            jd = np.asarray(jd) if len(jd) else np.zeros(0)
            report[f"{mode}/{name}"] = {
                "n_f32": len(poses_f),
                "n_quant": len(poses_q),
                "n_matched": n_match,
                "joints_compared": int(jd.size),
                "frac_within_2px": float((jd <= 2).mean()) if jd.size else None,
                "frac_within_5px": float((jd <= 5).mean()) if jd.size else None,
                "max_joint_shift_px": float(jd.max()) if jd.size else None,
                "mean_score_delta": float(np.mean(sd)) if sd else None,
            }
            print(f"{mode}/{name}: {report[f'{mode}/{name}']}",
                  file=sys.stderr)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
