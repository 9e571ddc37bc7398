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

# ---------------------------------------------------------------------------
# --synthetic: content-covariant geometric-drift measurement.
#
# The real-image table above runs CALIBRATED RANDOM weights, whose peak
# landscape is near-threshold noise — any input perturbation (the canvas
# placement resize, the pad band) flips which noise peaks cross the 0.05
# threshold, so its deltas measure weight randomness as much as geometry.
# The synthetic mode paints ONE person's 18 joints as coded marker disks
# into the frame and stubs the network with a model that (inside the
# jitted program) decodes the marker centroids from the input itself and
# renders reference-semantics GT heatmaps/PAFs at the stride-8 grid
# (tpupose/data/gt.py).  The maps follow the image content wherever the
# frame lands — the full exact frame, or scaled top-left on a bucketed
# canvas — so exact-vs-bucketed deltas isolate EXACTLY the geometry
# chain the wrapper adds: cv2 placement resize + pad band + emit-side
# rescale/clamp, through the real full-size postprocess programs.
# ---------------------------------------------------------------------------

# 18-joint skeleton in unit coordinates (x, y), JointType order
_CANON = np.array([
    [0.50, 0.12], [0.50, 0.24],                  # nose, neck
    [0.38, 0.24], [0.33, 0.40], [0.30, 0.55],    # R shoulder/elbow/hand
    [0.62, 0.24], [0.67, 0.40], [0.70, 0.55],    # L shoulder/elbow/hand
    [0.42, 0.55], [0.41, 0.74], [0.40, 0.92],    # R waist/knee/foot
    [0.58, 0.55], [0.59, 0.74], [0.60, 0.92],    # L waist/knee/foot
    [0.46, 0.09], [0.54, 0.09],                  # R/L eye
    [0.42, 0.12], [0.58, 0.12],                  # R/L ear
], np.float32)

_CODES = np.arange(18, dtype=np.float32) * 13.0 + 20.0


def paint_marker_person(h: int, w: int):
    """One synthetic frame: 18 joints painted as coded disks.
    ch0 = marker flag (255), ch1 = per-joint code, ch2 = filler.
    Returns (img_u8, gt_xy[18, 2] in original pixels)."""
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 2] = 128
    gt = np.empty((18, 2), np.float32)
    r = max(6, int(round(0.015 * min(h, w))))
    ys, xs = np.mgrid[0:h, 0:w]
    for j, (ux, uy) in enumerate(_CANON):
        cx = (0.12 + 0.76 * ux) * (w - 1)
        cy = (0.06 + 0.88 * uy) * (h - 1)
        gt[j] = (cx, cy)
        m = (xs - cx) ** 2 + (ys - cy) ** 2 <= r * r
        img[m, 0] = 255
        img[m, 1] = int(_CODES[j])
    return img, gt


class _MarkerStub:
    """Content-covariant CocoPoseNet stand-in (see module section note).
    ``apply`` is pure and fixed-shape, so the detector jits it like the
    real net; disk interiors survive linear resize down to the precise
    pyramid's 0.5x scale (flag > 200 needs only a saturated 2x2 core)."""

    def apply(self, variables, x):
        import jax
        import jax.numpy as jnp

        from tpupose.data.gt import render_heatmaps, render_pafs

        hh, ww = x.shape[1], x.shape[2]
        u8 = (x + 0.5) * 255.0
        flag = (u8[..., 0] > 200.0).astype(jnp.float32)
        code = u8[..., 1]
        sim = jnp.maximum(0.0, 1.0 - jnp.abs(
            code[..., None] - jnp.asarray(_CODES)) / 6.0)
        m = sim * flag[..., None]                        # (B, H, W, 18)
        tot = m.sum(axis=(1, 2)) + 1e-6                  # (B, 18)
        gx = jnp.arange(ww, dtype=jnp.float32)
        gy = jnp.arange(hh, dtype=jnp.float32)
        cx = (m * gx[None, None, :, None]).sum(axis=(1, 2)) / tot
        cy = (m * gy[None, :, None, None]).sum(axis=(1, 2)) / tot
        poses = jnp.stack(
            [cx / 8.0, cy / 8.0, jnp.ones_like(cx)], axis=-1)  # (B,18,3)

        def one(p):
            hm = render_heatmaps(p[None], hh // 8, ww // 8, sigma=2.0)
            paf = render_pafs(p[None], hh // 8, ww // 8, paf_width=1.0)
            return (jnp.transpose(paf, (1, 2, 0)),
                    jnp.transpose(hm, (1, 2, 0)))

        pafs, hms = jax.vmap(one)(poses)     # (B, h, w, 38 / 19)

        def stack(a):
            return jnp.broadcast_to(a[None], (6,) + a.shape)

        return stack(pafs), stack(hms)


# COCO-typical geometry sweep (val2017's most common shapes + squares +
# portrait/landscape odd sizes that do NOT match any canvas exactly)
_SYNTH_GEOMS_FAST = [(480, 640), (426, 640), (640, 426), (375, 500),
                     (500, 375), (612, 612), (480, 480), (427, 640),
                     (334, 500), (640, 640)]
_SYNTH_GEOMS_PRECISE = [(480, 640), (426, 640), (612, 612)]


def synthetic_main(args):
    from tpupose.detectors import (BucketedPoseDetector, PoseDetector,
                                   best_canvas, canvas_palette)

    pal = canvas_palette(args.canvas_long)
    modes = ["fast", "precise"] if args.mode == "both" else [args.mode]
    report = {"canvases": [list(c) for c in pal]}
    for mode in modes:
        precise = mode == "precise"
        det = PoseDetector("posenet", params={"params": {}},
                           precise=precise)
        det.model = _MarkerStub()
        bucketed = BucketedPoseDetector(det, canvases=pal)
        geoms = (_SYNTH_GEOMS_PRECISE if precise else _SYNTH_GEOMS_FAST)
        for h, w in geoms:
            img, gt = paint_marker_person(h, w)
            poses_e, scores_e = det(img)
            poses_b, scores_b = bucketed(img)
            c_h, c_w = best_canvas(h, w, pal)
            row = {"canvas_hw": [c_h, c_w],
                   "scale": round(min(c_h / h, c_w / w), 4),
                   "n_exact": len(poses_e), "n_bucketed": len(poses_b)}
            if len(poses_e) == 1 and len(poses_b) == 1:
                d_eb = np.linalg.norm(
                    poses_e[0][:, :2] - poses_b[0][:, :2], axis=1)
                d_eg = np.linalg.norm(poses_e[0][:, :2] - gt, axis=1)
                d_bg = np.linalg.norm(poses_b[0][:, :2] - gt, axis=1)
                row.update({
                    "joints": int(d_eb.size),
                    "exact_vs_bucketed_mean_px": round(float(d_eb.mean()), 3),
                    "exact_vs_bucketed_max_px": round(float(d_eb.max()), 3),
                    "frac_within_2px": round(float((d_eb <= 2).mean()), 3),
                    "frac_within_5px": round(float((d_eb <= 5).mean()), 3),
                    "exact_vs_gt_mean_px": round(float(d_eg.mean()), 3),
                    "bucketed_vs_gt_mean_px": round(float(d_bg.mean()), 3),
                    "score_delta": round(
                        abs(float(scores_e[0]) - float(scores_b[0])), 4),
                })
            key = f"{mode}/{h}x{w}"
            report[key] = row
            print(f"{key}: {row}", file=sys.stderr)
        cache = det._fast_fns if not precise else det._scale_fns
        report[f"{mode}/programs_compiled"] = len(cache)
    print(json.dumps(report, indent=1))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["fast", "precise", "both"])
    ap.add_argument("--canvas-long", type=int, default=640)
    ap.add_argument("--synthetic", action="store_true",
                    help="marker-stub geometric-drift sweep instead of "
                         "the random-weight real-image table (see the "
                         "module section note)")
    args = ap.parse_args(argv)

    if args.synthetic:
        synthetic_main(args)
        return

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
