"""Probe: precise-mode cross-scale map layout — does emitting the
postprocess-native layouts from the scale tails beat the shipped
channel-last tails + transpose-inside-avg?

Shipped (A): scale tails emit (H, W, 38)+(H, W, 19) channel-last; the
avg program sums 4 of each, transposes to channel-first, reshapes the
PAF to (L, HW, 2) sample rows, then runs peaks/PAF/grouping.  The trace
attributes ~2.2 ms of the 5.55 ms postprocess to these re-arrangement
fusions at 584² (BENCH_DETAILS.json:postprocess.op_breakdown_ms).

Candidate (B): tails emit (19, H, W) heatmaps + (19, HW, 2) PAF rows
directly (the transposes ride the tail's final resize einsums, which
already re-materialize the maps); the avg program is sum + postprocess
with ZERO layout ops.  Numerically identical (transposes are exact).

Measures both variants' per-scale and avg+postprocess programs on the
real detector at person.png geometry via the xplane trace, and checks
end-to-end pose equality.

Usage: python scripts/postproc_probe.py [--trace-dir /tmp/pp_trace]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/pp_trace")
    ap.add_argument("--calls", type=int, default=4)
    args = ap.parse_args()

    import cv2

    from bench import parse_trace_module_times
    from tpupose.detectors import PoseDetector
    from tpupose.ops.postprocess import postprocess_pose_from_rows
    from tpupose.utils.calibrate import calibrate_output_convs
    from tpupose.utils.profiling import trace

    img = cv2.imread("/root/reference/data/person.png")
    det = PoseDetector("posenet", precise=True)
    calibrate_output_convs(det, img)
    orig_h, orig_w = img.shape[:2]
    post_hw = det._postprocess_hw(orig_h, orig_w)
    n = len(det.cfg.scales)
    cfg = det.cfg

    # --- variant A: the shipped programs -------------------------------
    geoms = det._pyramid_geometries(orig_h, orig_w)
    a_scale_fns = [det._device_scale_fn(post_hw, s, p)
                   for (_, s, p) in geoms]
    a_avg_fn = det._avg_postprocess_fn(post_hw, n)

    # --- variant B: rows-layout tails + layout-free avg ----------------
    def make_scale_b(scaled_hw, padded_hw):
        def fn(variables, orig_u8):
            paf, hm = det._pyramid_scale_maps_traced(
                variables, orig_u8[None], scaled_hw, padded_hw, post_hw)
            hm_cf = jnp.transpose(hm[0], (2, 0, 1))            # (19, H, W)
            rows = jnp.transpose(
                paf[0].reshape(post_hw[0] * post_hw[1], 19, 2),
                (1, 0, 2))                                     # (19, HW, 2)
            return rows, hm_cf

        fn.__name__ = f"poseB_scale_{scaled_hw[0]}x{scaled_hw[1]}"
        return jax.jit(fn)

    b_scale_fns = [make_scale_b(s, p) for (_, s, p) in geoms]

    def avg_b(rows_list, hm_list):
        rows = sum(rows_list) / n
        hm = sum(hm_list) / n
        return postprocess_pose_from_rows(
            rows, hm, post_hw, jnp.float32(post_hw[1]), cfg)

    avg_b.__name__ = f"poseB_avg_postprocess_{post_hw[0]}x{post_hw[1]}"
    b_avg_fn = jax.jit(avg_b)

    # --- warm up + end-to-end equality ---------------------------------
    dev_img = jnp.asarray(img)
    a_maps = [fn(det.variables, dev_img) for fn in a_scale_fns]
    a_res = a_avg_fn([m[0] for m in a_maps], [m[1] for m in a_maps])
    b_maps = [fn(det.variables, dev_img) for fn in b_scale_fns]
    b_res = b_avg_fn([m[0] for m in b_maps], [m[1] for m in b_maps])
    a_host = jax.device_get(a_res)
    b_host = jax.device_get(b_res)
    for fa, fb, name in zip(a_host, b_host, a_host._fields):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   atol=0, rtol=0, err_msg=name)
    print("A == B end to end: EXACT", file=sys.stderr)

    # --- trace ----------------------------------------------------------
    rng = np.random.RandomState(1)
    frames = [jnp.asarray(np.clip(
        img.astype(np.int16) + rng.randint(-3, 4, img.shape),
        0, 255).astype(np.uint8)) for _ in range(args.calls)]
    with trace(args.trace_dir):
        for f in frames:
            am = [fn(det.variables, f) for fn in a_scale_fns]
            jax.device_get(a_avg_fn([m[0] for m in am],
                                    [m[1] for m in am]))
            bm = [fn(det.variables, f) for fn in b_scale_fns]
            jax.device_get(b_avg_fn([m[0] for m in bm],
                                    [m[1] for m in bm]))

    times = parse_trace_module_times(args.trace_dir)
    out = {k: v["mean_ms"] for k, v in times.items()
           if "pose" in k}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
