"""Trace a quantized precise SERVING BUNDLE end-to-end on the TPU.

The live quantized detector routes small-grid 7x7 convs through the
Mosaic conv7 kernel (1.09 ms for the 184px scale, BASELINE.md round 5);
``jax.export`` bundles instead embed the bit-identical pure-XLA im2col
twin via ``portable_programs``.  This probe attributes the BUNDLE's
per-program device times with the same xplane instrument as ``bench.py
--trace`` — so the production serving path's cost is measured, not
inferred from the live twin.

Flow: calibrate + quantize a live precise detector (defaults), export a
single-geometry bundle (TPU platform only — halves lowering time), load
it with ``ServingPoseDetector``, run a few frames under the profiler,
and print per-program device means + the one-stream chain total.

Usage: python scripts/bundle_trace.py [--trace-dir DIR] [--out BUNDLE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/bundle_trace")
    ap.add_argument("--out", default="/tmp/qbundle_trace")
    ap.add_argument("--frames", type=int, default=4)
    args = ap.parse_args()

    import dataclasses

    import jax

    from bench import distinct_frames, load_test_image, \
        parse_trace_module_times
    from tpupose.config import INFERENCE
    from tpupose.detectors import PoseDetector
    from tpupose.serving import ServingPoseDetector, save_bundle
    from tpupose.utils.calibrate import calibrate_output_convs
    from tpupose.utils.profiling import annotate, trace

    img = load_test_image()
    print(f"image {img.shape}, backend {jax.default_backend()}",
          file=sys.stderr)

    cfg = dataclasses.replace(INFERENCE, fuse_small_scales=False)
    det = PoseDetector("posenet", cfg=cfg, precise=True)
    calibrate_output_convs(det, img)
    det.quantize(distinct_frames(img, 2))  # defaults: pallas live,
    #                                        min_side 0 on TPU
    print(f"quantized: min_side={det._quant_min_side}", file=sys.stderr)

    save_bundle(det, args.out, [img.shape[:2]], platforms=("tpu",))
    srv = ServingPoseDetector(args.out)
    for _ in range(2):  # compile + settle
        srv(img)

    with trace(args.trace_dir):
        for i, frame in enumerate(distinct_frames(img, args.frames)):
            with annotate(f"bundle_frame_{i}"):
                srv(frame)

    # Exported programs all lower under the generic module name
    # ``call_exported`` — the combined trace yields ONE aggregated row
    # (mean over scale+avg executions).  Per-program attribution:
    # isolate each program in its OWN trace window (no recompiles —
    # programs are loaded once) and read its row there.
    h, w = img.shape[:2]
    scale_programs, avg_program, post_hw = srv._by_size[(h, w)]
    img_dev = np.asarray(img)
    per_program = {}
    maps = None
    for k, p in enumerate(scale_programs):
        d = f"{args.trace_dir}_s{k}"
        outs = None
        with trace(d):
            for _ in range(args.frames):
                outs = p.call(srv.variables, img_dev)
                np.asarray(outs[0])  # real sync through the tunnel
        row = parse_trace_module_times(d).get("jit_call_exported")
        per_program[f"scale{k}"] = row["mean_ms"] if row else None
    maps = [p.call(srv.variables, img_dev) for p in scale_programs]
    d = f"{args.trace_dir}_avg"
    with trace(d):
        for _ in range(args.frames):
            res = avg_program.call([m[0] for m in maps],
                                   [m[1] for m in maps])
            np.asarray(res[0])
    row = parse_trace_module_times(d).get("jit_call_exported")
    per_program["avg_postprocess"] = row["mean_ms"] if row else None

    agg = parse_trace_module_times(args.trace_dir).get("jit_call_exported")
    vals = [v for v in per_program.values() if v]
    report = {
        "per_program_ms": per_program,
        "chain_total_ms": round(sum(vals), 3) if vals else None,
        "combined_row": agg,
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
