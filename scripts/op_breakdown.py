"""Per-XLA-op device-time breakdown of tpupose programs from an xplane
trace — the drill-down companion to ``bench.parse_trace_module_times``.

Aggregates the "XLA Ops" thread durations by op name (fusion names keep
their leading op kind) and prints the top ops per traced module, so a
module-level regression (e.g. the quantized 184² scale program) can be
attributed to conv kinds, convert/relayout ops, or epilogue fusions.

Usage::

    python scripts/op_breakdown.py --run '<python building+calling fns>'
    python scripts/op_breakdown.py --trace-dir /tmp/opbd   # parse existing
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace_ops(logdir: str, top: int = 15):
    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        return {}
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    ev = t.get("traceEvents", [])
    dev_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))}
    mod_tids = {
        (e["pid"], e["tid"]) for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e.get("args", {}).get("name") == "XLA Modules"
        and e["pid"] in dev_pids}
    op_tids = {
        (e["pid"], e["tid"]) for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e.get("args", {}).get("name") == "XLA Ops"
        and e["pid"] in dev_pids}
    modules = [e for e in ev if e.get("ph") == "X"
               and (e.get("pid"), e.get("tid")) in mod_tids]
    ops = [e for e in ev if e.get("ph") == "X"
           and (e.get("pid"), e.get("tid")) in op_tids]

    def op_key(name: str) -> str:
        # group by the leading op kind, e.g. "fusion", "convolution",
        # "convert"; fusions keep their number-stripped stem
        base = name.split("(")[0]
        stem = base.rstrip("0123456789._")
        return stem or base

    out = {}
    for m in modules:
        mname = m["name"].split("(")[0]
        lo, hi = m["ts"], m["ts"] + m["dur"]
        agg = collections.defaultdict(float)
        for e in ops:
            if lo <= e["ts"] < hi:
                agg[op_key(e["name"])] += e["dur"] / 1e3
        rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
        entry = out.setdefault(mname, collections.defaultdict(float))
        entry["_calls"] = entry.get("_calls", 0) + 1
        entry["_total_ms"] = entry.get("_total_ms", 0) + m["dur"] / 1e3
        for k, v in rows:
            entry[k] += v
    # per-call means
    return {
        m: {k: round(v / d["_calls"], 3) for k, v in d.items()
            if k != "_calls"}
        for m, d in out.items()
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/opbd")
    ap.add_argument("--scales", default="736x736,184x184",
                    help="pyramid scale programs to trace (f32 + quant)")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--calls", type=int, default=3)
    args = ap.parse_args()

    if not args.parse_only:
        import cv2
        import numpy as np

        import jax.numpy as jnp

        from tpupose.detectors import PoseDetector
        from tpupose.utils.calibrate import calibrate_output_convs
        from tpupose.utils.profiling import trace

        img = cv2.imread("/root/reference/data/person.png")
        want = {tuple(int(v) for v in s.split("x"))
                for s in args.scales.split(",")}
        dets = []
        for quant in (False, True):
            det = PoseDetector("posenet", precise=True)
            calibrate_output_convs(det, img)
            if quant:
                det.quantize([img, img[:, ::-1]])
            dets.append(det)
        h, w = img.shape[:2]
        post_hw = dets[0]._postprocess_hw(h, w)
        dev = jnp.asarray(img)
        fns = []
        for det in dets:
            for _, scaled, padded in det._pyramid_geometries(h, w):
                if scaled in want or padded in want:
                    fn = det._device_scale_fn(post_hw, scaled, padded)
                    fn(det.variables, dev)  # compile
                    fns.append((det, fn))
        with trace(args.trace_dir):
            for _ in range(args.calls):
                for det, fn in fns:
                    import numpy as _np

                    _np.asarray(fn(det.variables, dev)[0])

    print(json.dumps(parse_trace_ops(args.trace_dir), indent=1))


if __name__ == "__main__":
    main()
