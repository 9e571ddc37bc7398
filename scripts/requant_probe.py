"""Probe: can a Pallas requantize epilogue fix the quantized 184px
pyramid scale's pathological XLA ``clamp_convert_fusion``?

Round-4 op-level attribution (``scripts/op_breakdown.py``) showed the
w8a8 184px program loses 3.7 of its 5.8 ms to the per-layer requantize
epilogues on sublane-unaligned 23x23 stage grids — 18x the 368px
program's cost on 4x less data.  The shipped workaround is mixed
precision (``cfg.quant_min_side``); this probe measures whether the
fused Pallas epilogue (``tpupose/ops/pallas/requant.py``) reclaims the
loss at the kernel level, chain-by-chain at the 184px program's real
geometries:

* refine 7x7 128ch at 23x23 (the stage bulk: 5 convs x 5 stages x 2)
* stem 3x3 256ch at 46x46 / 512ch at 23x23
* aligned 32x32 control (is misalignment really the cause?)

Times come from the jax.profiler xplane — the only trustworthy
per-program instrument on this box (CLAUDE.md device-timing rules).

RESULT (2026-08-20, v5e): NEGATIVE — parity at the refine shapes
(0.436 vs 0.429 ms), 20-22x SLOWER at the stem shapes, and the aligned
control matches the unaligned case, so misalignment was not the cost.
Full table + analysis in BASELINE.md (round 5); the product integration
was removed, the kernel kept as the recorded negative result.

Usage: python scripts/requant_probe.py [--tiny] [--trace-dir DIR]
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
from jax import lax

from tpupose.ops.pallas.requant import requant_epilogue


def _conv(x, k, acc_dtype):
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def make_cases(tiny: bool = False, depth: int = 5):
    rng = np.random.RandomState(0)
    # the quantized 184px program's conv geometries (stride-8 stage grids
    # are 23x23; stem runs 184/92/46/23 at 64/128/256/512 ch)
    shapes = [
        ("refine7x7_23_128", (1, 23, 23, 128), (7, 7, 128, 128)),
        ("stem3x3_46_256", (1, 46, 46, 256), (3, 3, 256, 256)),
        ("stem3x3_23_512", (1, 23, 23, 512), (3, 3, 512, 512)),
        ("aligned7x7_32_128", (1, 32, 32, 128), (7, 7, 128, 128)),
    ]
    if tiny:  # correctness smoke on a slow CPU, not a measurement
        shapes = [("refine7x7_8_16", (1, 8, 8, 16), (7, 7, 16, 16))]
    interpret = jax.default_backend() != "tpu"
    cases = []
    for name, xs, ks in shapes:
        xf = rng.randn(*xs).astype(np.float32)
        kf = (rng.randn(*ks) * 0.05).astype(np.float32)
        x8 = np.clip(np.round(np.abs(xf) * 16), 0, 127).astype(np.int8)
        k8 = np.clip(np.round(kf * 600), -127, 127).astype(np.int8)
        mult = np.full((ks[-1],), 1.0 / 600.0, np.float32)
        bias = rng.randn(ks[-1]).astype(np.float32) * 0.01

        def bf16_chain(x, k, depth=depth):
            for _ in range(depth):
                x = jnp.maximum(_conv(x, k, jnp.float32),
                                0.0).astype(jnp.bfloat16)
            return x

        def s8_xla_chain(x, k, m, b, depth=depth):
            # the shipped quant.py::_qconv epilogue, XLA-lowered
            for _ in range(depth):
                y = _conv(x, k, jnp.int32).astype(jnp.float32) * m + b
                y = jnp.maximum(y, 0.0)
                x = jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)
            return x

        def s8_pallas_chain(x, k, m, b, depth=depth, interpret=interpret):
            for _ in range(depth):
                acc = _conv(x, k, jnp.int32)
                x = requant_epilogue((acc,), (m,), b, relu=True,
                                     interpret=interpret)
            return x

        xb = xf.astype(jnp.bfloat16)
        kb = kf.astype(jnp.bfloat16)
        cases += [
            (f"{name}_bf16", bf16_chain, (xb, kb)),
            (f"{name}_s8xla", s8_xla_chain, (x8, k8, mult, bias)),
            (f"{name}_s8pallas", s8_pallas_chain, (x8, k8, mult, bias)),
        ]
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/requant_trace")
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes: Python/compile + parity smoke only")
    ap.add_argument("--shapes", default="",
                    help="comma substrings: only matching case names")
    ap.add_argument("--skip-parity", action="store_true",
                    help="skip the (slow remote-compile) parity pass — "
                         "covered by tests/test_quant.py::TestPallasRequant "
                         "interpret-mode parity")
    args = ap.parse_args()

    cases = make_cases(tiny=args.tiny, depth=args.depth)
    if args.shapes:
        keys = [s for s in args.shapes.split(",") if s]
        cases = [c for c in cases if any(k in c[0] for k in keys)]

    if not args.skip_parity:
        # parity: pallas epilogue must match the XLA expression exactly
        by_name = {n: (f, ex) for n, f, ex in cases}
        for base in {n.rsplit("_", 1)[0] for n in by_name}:
            fx, ex = by_name[f"{base}_s8xla"]
            fp, ep = by_name[f"{base}_s8pallas"]
            a = np.asarray(jax.jit(fx)(*ex))
            b = np.asarray(jax.jit(fp)(*ep))
            assert np.array_equal(a, b), f"parity FAIL {base}"
            print(f"parity OK {base}", file=sys.stderr)
    if args.tiny:
        print(json.dumps({"tiny_parity": "ok"}))
        return

    from bench import parse_trace_module_times
    from tpupose.utils.profiling import trace

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    jitted = []
    for name, fn, ex in cases:
        fn.__name__ = name
        jfn = jax.jit(fn)
        ex = tuple(jax.device_put(a, dev) for a in ex)
        np.asarray(jfn(*ex))  # compile + real sync (remote tunnel)
        jitted.append((name, jfn, ex))

    with trace(args.trace_dir):
        for name, jfn, ex in jitted:
            for _ in range(args.calls):
                np.asarray(jfn(*ex))

    times = parse_trace_module_times(args.trace_dir)
    out = {}
    for name, _, _ in jitted:
        row = times.get(f"jit_{name}")
        out[name] = row["mean_ms"] if row else None
    report = {"per_program_ms": out}
    for base in ("refine7x7_23_128", "stem3x3_46_256", "stem3x3_23_512",
                 "aligned7x7_32_128"):
        b = out.get(f"{base}_bf16")
        x = out.get(f"{base}_s8xla")
        p = out.get(f"{base}_s8pallas")
        if x and p:
            report[f"{base}_pallas_vs_xla"] = round(x / p, 3)
        if b and p:
            report[f"{base}_pallas_vs_bf16"] = round(b / p, 3)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
