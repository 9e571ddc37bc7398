"""Probe: does XLA lower s8xs8->s32 convolutions to the v5e's int8 MXU
path, and what would a quantized CPM refine conv buy over bf16?

The v5e's int8 peak is 394 TOPS vs 197 TFLOP/s bf16 — if XLA lowers
int8 convs onto the MXU's int8 path, the conv-compute-bound pose pyramid
(~55% MFU bf16, BENCH_DETAILS.json:trace_device_times) could roughly
halve its forward time.  This probe times the framework's dominant conv
shapes (7x7 128->128 refine convs, 3x3 VGG-stem convs) in bf16 vs
s8xs8->s32, including the requantize (scale+round+clip back to int8)
that a real quantized pipeline pays between layers.

Times come from the jax.profiler xplane (bench.parse_trace_module_times)
— the only trustworthy per-program instrument on this box (CLAUDE.md
device-timing rules).

Usage: python scripts/int8_probe.py [--trace-dir /tmp/int8_trace]
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


def _conv(x, k, acc_dtype):
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def make_cases(tiny: bool = False):
    """(name, fn, example_args) for each probed variant."""
    rng = np.random.RandomState(0)
    # Dominant shapes at scale 2.0 (736^2 input): stem 3x3 convs at
    # 368^2x128 and 184^2x256, refine 7x7 convs at 92^2x128 (x5 per
    # stage x 5 stages x 2 branches = the FLOPs bulk).
    shapes = [
        ("refine7x7_92_128", (1, 92, 92, 128), (7, 7, 128, 128)),
        ("stem3x3_368_128", (1, 368, 368, 128), (3, 3, 128, 128)),
        ("stem3x3_92_512", (1, 92, 92, 512), (3, 3, 512, 512)),
    ]
    if tiny:  # correctness smoke on a slow CPU, not a measurement
        shapes = [("refine7x7_8_16", (1, 8, 8, 16), (7, 7, 16, 16))]
    cases = []
    for name, xs, ks in shapes:
        xf = rng.randn(*xs).astype(np.float32)
        kf = (rng.randn(*ks) * 0.05).astype(np.float32)
        x8 = np.clip(np.round(xf * 16), -127, 127).astype(np.int8)
        k8 = np.clip(np.round(kf * 600), -127, 127).astype(np.int8)

        def bf16_fn(x, k):
            return _conv(x, k, jnp.float32)

        def int8_fn(x, k):
            return _conv(x, k, jnp.int32)

        def int8_requant_fn(x, k):
            # conv + the per-layer epilogue a real w8a8 pipeline pays:
            # s32 -> scale -> relu -> round -> clip -> s8
            y = _conv(x, k, jnp.int32)
            y = y.astype(jnp.float32) * jnp.float32(1.0 / (16 * 600))
            y = jnp.maximum(y, 0.0) * jnp.float32(16.0)
            return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

        # chain of 5 (one refine stage's 7x7 stack) to amortize edges
        def bf16_chain(x, k):
            for _ in range(5):
                x = jnp.maximum(_conv(x, k, jnp.float32),
                                0.0).astype(jnp.bfloat16)
            return x

        def int8_chain(x, k):
            for _ in range(5):
                y = _conv(x, k, jnp.int32).astype(jnp.float32)
                y = jnp.maximum(y * jnp.float32(1.0 / 600), 0.0)
                x = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
            return x

        def int8_chain_padvalid(x, k, p=ks[0] // 2):
            # what the shifted-zero-point pipeline does today: explicit
            # nonzero-constant pad (cannot fold into the conv's padding
            # config, so it materializes) + VALID conv.  p is bound
            # per-shape via the default arg (ADVICE r3: the loop variable
            # was shared, so every shape used the last shape's p=1).
            for _ in range(5):
                xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)),
                             constant_values=np.int8(-128))
                y = lax.conv_general_dilated(
                    xp, k, window_strides=(1, 1), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                y = jnp.maximum((y + jnp.float32(128.0)) / 600.0, 0.0)
                x = jnp.clip(jnp.round(y) - 128.0, -128, 127
                             ).astype(jnp.int8)
            return x

        def int8_chain_border(x, k, rowc, colc):
            # proposed fix: SAME zero-pad conv on the shifted s8 tensor
            # + broadcast border zero-point corrections (the interior
            # z*S_o correction folds into the bias; rows/cols within
            # k//2 of the edge need small deficit terms, precomputed
            # from kernel marginals).  This measures the epilogue cost
            # of the corrections; values here are placeholders.
            for _ in range(5):
                y = _conv(x, k, jnp.int32).astype(jnp.float32)
                y = (y + rowc + colc) * jnp.float32(1.0 / 600)
                y = jnp.maximum(y, 0.0)
                x = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
            return x

        xb = xf.astype(jnp.bfloat16)
        kb = kf.astype(jnp.bfloat16)
        cases += [
            (f"{name}_bf16", bf16_fn, (xb, kb)),
            (f"{name}_s8s32", int8_fn, (x8, k8)),
            (f"{name}_s8requant", int8_requant_fn, (x8, k8)),
            (f"{name}_bf16chain5", bf16_chain, (xb, kb)),
            (f"{name}_s8chain5", int8_chain, (x8, k8)),
            (f"{name}_s8padvalid5", int8_chain_padvalid, (x8, k8)),
            (f"{name}_s8border5", int8_chain_border,
             (x8, k8,
              rng.randn(1, xs[1], 1, ks[3]).astype(np.float32),
              rng.randn(1, 1, xs[2], ks[3]).astype(np.float32))),
        ]
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/int8_trace")
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes: Python/compile smoke only")
    args = ap.parse_args()

    from bench import parse_trace_module_times
    from tpupose.utils.profiling import trace

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    jitted = []
    for name, fn, ex in make_cases(tiny=args.tiny):
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
    # FLOP-equivalent throughput for the headline shapes
    report = {"per_program_ms": out}
    for base in ("refine7x7_92_128", "stem3x3_368_128", "stem3x3_92_512"):
        b, s = out.get(f"{base}_bf16chain5"), out.get(f"{base}_s8chain5")
        if b and s:
            report[f"{base}_chain_speedup"] = round(b / s, 3)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
