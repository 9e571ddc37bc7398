"""Probe: can a custom s8 7x7 conv beat XLA's small-grid pathology?

Round-5 feasibility analysis (BASELINE.md "Pallas conv for the refine
stages") localized the quantized forward's remaining headroom to the
**7x7 s8 convs at the stage grids**: 2.5-2.9% of the v5e's int8 peak
under XLA vs 53-59% for 3x3 — at utilization parity the quantized 368px
program drops ~2.98 -> ~1.6 ms.  This probe measures that claim
kernel-by-kernel at every pyramid grid (23/46/69/92, the stride-8 maps
of the 184/368/552/736 px scales), depth-5 conv chains with the shipped
``quant.py::_qconv`` epilogue, xplane per-program times (the box's only
trustworthy instrument, CLAUDE.md):

* ``bf16``    — bf16 conv chain (the dtype reference)
* ``s8xla``   — shipped XLA s8 conv (the 2.5%-of-peak baseline)
* ``s8im2col``— XLA-level patch-matmul reformulation (portable: no
                custom calls; pays HBM for the 49x patch tensor)
* ``s8pallas``— ``ops/pallas/conv7.py`` fused conv+requant kernel
* ``mg46``    — the multi-group refine-entry layer (38+19+128 ch concat
                members at separate scales, the Mconv1 case)

Usage: python scripts/conv7_probe.py [--tiny] [--shapes 46,92] [--trace-dir DIR]
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

from tpupose.ops.pallas.conv7 import conv7_s8


def _conv(x, k, acc_dtype):
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def _epilogue(y, m, b):
    y = jnp.maximum(y * m + b, 0.0)
    return jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)


def _im2col_s8(x, k):
    """XLA-level 7x7 s8 conv as one patch matmul: 49 shifted slices
    concatenated on channels (pure data movement), then a single
    (B*H*W, 49C) @ (49C, O) s8 dot."""
    bsz, h, w, c = x.shape
    o = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + w, :]
            for dy in range(7) for dx in range(7)]
    patches = jnp.concatenate(cols, axis=-1).reshape(bsz * h * w, 49 * c)
    acc = lax.dot_general(patches, k.reshape(49 * c, o),
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return acc.reshape(bsz, h, w, o)


def make_cases(tiny: bool = False, depth: int = 5):
    rng = np.random.RandomState(0)
    grids = [8] if tiny else [23, 46, 69, 92]
    interpret = jax.default_backend() != "tpu"
    ch = 16 if tiny else 128
    cases = []
    for g in grids:
        name = f"g{g}"
        xf = rng.randn(1, g, g, ch).astype(np.float32)
        kf = (rng.randn(7, 7, ch, ch) * 0.05).astype(np.float32)
        x8 = np.clip(np.round(np.abs(xf) * 16), 0, 127).astype(np.int8)
        k8 = np.clip(np.round(kf * 600), -127, 127).astype(np.int8)
        mult = np.full((ch,), 1.0 / 600.0, np.float32)
        bias = rng.randn(ch).astype(np.float32) * 0.01

        def bf16_chain(x, k, depth=depth):
            for _ in range(depth):
                x = jnp.maximum(_conv(x, k, jnp.float32),
                                0.0).astype(jnp.bfloat16)
            return x

        def s8_xla_chain(x, k, m, b, depth=depth):
            for _ in range(depth):
                x = _epilogue(_conv(x, k, jnp.int32).astype(jnp.float32),
                              m, b)
            return x

        def s8_im2col_chain(x, k, m, b, depth=depth):
            for _ in range(depth):
                x = _epilogue(_im2col_s8(x, k).astype(jnp.float32), m, b)
            return x

        def s8_pallas_chain(x, k, m, b, depth=depth, interpret=interpret):
            for _ in range(depth):
                x = conv7_s8((x,), (k,), (m,), b, relu=True,
                             interpret=interpret)
            return x

        xb = xf.astype(jnp.bfloat16)
        kb = kf.astype(jnp.bfloat16)
        cases += [
            (f"{name}_bf16", bf16_chain, (xb, kb)),
            (f"{name}_s8xla", s8_xla_chain, (x8, k8, mult, bias)),
            (f"{name}_s8im2col", s8_im2col_chain, (x8, k8, mult, bias)),
            (f"{name}_s8pallas", s8_pallas_chain, (x8, k8, mult, bias)),
        ]

    # the multi-group refine-entry layer (Mconv1: stage heads 38+19 ch +
    # stem feature 128 ch, separate activation scales) at the fast-path
    # grid — G s32 accumulations combined in f32
    g = 8 if tiny else 46
    chs = (4, 2, 16) if tiny else (38, 19, 128)
    o = 16 if tiny else 128
    parts = tuple(np.clip(np.round(np.abs(rng.randn(1, g, g, c)) * 16),
                          0, 127).astype(np.int8) for c in chs)
    ks = tuple(np.clip(np.round(rng.randn(7, 7, c, o) * 30), -127,
                       127).astype(np.int8) for c in chs)
    ms = tuple(np.full((o,), 1.0 / (600.0 + 7 * i), np.float32)
               for i in range(3))
    bias = rng.randn(o).astype(np.float32) * 0.01

    def mg_xla(parts, ks, ms, b, depth=depth):
        x = parts
        kq1 = ks
        m1 = ms
        for _ in range(depth):
            y = None
            for xg, kg, mg in zip(x, kq1, m1):
                part = _conv(xg, kg, jnp.int32).astype(jnp.float32) * mg
                y = part if y is None else y + part
            out = jnp.clip(jnp.round(jnp.maximum(y + b, 0.0)), 0.0,
                           127.0).astype(jnp.int8)
            x, kq1, m1 = (out,), (ks[-1],), (ms[-1],)
        return x[0]

    def mg_pallas(parts, ks, ms, b, depth=depth, interpret=interpret):
        x, kq1, m1 = parts, ks, ms
        for _ in range(depth):
            out = conv7_s8(x, kq1, m1, b, relu=True, interpret=interpret)
            x, kq1, m1 = (out,), (ks[-1],), (ms[-1],)
        return x[0] if isinstance(x, tuple) else x

    cases += [
        (f"mg{g}_s8xla", mg_xla, (parts, ks, ms, bias)),
        (f"mg{g}_s8pallas", mg_pallas, (parts, ks, ms, bias)),
    ]
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/conv7_trace")
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes: interpret-mode parity smoke only")
    ap.add_argument("--shapes", default="",
                    help="comma substrings: only matching case names")
    ap.add_argument("--skip-parity", action="store_true",
                    help="skip the (slow remote-compile) parity pass — "
                         "also covered by tests/test_quant.py::TestPallasConv7")
    args = ap.parse_args()

    cases = make_cases(tiny=args.tiny, depth=args.depth)
    if args.shapes:
        keys = [s for s in args.shapes.split(",") if s]
        cases = [c for c in cases if any(k in c[0] for k in keys)]

    failures = {}
    if not args.skip_parity:
        by_name = {n: (f, ex) for n, f, ex in cases}
        for base in sorted({n.rsplit("_", 1)[0] for n in by_name
                            if f"{n.rsplit('_', 1)[0]}_s8xla" in by_name}):
            fx, ex = by_name[f"{base}_s8xla"]
            ref = np.asarray(jax.jit(fx)(*ex))
            for variant in ("s8im2col", "s8pallas"):
                if f"{base}_{variant}" not in by_name:
                    continue
                fv, ev = by_name[f"{base}_{variant}"]
                try:
                    got = np.asarray(jax.jit(fv)(*ev))
                except Exception as e:  # compile failures: record, keep going
                    failures[f"{base}_{variant}"] = \
                        f"{type(e).__name__}: {str(e)[:300]}"
                    print(f"COMPILE FAIL {base} {variant}: "
                          f"{str(e).splitlines()[0][:160]}", file=sys.stderr)
                    continue
                assert np.array_equal(ref, got), f"parity FAIL {base} {variant}"
                print(f"parity OK {base} {variant}", file=sys.stderr)
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
        if name in failures:
            continue
        fn.__name__ = name
        jfn = jax.jit(fn)
        ex = jax.tree_util.tree_map(lambda a: jax.device_put(a, dev), ex)
        try:
            np.asarray(jfn(*ex))  # compile + real sync (remote tunnel)
        except Exception as e:
            failures[name] = f"{type(e).__name__}: {str(e)[:300]}"
            print(f"COMPILE FAIL {name}: {str(e).splitlines()[0][:160]}",
                  file=sys.stderr)
            continue
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
    if failures:
        report["failures"] = failures
    bases = sorted({n.rsplit("_", 1)[0] for n, _, _ in jitted})
    for base in bases:
        x = out.get(f"{base}_s8xla")
        for variant in ("s8im2col", "s8pallas", "bf16"):
            v = out.get(f"{base}_{variant}")
            if x and v:
                report[f"{base}_{variant}_vs_s8xla"] = round(x / v, 3)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
