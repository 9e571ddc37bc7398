"""Probe: can the quantized pipeline keep full 8-bit activations AND
native SAME zero-padding?

The round-3 shifted-zero-point scheme needed an explicit constant pad
(X = -128 represents v = 0) + VALID conv, which `scripts/int8_probe.py`
measured 1.5-2.4x slower than a plain SAME zero-pad s8 conv at the
pipeline's dominant shapes — the whole int8 speedup (1.55-1.87x vs bf16)
dies in the pad.  Two candidate fixes, probed here:

* ``u8s8``: unsigned 8-bit activations (v = a * X, X in 0..255) x s8
  weights -> s32.  Zero pad represents v = 0 exactly, full 8 bits kept.
  Works iff XLA/Mosaic lowers mixed u8 x s8 convs at int8 MXU rate.
* ``s7s8``: symmetric non-negative activations (v = a * X, X in 0..127)
  x s8 weights.  Zero pad exact, costs 1 bit of activation precision.

Times from the jax.profiler xplane (the only trustworthy per-program
instrument on this box — CLAUDE.md device-timing rules).

Usage: python scripts/u8_probe.py [--trace-dir /tmp/u8_trace]
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


def _conv(x, k):
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def make_cases():
    rng = np.random.RandomState(0)
    shapes = [
        ("refine7x7_92_128", (1, 92, 92, 128), (7, 7, 128, 128)),
        ("stem3x3_368_128", (1, 368, 368, 128), (3, 3, 128, 128)),
        ("stem3x3_92_512", (1, 92, 92, 512), (3, 3, 512, 512)),
    ]
    cases = []
    for name, xs, ks in shapes:
        xf = rng.rand(*xs).astype(np.float32)  # non-negative (post-ReLU)
        kf = (rng.randn(*ks) * 0.05).astype(np.float32)
        xu8 = np.clip(np.round(xf * 255), 0, 255).astype(np.uint8)
        xs7 = np.clip(np.round(xf * 127), 0, 127).astype(np.int8)
        k8 = np.clip(np.round(kf * 600), -127, 127).astype(np.int8)
        xb = xf.astype(jnp.bfloat16)
        kb = kf.astype(jnp.bfloat16)

        def bf16_chain(x, k):
            for _ in range(5):
                x = jnp.maximum(
                    lax.conv_general_dilated(
                        x, k, window_strides=(1, 1), padding="SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.float32),
                    0.0).astype(jnp.bfloat16)
            return x

        def u8s8_chain(x, k):
            for _ in range(5):
                y = _conv(x, k).astype(jnp.float32)
                y = jnp.maximum(y * jnp.float32(1.0 / 600), 0.0)
                x = jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)
            return x

        def s7s8_chain(x, k):
            for _ in range(5):
                y = _conv(x, k).astype(jnp.float32)
                y = jnp.maximum(y * jnp.float32(1.0 / 600), 0.0)
                x = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)
            return x

        cases += [
            (f"{name}_bf16chain5", bf16_chain, (xb, kb)),
            (f"{name}_u8s8chain5", u8s8_chain, (xu8, k8)),
            (f"{name}_s7s8chain5", s7s8_chain, (xs7, k8)),
        ]
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/u8_trace")
    ap.add_argument("--calls", type=int, default=4)
    args = ap.parse_args()

    from bench import parse_trace_module_times
    from tpupose.utils.profiling import trace

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    jitted = []
    for name, fn, ex in make_cases():
        fn.__name__ = name
        jfn = jax.jit(fn)
        ex = tuple(jax.device_put(a, dev) for a in ex)
        try:
            np.asarray(jfn(*ex))  # compile + real sync
        except Exception as e:  # u8 x s8 conv may not lower
            print(f"{name}: FAILED to compile/run: {e}", file=sys.stderr)
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
    for base in ("refine7x7_92_128", "stem3x3_368_128", "stem3x3_92_512"):
        b = out.get(f"{base}_bf16chain5")
        for v in ("u8s8", "s7s8"):
            s = out.get(f"{base}_{v}chain5")
            if b and s:
                report[f"{base}_{v}_speedup"] = round(b / s, 3)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
