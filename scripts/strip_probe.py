"""Probe: shifted (full 8-bit) s8 activations + SAME zero-pad conv + EXACT
border strip corrections — the candidate replacement for the round-3
explicit-pad scheme.

Math: v = a*(X + z) with z = 128.  SAME zero-pads X with 0 (representing
v = a*z, wrong); the exact fix is y += z*mult*(S_o - deficit(i, j)) where
S_o is the full kernel sum (constant -> bias) and deficit(i, j) is the sum
of kernel weights hanging off the image edge — nonzero only within
p = k//2 of each border.  Row/col strips + corner cross terms are
precomputed; the runtime cost is 4p strip `.at[].add()`s + 4 corner block
adds per conv.  This probe measures that epilogue against the plain
zero-pad chain (lower bound) and bf16 (baseline).

Usage: python scripts/strip_probe.py
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


def border_terms(kq: np.ndarray, p: int):
    """Precompute deficit terms for one s8 kernel (k, k, I, O).

    Returns (rows, cols, corners):
      rows:    (2p, O) — rows[i] for output row i (top), rows[p+i] for
               output row H-1-i (bottom)
      cols:    (2p, O) — same for columns
      corners: (4, p, p, O) — cross terms to ADD BACK (tl, tr, bl, br)
    """
    ksum = kq.astype(np.int64).sum(axis=2)          # (k, k, O)
    rows, cols = [], []
    for i in range(p):
        rows.append(ksum[: p - i].sum(axis=(0, 1)))       # top row i
    for i in range(p):
        rows.append(ksum[kq.shape[0] - (p - i):].sum(axis=(0, 1)))
    for j in range(p):
        cols.append(ksum[:, : p - j].sum(axis=(0, 1)))
    for j in range(p):
        cols.append(ksum[:, kq.shape[1] - (p - j):].sum(axis=(0, 1)))
    o = kq.shape[-1]
    k = kq.shape[0]
    # corner blocks in BLOCK coordinates: corners[c, bi, bj] applies to the
    # block pixel (bi, bj) of the p x p corner slab (tr/bl/br blocks count
    # bi/bj from the slab's top-left, i.e. the far edge is at bj = p - 1)
    corners = np.zeros((4, p, p, o), np.int64)
    for bi in range(p):
        for bj in range(p):
            corners[0, bi, bj] = ksum[: p - bi, : p - bj].sum(axis=(0, 1))
            corners[1, bi, bj] = ksum[: p - bi, k - 1 - bj:].sum(axis=(0, 1))
            corners[2, bi, bj] = ksum[k - 1 - bi:, : p - bj].sum(axis=(0, 1))
            corners[3, bi, bj] = ksum[k - 1 - bi:, k - 1 - bj:].sum(
                axis=(0, 1))
    return (np.stack(rows).astype(np.float32),
            np.stack(cols).astype(np.float32),
            corners.astype(np.float32))


def apply_border(y, rows, cols, corners, p: int, zmult):
    """y: (B, H, W, O) f32 accumulator (interior already correct via the
    bias fold); subtract z*mult*deficit on the border strips."""
    h, w = y.shape[1], y.shape[2]
    for i in range(p):
        y = y.at[:, i].add(-zmult * rows[i])
        y = y.at[:, h - 1 - i].add(-zmult * rows[p + i])
    for j in range(p):
        y = y.at[:, :, j].add(-zmult * cols[j])
        y = y.at[:, :, w - 1 - j].add(-zmult * cols[p + j])
    # corners were subtracted twice (once by the row strip, once by the
    # col strip) — add the cross term back
    y = y.at[:, :p, :p].add(zmult * corners[0])
    y = y.at[:, :p, w - p:].add(zmult * corners[1])
    y = y.at[:, h - p:, :p].add(zmult * corners[2])
    y = y.at[:, h - p:, w - p:].add(zmult * corners[3])
    return y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/strip_trace")
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--verify-cpu", action="store_true",
                    help="numerically verify strips == explicit -z pad "
                         "on CPU, tiny shape, then exit")
    args = ap.parse_args()

    rng = np.random.RandomState(0)

    if args.verify_cpu:
        jax.config.update("jax_platforms", "cpu")
        k, p, z = 7, 3, 128.0
        x8 = rng.randint(-128, 128, (1, 16, 18, 8), "int8")
        k8 = rng.randint(-127, 128, (k, k, 8, 8), "int8")
        rows, cols, corners = border_terms(k8, p)
        # reference: explicit pad with X = -z + VALID conv
        xp = jnp.pad(x8, ((0, 0), (p, p), (p, p), (0, 0)),
                     constant_values=np.int8(-128))
        want = lax.conv_general_dilated(
            xp, k8, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO",
                                                        "NHWC"),
            preferred_element_type=jnp.int32).astype(np.float32)
        # strips: SAME zero pad + border deficit (the explicit pad's
        # missing taps each contribute -z*w, i.e. -z*deficit in total; the
        # z*S_o interior term is part of the BIAS fold in the real
        # pipeline, not of this raw-conv comparison)
        got = _conv(jnp.asarray(x8), jnp.asarray(k8)).astype(jnp.float32)
        got = apply_border(got, rows, cols, corners, p, z)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=0)
        print("strip corrections == explicit -128 pad: EXACT")
        return

    from bench import parse_trace_module_times
    from tpupose.utils.profiling import trace

    shapes = [
        ("refine7x7_92_128", (1, 92, 92, 128), (7, 7, 128, 128)),
        ("stem3x3_368_128", (1, 368, 368, 128), (3, 3, 128, 128)),
        ("stem3x3_92_512", (1, 92, 92, 512), (3, 3, 512, 512)),
    ]
    jitted = []
    for name, xs, ks in shapes:
        x8 = rng.randint(-128, 128, xs).astype(np.int8)
        k8 = rng.randint(-60, 61, ks).astype(np.int8)
        p = ks[0] // 2
        rows, cols, corners = border_terms(k8, p)

        def strip_chain(x, k, rows=jnp.asarray(rows), cols=jnp.asarray(cols),
                        corners=jnp.asarray(corners), p=p):
            for _ in range(5):
                y = _conv(x, k).astype(jnp.float32)
                y = apply_border(y, rows, cols, corners, p, 128.0)
                y = jnp.maximum((y + 40.0) * jnp.float32(1 / 600), 0.0)
                x = (jnp.clip(jnp.round(y), 0.0, 255.0) - 128.0
                     ).astype(jnp.int8)
            return x

        strip_chain.__name__ = f"{name}_s8strip5"
        jfn = jax.jit(strip_chain)
        ex = (jax.device_put(x8), jax.device_put(k8))
        np.asarray(jfn(*ex))
        jitted.append((strip_chain.__name__, jfn, ex))

    with trace(args.trace_dir):
        for name, jfn, ex in jitted:
            for _ in range(args.calls):
                np.asarray(jfn(*ex))

    times = parse_trace_module_times(args.trace_dir)
    print(json.dumps({n: (times.get(f"jit_{n}") or {}).get("mean_ms")
                      for n, _, _ in jitted}, indent=1))


if __name__ == "__main__":
    main()
