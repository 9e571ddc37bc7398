"""Pallas TPU kernel: fused w8a8 requantize epilogue — **measured
negative result; NOT wired into the product** (kept, with its probe and
parity test, as the recorded evidence per the repo's negative-result
convention, like ``ops/paf.py::_from_rows``).

Motivation (round 4): the quantized forward's per-layer epilogue
(``tpupose/quant.py::_qconv``: s32 accumulator -> f32 scale -> bias ->
ReLU -> round -> clip -> s8) looked pathological on sublane-unaligned
grids — at the pyramid's 184px scale the stage convs run on 23x23 maps
and ``scripts/op_breakdown.py`` attributed 3.7 of that program's 5.8 ms
to ``clamp_convert`` fusions.  This kernel does the whole epilogue in
one VMEM pass with rows padded to the s8 sublane multiple (32) so every
store is aligned; multi-group layers (the refine stages' concat
members) sum their scaled parts in-kernel.

Verdict (round 5, v5e, ``scripts/requant_probe.py`` xplane times,
depth-5 conv+epilogue chains at the 184px program's real geometries —
full table in BASELINE.md round 5):

* refine 7x7 128ch @ 23x23: Pallas 0.436 ms vs XLA 0.429 — parity.
* stem 3x3 256ch @ 46x46: 1.199 vs 0.054 — Pallas **22x slower**.
* stem 3x3 512ch @ 23x23: 1.206 vs 0.060 — **20x slower**.
* aligned 7x7 128ch @ 32x32 control: 0.742 vs 0.728 — parity (so
  sublane misalignment was NOT the recoverable cost).

The bf16 twin of the refine chain runs 0.126 ms vs int8's 0.429: the
small-grid slowness travels with the int8 7x7 conv itself, not the
epilogue lowering — no epilogue implementation can reclaim it.  Mixed
precision (``InferenceConfig.quant_min_side``) remains the shipped
answer for the 184px scale; the product path is pure-XLA
(``quant.py::_qconv``), which also keeps exports portable and GSPMD
auto-partitioning intact.

Falls back to interpreter mode off-TPU so the CPU parity test exercises
the same code (same policy as ``blur_nms.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# s8 min tile is (32, 128): pad flattened rows to this multiple so the
# int8 store is always sublane-aligned (the whole point of the kernel).
_ROW_ALIGN = 32


def _make_kernel(n_groups: int, relu: bool, lo: float):
    def kernel(*refs):
        # refs: acc_0..acc_{G-1}, mult (G, C), bias (1, C), out
        out_ref = refs[-1]
        bias = refs[-2][...]            # (1, C)
        mult = refs[-3]                 # (G, C)
        y = None
        for g in range(n_groups):
            part = refs[g][...].astype(jnp.float32) * mult[g, :][None, :]
            y = part if y is None else y + part
        y = y + bias
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[...] = jnp.clip(jnp.round(y), lo, 127.0).astype(jnp.int8)

    return kernel


def _pad_rows(n: int) -> int:
    return -(-n // _ROW_ALIGN) * _ROW_ALIGN


def requant_epilogue(accs: Sequence[jnp.ndarray],
                     mults: Sequence[jnp.ndarray],
                     bias: jnp.ndarray,
                     relu: bool,
                     lo: float = 0.0,
                     interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused quantize epilogue: ``clip(round(max(sum_g accs[g]*mults[g]
    + bias, 0)), lo, 127).astype(int8)`` (the ``max`` only if ``relu``).

    accs: G tensors (B, H, W, C) int32 (same shape); mults: G of (C,)
    f32; bias: (C,) f32.  Returns (B, H, W, C) int8.  Semantics are
    bit-identical to the XLA expression in ``quant.py::_qconv`` (same
    round-half-even, same clip bounds).

    ``interpret=None`` auto-selects interpreter mode off-TPU (the
    ``ops/peaks.py`` pattern), so CPU tests run the same code path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = accs[0].shape
    rows = b * h * w
    prows = _pad_rows(rows)
    flat = [acc.reshape(rows, c) for acc in accs]
    if prows != rows:
        flat = [jnp.pad(a, ((0, prows - rows), (0, 0))) for a in flat]
    mult = jnp.stack([jnp.asarray(m, jnp.float32) for m in mults])  # (G, C)
    bias2 = jnp.asarray(bias, jnp.float32)[None, :]                 # (1, C)

    out = pl.pallas_call(
        _make_kernel(len(flat), relu, float(lo)),
        out_shape=jax.ShapeDtypeStruct((prows, c), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(flat) + 2),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*flat, mult, bias2)
    return out[:rows].reshape(b, h, w, c)
