"""Pallas TPU kernel: fused w8a8 requantize epilogue.

The quantized forward's per-layer epilogue (``tpupose/quant.py::_qconv``:
s32 accumulator -> f32 scale -> bias -> ReLU -> round -> clip -> s8) is a
trivial elementwise chain, but XLA's ``clamp_convert`` fusion of it is
pathological on sublane-unaligned grids: at the pyramid's 184px scale the
stage convs run on 23x23 maps and ``scripts/op_breakdown.py`` attributed
**3.7 of that program's 5.8 ms** to these epilogues — 18x the 368px
program's cost on 4x less data (BASELINE.md round-4 int8 section).  The
int8 min tile is (32, 128); 23x23 = 529 flattened rows defeats the
vectorizer.

This kernel does the whole epilogue in one VMEM pass per layer.  The
wrapper flattens (B, H, W, C) -> (BHW, C) and pads rows up to the s8
sublane multiple (32) so every store is aligned; the pad is a tiny s32
copy XLA fuses into the conv's output write.  Multi-group layers (the
refine stages' concat members, ``quant.py::_layer_spec``) pass all
accumulators and per-group scale rows; the kernel sums the scaled parts
so no intermediate ever round-trips HBM.

Only worth it where XLA's lowering is the pathology: the auto heuristic
(``use_for_grid``) selects maps below ~64x64, where the epilogue cost is
lowering-bound, not bandwidth-bound (at >=368px geometry XLA's fused
epilogues already run at memory speed — 0.20 ms/program).

Falls back to interpreter mode off-TPU so CPU tests exercise the same
code (same policy as ``blur_nms.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# s8 min tile is (32, 128): pad flattened rows to this multiple so the
# int8 store is always sublane-aligned (the whole point of the kernel).
_ROW_ALIGN = 32
# whole-array blocks: keep padded bytes under a conservative VMEM cap;
# above it, fall back to XLA (large grids are not the pathology anyway).
_VMEM_CAP_BYTES = 8 * 1024 * 1024


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


def use_for_grid(h: int, w: int) -> bool:
    """Heuristic: Pallas is only considered where XLA's clamp_convert
    lowering is the suspected pathology — small grids (the 184px pyramid
    scale's 23x23/46x46 stage maps, where round-4 op attribution charged
    3.7 of 5.8 ms to epilogues).  Above ~64x64 XLA's fused epilogue is
    already at memory speed (0.20 ms/program at 368px geometry).  The
    threshold is validated per-chain by ``scripts/requant_probe.py``;
    measured v5e numbers live in BASELINE.md (round 5)."""
    return h * w <= 64 * 64


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


def fits_vmem(shape: Tuple[int, int, int, int], n_groups: int) -> bool:
    """Whole-array single-block budget check (s32 inputs + s8 out)."""
    b, h, w, c = shape
    prows = _pad_rows(b * h * w)
    lanes = -(-c // 128) * 128
    return prows * lanes * (4 * n_groups + 1) <= _VMEM_CAP_BYTES
