"""Pallas TPU kernel: s8 7x7 SAME conv with fused w8a8 requantize
epilogue — the purpose-built fix for XLA's int8 7x7 pathology.

Workload (reference: the refine stages of ``models/CocoPoseNet.py``
Mconv1-Mconv5, 7x7 128->128 convs run at every pyramid scale by
``pose_detector.py:441-445``): round 5's shape-resolved probe
(``scripts/requant_probe.py``, BASELINE.md "Pallas conv feasibility")
measured XLA's s8 7x7 conv at **2.5-2.9% of the v5e's 394-TOPS int8
peak** on the stage grids (23x23-92x92), vs 53-59% for s8 3x3 — the one
remaining measured perf pathology in the quantized forward.  The
epilogue level was probed first and is NOT the cost
(``ops/pallas/requant.py``, negative result); this kernel replaces the
conv itself.

Formulation — 49 shifted MXU accumulations on a flattened-spatial
layout (no HBM im2col):

- The zero-padded input ``(H+6, W_row, C)`` is flattened row-major to a
  2D ``(rows, C)`` buffer: spatial in SUBLANES, channels in LANES
  (C padded to the 128-lane width; zero channels contribute zero to the
  integer accumulator — exact).  ``W_row = roundup(W+6, 8)`` so a row
  step is a statically provable sublane-aligned offset (Mosaic rejects
  dynamic sublane starts not provably 0 mod 8 — the first formulation's
  ``dy*w_pad + dx`` taps failed exactly there).
- The 7 column shifts ``dx in 0..6`` cannot be sublane-aligned, so they
  are pre-materialized OUTSIDE the kernel as 7 shifted slices of the
  flattened buffer (the ``blur_nms.py`` halo trick: overlapping windows
  can't be expressed in BlockSpecs; stage them as separate refs).  HBM
  cost: 7x the (small) activation, ~2.7 MB at 46x46x128 — noise next to
  the 0.8 MB weights and the MXU win.
- Tap ``(dy, dx)`` is then ONE aligned slice of ref ``dx`` at static
  row offset ``dy*W_row``: output row ``h*W_row+w`` reads padded pixel
  ``(h+dy, w+dx)``.  Each tap feeds a single ``(T, C) @ (C, O)``
  s8 x s8 -> s32 MXU dot; 49 taps accumulate in a VMEM-resident s32
  block.  The waste is the ``W_row - W`` wrap columns per image row
  (13-39% extra MACs) — vs the ~40x the MXU loses on XLA's own
  small-grid 7x7 lowering.
- The w8a8 epilogue (per-group f32 scale -> bias -> ReLU -> round ->
  clip -> s8, bit-matching ``quant.py::_qconv``) runs in-kernel on the
  accumulator, so the s32 tensor never touches HBM.  Multi-group layers
  (the refine stages' concat members, 38+19+128 ch at separate
  activation scales) accumulate per-group and combine in f32 exactly
  like the XLA expression.

The grid tiles output rows (``T`` sublanes per step) so VMEM holds only
the shifted inputs/weights plus one accumulator tile; batch rides a
second grid dimension.

Falls back to interpreter mode off-TPU so CPU tests exercise the same
code path (policy of ``blur_nms.py`` / ``requant.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128     # MXU lane width: channel dims pad to this
_ROW_ALIGN = 32  # s8 sublane tile: row counts / tile sizes pad to this
_MAX_TILE = 1024  # output-row tile cap (VMEM: s32+f32 acc ~1 MB at 128 ch)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _tiling(s_rows: int) -> Tuple[int, int]:
    """Output-row tile size and count: near-even tiles under _MAX_TILE,
    32-aligned, so tail waste stays a few percent (S=2392 -> 3x800;
    S=9016 -> 9x1024)."""
    n_tiles = -(-s_rows // _MAX_TILE)
    tile = _round_up(-(-s_rows // n_tiles), _ROW_ALIGN)
    return tile, -(-s_rows // tile)


def _make_kernel(n_groups: int, c_pad: int, w_row: int, tile: int,
                 relu: bool):
    def kernel(*refs):
        # refs: x_{g,dx} for g in groups, dx in 0..6 (1, x_rows, C);
        #       w_0..w_{G-1} (49*C, O); mult (G, O); bias (1, O);
        #       out (1, T, O)
        out_ref = refs[-1]
        bias = refs[-2][...]            # (1, O)
        mult = refs[-3]                 # (G, O)
        base = pl.program_id(1) * tile
        y = None
        for g in range(n_groups):
            w_ref = refs[7 * n_groups + g]
            acc = jnp.zeros((tile, out_ref.shape[-1]), jnp.int32)
            for t in range(49):
                dy, dx = t // 7, t % 7
                x_ref = refs[7 * g + dx]
                # base is 32-aligned (tile % 32 == 0) and dy*w_row is a
                # static multiple of 8 (w_row % 8 == 0): Mosaic can
                # prove the sublane start aligned.
                xs = x_ref[0, pl.ds(base + dy * w_row, tile), :]
                wt = w_ref[t * c_pad:(t + 1) * c_pad, :]
                acc = acc + jax.lax.dot_general(
                    xs, wt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            part = acc.astype(jnp.float32) * mult[g, :][None, :]
            y = part if y is None else y + part
        y = y + bias
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[0] = jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)

    return kernel


def conv7_s8(parts: Sequence[jnp.ndarray],
             kernels_q: Sequence[jnp.ndarray],
             mults: Sequence[jnp.ndarray],
             bias: jnp.ndarray,
             relu: bool = True,
             interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused s8 7x7 SAME conv + w8a8 requantize.

    ``parts``: G input groups (B, H, W, C_g) int8 (the refine concat
    members; 1-tuple elsewhere); ``kernels_q``: G of (7, 7, C_g, O)
    int8; ``mults``: G of (O,) f32; ``bias``: (O,) f32.  Returns
    (B, H, W, O) int8 == ``quant.py::_qconv`` on the same arrays
    (integer conv exact; identical f32 epilogue expression).

    ``interpret=None`` auto-selects interpreter mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, _ = parts[0].shape
    o = kernels_q[0].shape[-1]
    w_row = _round_up(w + 6, 8)
    s_rows = h * w_row
    tile, n_tiles = _tiling(s_rows)
    out_rows = tile * n_tiles
    # every tap slice of the last tile must stay in-bounds
    x_rows = _round_up(out_rows + 6 * w_row, _ROW_ALIGN)

    xs2, ws2 = [], []
    for x, k in zip(parts, kernels_q):
        c = x.shape[-1]
        c_pad = _round_up(c, _LANE)
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3 + w_row - (w + 6)),
                         (0, c_pad - c)))
        x2 = xp.reshape(b, (h + 6) * w_row, c_pad)
        x2 = jnp.pad(x2, ((0, 0), (0, max(0, x_rows + 7 - x2.shape[1])),
                          (0, 0)))
        # the 7 dx-shifted views (pure data movement, done by XLA)
        xs2.extend(x2[:, dx:dx + x_rows, :] for dx in range(7))
        kp = jnp.pad(jnp.asarray(k), ((0, 0), (0, 0), (0, c_pad - c), (0, 0)))
        ws2.append(kp.reshape(49 * c_pad, o))
    c_pad = xs2[0].shape[-1]
    assert all(x.shape[-1] == c_pad for x in xs2), (
        "groups must share a padded channel width; pad to a common "
        f"multiple of {_LANE} first: {[x.shape for x in xs2]}")
    g = len(ws2)
    mult = jnp.stack([jnp.asarray(m, jnp.float32) for m in mults])  # (G, O)
    bias2 = jnp.asarray(bias, jnp.float32)[None, :]                 # (1, O)

    out = pl.pallas_call(
        _make_kernel(g, c_pad, w_row, tile, relu),
        grid=(b, n_tiles),
        out_shape=jax.ShapeDtypeStruct((b, out_rows, o), jnp.int8),
        in_specs=(
            [pl.BlockSpec((1, x_rows, c_pad), lambda bi, i: (bi, 0, 0),
                          memory_space=pltpu.VMEM)] * (7 * g)
            + [pl.BlockSpec((49 * c_pad, o), lambda bi, i: (0, 0),
                            memory_space=pltpu.VMEM)] * g
            + [pl.BlockSpec((g, o), lambda bi, i: (0, 0),
                            memory_space=pltpu.VMEM),
               pl.BlockSpec((1, o), lambda bi, i: (0, 0),
                            memory_space=pltpu.VMEM)]
        ),
        out_specs=pl.BlockSpec((1, tile, o), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*xs2, *ws2, mult, bias2)
    return out[:, :s_rows].reshape(b, h, w_row, o)[:, :, :w, :]


def use_for_layer(ksize: int, h: int, w: int, out_ch: int) -> bool:
    """Integration heuristic, MEASURED crossover (conv7_probe on the
    v5e, BASELINE.md round 5 "conv7 kernel"): XLA's s8 7x7 pathology is
    confined to grids <=~32 (23x23: this kernel 19.5x faster, 0.022 vs
    0.429 ms per 5-chain); at 46x46+ XLA already runs ~65% of int8 peak
    and the kernel measures 0.85-0.97x — so only small grids route
    here.  3x3 runs at 53-59% of peak under XLA and 1x1 heads are
    matmuls — never routed.  Output channels must fill the 128-lane MXU
    width (they do: every CPM 7x7 conv is ->128)."""
    return ksize == 7 and out_ch % _LANE == 0 and max(h, w) <= 32


def vmem_estimate(h: int, w: int, n_groups: int, out_ch: int) -> int:
    """Rough per-step VMEM bytes: the 7 dx-shifted inputs + weights
    (whole) + one accumulator tile; used by callers to stay under the
    ~16 MB scope."""
    w_row = _round_up(w + 6, 8)
    s_rows = h * w_row
    tile, n_tiles = _tiling(s_rows)
    x_rows = _round_up(tile * n_tiles + 6 * w_row, _ROW_ALIGN)
    per_group = 7 * x_rows * _LANE + 49 * _LANE * out_ch
    acc = tile * out_ch * (4 + 4) + tile * out_ch
    return n_groups * per_group + acc
