"""Pallas TPU kernel: fused Gaussian blur + 4-neighbor peak NMS.

The peak path (``tpupose/ops/peaks.py``, reference semantics
``/root/reference/pose_detector.py:75-110``) is several HBM round trips
when expressed as separate XLA ops: pad -> row blur -> col blur ->
4 shifted compares -> threshold.  This kernel keeps a row-tile of one
joint channel's (pre-padded) heatmap resident in VMEM and does everything
in a single pass:

* separable Gaussian evaluated as unrolled VPU multiply-adds over
  statically shifted slices — same tap order as the XLA path, measured
  bit-identical to it ON TPU (an MXU matmul formulation would run
  through bf16 passes and perturb values by ~1e-3, enough to flip NMS
  comparisons).  In *interpret* mode on CPU the two paths can differ by
  1 ulp (~1e-7: the interpreter may contract multiply-adds to FMAs),
  which is why CPU parity tests compare with a small atol rather than
  exactly — and why auto-selection (``find_peaks(use_pallas=None)``)
  never picks this kernel off-TPU;
* strict-greater 4-neighbor NMS with zero borders (VPU selects).

Grid: (joint channel) x (row tiles).  Row tiling keeps VMEM bounded for
arbitrarily large maps (precise mode postprocesses at ORIGINAL image
resolution — a whole-map 584x584 block is a 28 MB scoped-VMEM OOM on a
v5e).  Each tile's input block carries a halo of ``radius + 1`` rows: the
blur needs ``radius``, and the NMS needs the blurred row adjacent to the
tile on each side.  Overlapping blocks are materialized OUTSIDE the kernel
by stacking static slices of the padded map (Pallas BlockSpecs cannot
overlap); the copy is +2(r+1) rows per tile of extra HBM traffic, fused by
XLA into the stack.

The symmetric-reflect padding itself happens OUTSIDE the kernel with
``jnp.pad(mode="symmetric")``: Mosaic has no lowering for ``lax.rev``/
gathers needed to mirror in-kernel, and the pad is a trivially fused XLA
data movement.  Padding both axes up front is exact: column padding
commutes with the row blur (the blur acts per-column identically).

Falls back to interpreter mode off-TPU so CPU tests exercise the same
code.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpupose.ops.gaussian import scipy_gaussian_kernel_1d

# Output rows per tile; tile VMEM ~= (TILE_H + 2r + 2) * (W + 2r) * 4 B
# per buffer — ~1.6 MB at W=584, r=10.
TILE_H = 256


def _make_kernel(taps, thresh: float, tile_h: int, out_h: int, out_w: int):
    taps = [float(t) for t in taps]

    def kernel(hm_ref, smoothed_ref, mask_ref):
        t = pl.program_id(1)
        xp = hm_ref[0, 0]            # (tile_h + 2r + 2, W + 2r)
        # rows: -> (tile_h + 2, W + 2r); row i here is blurred GLOBAL row
        # t*tile_h + i - 1 (one halo row each side for the NMS).
        acc = None
        for k, wgt in enumerate(taps):
            sl = xp[k:k + tile_h + 2, :]
            acc = sl * wgt if acc is None else acc + sl * wgt
        # cols: -> (tile_h + 2, W)
        s_ext = None
        for k, wgt in enumerate(taps):
            sl = acc[:, k:k + out_w]
            s_ext = sl * wgt if s_ext is None else s_ext + sl * wgt

        s = s_ext[1:tile_h + 1, :]   # the tile's own blurred rows
        up = s_ext[0:tile_h, :]
        down = s_ext[2:tile_h + 2, :]
        # Global zero borders: the reference compares edge pixels against
        # zero-initialized shift buffers, NOT against blurred out-of-image
        # rows (which symmetric padding would make nonzero).
        grow = t * tile_h + jax.lax.broadcasted_iota(
            jnp.int32, (tile_h, out_w), 0)
        zero = jnp.zeros_like(s)
        up = jnp.where(grow == 0, zero, up)
        down = jnp.where(grow == out_h - 1, zero, down)
        # lane shifts as rolls + edge masks (Mosaic cannot lower offset
        # lane-dim concatenates at arbitrary widths)
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, out_w), 1)
        left = jnp.where(col == 0, zero, pltpu.roll(s, 1, 1))
        right = jnp.where(col == out_w - 1, zero,
                          pltpu.roll(s, out_w - 1, 1))  # roll by -1
        mask = ((s > thresh) & (s > up) & (s > down)
                & (s > left) & (s > right))
        # rows beyond the true map height (last-tile padding) are garbage:
        # zero them in both outputs so callers can reshape-and-slice.
        in_image = grow < out_h
        smoothed_ref[0, 0] = jnp.where(in_image, s, zero)
        mask_ref[0, 0] = (mask & in_image).astype(jnp.int8)

    return kernel


def blur_nms_pallas(heatmaps: jnp.ndarray, sigma: float, thresh: float,
                    interpret: bool = False, tile_h: int = TILE_H
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """heatmaps: (J, H, W) -> (smoothed (J, H, W) f32, mask (J, H, W) bool).

    Semantics identical to ``gaussian_blur_reflect`` + ``nms_mask``.
    """
    j, h, w = heatmaps.shape
    taps = scipy_gaussian_kernel_1d(sigma)
    r = (len(taps) - 1) // 2
    tile_h = min(tile_h, max(h, 8))
    n_tiles = -(-h // tile_h)
    padded_h = n_tiles * tile_h

    xp = jnp.pad(heatmaps.astype(jnp.float32),
                 ((0, 0), (r, r), (r, r)), mode="symmetric")
    # one extra (zero) row each side: the halo row for the NMS at tile
    # boundaries; at the global edges its value is irrelevant (the kernel
    # zero-overrides there), and the bottom is padded out to the last
    # tile's full input extent.
    xp = jnp.pad(xp, ((0, 0), (1, 1 + padded_h - h), (0, 0)))

    # Materialize the overlapping input tiles: tile t needs padded rows
    # [t*tile_h, t*tile_h + tile_h + 2r + 2).
    block_rows = tile_h + 2 * r + 2
    tiles = jnp.stack([
        jax.lax.slice_in_dim(xp, t * tile_h, t * tile_h + block_rows,
                             axis=1)
        for t in range(n_tiles)], axis=1)  # (J, n_tiles, block_rows, W+2r)

    grid_spec = pl.GridSpec(
        grid=(j, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, block_rows, w + 2 * r),
                         lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_h, w), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_h, w), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    smoothed, mask = pl.pallas_call(
        _make_kernel(taps, float(thresh), tile_h, h, w),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((j, n_tiles, tile_h, w), jnp.float32),
            jax.ShapeDtypeStruct((j, n_tiles, tile_h, w), jnp.int8),
        ],
        interpret=interpret,
    )(tiles)
    smoothed = smoothed.reshape(j, padded_h, w)[:, :h]
    mask = mask.reshape(j, padded_h, w)[:, :h]
    return smoothed, mask.astype(bool)
