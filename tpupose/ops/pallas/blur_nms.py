"""Pallas TPU kernel: fused Gaussian blur + 4-neighbor peak NMS.

The peak path (``tpupose/ops/peaks.py``, reference semantics
``/root/reference/pose_detector.py:75-110``) is several HBM round trips
when expressed as separate XLA ops: pad -> row conv -> col conv ->
4 shifted compares -> threshold.  This kernel keeps one joint channel's
(symmetrically pre-padded) heatmap resident in VMEM and does everything
in a single pass:

* separable Gaussian evaluated as unrolled VPU multiply-adds over
  statically shifted slices — float32 exact, so results match the
  XLA/SciPy CPU parity path bit-for-bit (an MXU matmul formulation would
  run through bf16 passes and perturb values by ~1e-3, enough to flip NMS
  comparisons);
* strict-greater 4-neighbor NMS with zero borders (VPU selects).

The symmetric-reflect padding itself happens OUTSIDE the kernel with
``jnp.pad(mode="symmetric")``: Mosaic has no lowering for ``lax.rev``/
gathers needed to mirror in-kernel, and the pad is a trivially fused XLA
data movement.  Padding both axes up front is exact: column padding
commutes with the row blur (the blur acts per-column identically).

Grid: one program per joint channel; blocks are whole padded (H+2r, W+2r)
maps (pose maps are ~46x62 to ~368x640 — comfortably within the ~16 MB
VMEM budget).  Falls back to interpreter mode off-TPU so CPU tests
exercise the same code.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpupose.ops.gaussian import scipy_gaussian_kernel_1d


def _make_kernel(taps, thresh: float, out_h: int, out_w: int):
    taps = [float(t) for t in taps]

    def kernel(hm_ref, smoothed_ref, mask_ref):
        xp = hm_ref[0]                       # (H + 2r, W + 2r)
        # rows: (H+2r, W+2r) -> (H, W+2r)
        acc = None
        for t, wgt in enumerate(taps):
            sl = xp[t:t + out_h, :]
            acc = sl * wgt if acc is None else acc + sl * wgt
        # cols: (H, W+2r) -> (H, W)
        s = None
        for t, wgt in enumerate(taps):
            sl = acc[:, t:t + out_w]
            s = sl * wgt if s is None else s + sl * wgt

        zero_row = jnp.zeros((1, out_w), s.dtype)
        zero_col = jnp.zeros((out_h, 1), s.dtype)
        up = jnp.concatenate([zero_row, s[:-1, :]], axis=0)
        down = jnp.concatenate([s[1:, :], zero_row], axis=0)
        left = jnp.concatenate([zero_col, s[:, :-1]], axis=1)
        right = jnp.concatenate([s[:, 1:], zero_col], axis=1)
        mask = ((s > thresh) & (s > up) & (s > down)
                & (s > left) & (s > right))
        smoothed_ref[0] = s
        mask_ref[0] = mask.astype(jnp.int8)

    return kernel


def blur_nms_pallas(heatmaps: jnp.ndarray, sigma: float, thresh: float,
                    interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """heatmaps: (J, H, W) -> (smoothed (J, H, W) f32, mask (J, H, W) bool).

    Semantics identical to ``gaussian_blur_reflect`` + ``nms_mask``.
    """
    j, h, w = heatmaps.shape
    taps = scipy_gaussian_kernel_1d(sigma)
    r = (len(taps) - 1) // 2
    xp = jnp.pad(heatmaps.astype(jnp.float32),
                 ((0, 0), (r, r), (r, r)), mode="symmetric")

    grid_spec = pl.GridSpec(
        grid=(j,),
        in_specs=[
            pl.BlockSpec((1, h + 2 * r, w + 2 * r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    smoothed, mask = pl.pallas_call(
        _make_kernel(taps, float(thresh), h, w),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((j, h, w), jnp.float32),
            jax.ShapeDtypeStruct((j, h, w), jnp.int8),
        ],
        interpret=interpret,
    )(xp)
    return smoothed, mask.astype(bool)
