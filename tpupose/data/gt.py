"""On-device ground-truth rendering: poses -> heatmaps / PAFs / masks.

TPU-native re-design of the reference's per-sample NumPy grid loops
(``/root/reference/coco_data_loader.py:208-268``): the same math expressed as
dense, fixed-shape jnp broadcasts over a static ``max_persons`` pose table so
a whole batch of GT maps is rendered by one fused XLA program (vmap over the
batch) instead of Python loops in data-worker processes.

Semantics match the reference exactly:

* heatmap per joint = max over persons of ``exp(-0.5 d^2 / sigma^2)``;
  background channel = ``1 - max`` over all joints/persons
  (``coco_data_loader.py:216-229``).
* PAF per limb = constant unit vector inside the rotated rectangle of
  half-width ``paf_sigma`` around the segment, averaged where limbs of
  different persons overlap, with the reference's nonzero-component counting
  quirk (``:232-268``; a limb whose unit vector has a zero x or y component
  contributes to the count only where the other component is nonzero).
* zero-length limbs contribute nothing (``:233-234``).

Coordinates use the reference's pixel-grid convention: pixel centers at
integer coordinates, ``grid_x = arange(W)``, ``grid_y = arange(H)``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.config import LIMBS, LIMBS_FROM, LIMBS_TO, NUM_JOINTS

_LIMB_FROM = LIMBS_FROM
_LIMB_TO = LIMBS_TO

# A "grid" is the pair (gx (1, W'), gy (H', 1)) of float32 pixel coordinates
# the analytic maps are evaluated at.  The default is the full integer pixel
# grid (reference convention); ``render_*_at`` passes the sparse sub-grid of
# fine rows/cols the align-corners bilinear downsample actually reads.
Grid = Tuple[jnp.ndarray, jnp.ndarray]


def _grids(height: int, width: int) -> Grid:
    gx = jnp.arange(width, dtype=jnp.float32)[None, :]    # (1, W)
    gy = jnp.arange(height, dtype=jnp.float32)[:, None]   # (H, 1)
    return gx, gy


def render_heatmaps(poses: jnp.ndarray, height: int, width: int,
                    sigma: float, grid: Optional[Grid] = None) -> jnp.ndarray:
    """poses: (P, K, 3) float32 ``[x, y, v]`` rows (v>0 = labeled).

    Returns (K+1, H, W) float32 — K keypoint channels + background
    (ref ``coco_data_loader.py:216-229``).  K is 18 for the pose net; the
    same renderer serves the single-branch nets' crop GT (70 face / 21
    hand keypoints + background, matching their output channel layout).
    With ``grid`` the maps are evaluated at those coordinates instead of the
    full (height, width) pixel grid.
    """
    gx, gy = grid if grid is not None else _grids(height, width)
    height, width = gy.shape[0], gx.shape[1]
    if poses.shape[0] == 0:  # no people: all-background map
        return jnp.concatenate(
            [jnp.zeros((poses.shape[1], height, width), jnp.float32),
             jnp.ones((1, height, width), jnp.float32)], axis=0)
    x = poses[:, :, 0][:, :, None, None]       # (P, J, 1, 1)
    y = poses[:, :, 1][:, :, None, None]
    v = poses[:, :, 2][:, :, None, None] > 0
    d2 = (gx[None, None] - x) ** 2 + (gy[None, None] - y) ** 2
    g = jnp.exp(-0.5 * d2 / (sigma * sigma))
    g = jnp.where(v, g, 0.0)                    # (P, J, H, W)
    heatmaps = jnp.max(g, axis=0)               # (J, H, W)
    bg = 1.0 - jnp.max(heatmaps, axis=0)        # (H, W)
    return jnp.concatenate([heatmaps, bg[None]], axis=0)


def render_pafs(poses: jnp.ndarray, height: int, width: int,
                paf_width: float, grid: Optional[Grid] = None) -> jnp.ndarray:
    """poses: (P, 18, 3) -> (38, H, W) float32 part-affinity fields
    (ref ``coco_data_loader.py:232-268``; limb i in channels 2i, 2i+1).
    With ``grid`` the fields are evaluated at those coordinates instead of
    the full (height, width) pixel grid.
    """
    gx, gy = grid if grid is not None else _grids(height, width)
    height, width = gy.shape[0], gx.shape[1]
    if poses.shape[0] == 0:  # no people: zero fields
        return jnp.zeros((2 * len(LIMBS), height, width), jnp.float32)
    limb_from = jnp.asarray(_LIMB_FROM)
    limb_to = jnp.asarray(_LIMB_TO)

    jf = poses[:, limb_from]                    # (P, L, 3)
    jt = poses[:, limb_to]
    valid = (jf[..., 2] > 0) & (jt[..., 2] > 0)  # (P, L)

    dx = jt[..., 0] - jf[..., 0]
    dy = jt[..., 1] - jf[..., 1]
    dist = jnp.sqrt(dx * dx + dy * dy)
    nonzero = dist > 0
    valid = valid & nonzero
    safe = jnp.where(nonzero, dist, 1.0)
    ux, uy = dx / safe, dy / safe               # (P, L)
    # Perpendicular via the reference's rot(pi/2) matrix [[c, s], [-s, c]]:
    # v_perp = (uy, -ux) (``coco_data_loader.py:238-240``).
    px_, py_ = uy, -ux

    rx = gx[None, None] - jf[..., 0][:, :, None, None]   # (P, L, H, W)
    ry = gy[None, None] - jf[..., 1][:, :, None, None]
    horiz = ux[:, :, None, None] * rx + uy[:, :, None, None] * ry
    vert = px_[:, :, None, None] * rx + py_[:, :, None, None] * ry
    flag = (
        (horiz >= 0.0)
        & (horiz <= dist[:, :, None, None])
        & (jnp.abs(vert) <= paf_width)
        & valid[:, :, None, None]
    )                                            # (P, L, H, W)

    paf_x = jnp.where(flag, ux[:, :, None, None], 0.0)
    paf_y = jnp.where(flag, uy[:, :, None, None], 0.0)
    # Reference counting quirk (``:262-263``): each person-limb adds
    # (x_nonzero | y_nonzero) to the per-pixel count — identical to ``flag``
    # except where the unit vector is exactly axis-aligned; there the
    # zero-component channel stays 0 but the count still increments, which
    # ``flag`` reproduces because the other component is nonzero inside the
    # band.  Exactly-zero unit vectors cannot occur (dist > 0).
    count = jnp.sum(flag, axis=0).astype(jnp.float32)     # (L, H, W)
    sum_x = jnp.sum(paf_x, axis=0)
    sum_y = jnp.sum(paf_y, axis=0)
    safe_count = jnp.where(count > 0, count, 1.0)
    paf = jnp.stack([sum_x / safe_count, sum_y / safe_count], axis=1)
    return paf.reshape(2 * len(LIMBS), height, width)


def render_labels(poses: jnp.ndarray, height: int, width: int,
                  heatmap_sigma: float, paf_sigma: float):
    """Render (pafs, heatmaps) for one sample; NHWC-friendly channel-first
    maps matching the reference trainer's GT layout
    (``train_coco_pose_estimation.py:109``)."""
    heatmaps = render_heatmaps(poses, height, width, heatmap_sigma)
    pafs = render_pafs(poses, height, width, paf_sigma)
    return pafs, heatmaps


# ---------------------------------------------------------------------------
# Direct rendering at the stage output resolution
# ---------------------------------------------------------------------------
#
# The reference renders GT at input resolution and lets the loss bilinearly
# downsample it to the stage output shape (``coco_data_loader.py:334-341`` +
# ``train_coco_pose_estimation.py:56-60``).  Because the downsample is
# align-corners bilinear, each output pixel reads at most 2x2 *integer*
# fine-grid points — so evaluating the analytic maps only at the union of
# fine rows/cols the resize reads and applying the same interpolation
# weights is numerically the resize of the full-resolution render, minus the
# (C, H, W) materialization (368² -> ~92² evaluation points at stride 8).


@functools.lru_cache(maxsize=64)
def _output_res_grid(in_size: int, out_size: int):
    """(fine_coords (N,), weights (out, N)) — the align-corners bilinear
    matrix restricted to its nonzero columns."""
    from tpupose.ops.resize import _linear_matrix_align_corners

    m = _linear_matrix_align_corners(in_size, out_size)
    cols = np.nonzero(m.any(axis=0))[0]
    return cols.astype(np.float32), m[:, cols].copy()


def _subgrid_weights(height: int, width: int, out_hw: Tuple[int, int]):
    ys, wh = _output_res_grid(height, out_hw[0])
    xs, ww = _output_res_grid(width, out_hw[1])
    grid = (jnp.asarray(xs)[None, :], jnp.asarray(ys)[:, None])
    return grid, jnp.asarray(wh), jnp.asarray(ww)


def _combine(maps: jnp.ndarray, wh: jnp.ndarray,
             ww: jnp.ndarray) -> jnp.ndarray:
    """(C, Ny, Nx) sub-grid maps -> (C, out_h, out_w) via the restricted
    bilinear weights (HIGHEST to match ``ops.resize.resize_chainer``)."""
    return jnp.einsum("oy,cyx,px->cop", wh, maps, ww,
                      precision=jax.lax.Precision.HIGHEST)


def render_heatmaps_at(poses: jnp.ndarray, height: int, width: int,
                       out_hw: Tuple[int, int], sigma: float) -> jnp.ndarray:
    """``resize_chainer(render_heatmaps(...), out_hw)`` without the full-res
    intermediate (equal up to summation order, ~1e-7)."""
    grid, wh, ww = _subgrid_weights(height, width, out_hw)
    return _combine(render_heatmaps(poses, height, width, sigma, grid=grid),
                    wh, ww)


def render_pafs_at(poses: jnp.ndarray, height: int, width: int,
                   out_hw: Tuple[int, int], paf_width: float) -> jnp.ndarray:
    """``resize_chainer(render_pafs(...), out_hw)`` without the full-res
    intermediate (the per-pixel overlap average commutes with pointwise
    evaluation, so sum/count happen at the sub-grid points)."""
    grid, wh, ww = _subgrid_weights(height, width, out_hw)
    return _combine(render_pafs(poses, height, width, paf_width, grid=grid),
                    wh, ww)


def render_labels_at(poses: jnp.ndarray, height: int, width: int,
                     out_hw: Tuple[int, int], heatmap_sigma: float,
                     paf_sigma: float):
    """Render (pafs, heatmaps) directly at the stage output resolution."""
    grid, wh, ww = _subgrid_weights(height, width, out_hw)
    heatmaps = render_heatmaps(poses, height, width, heatmap_sigma, grid=grid)
    pafs = render_pafs(poses, height, width, paf_sigma, grid=grid)
    return _combine(pafs, wh, ww), _combine(heatmaps, wh, ww)


# ---------------------------------------------------------------------------
# NumPy oracle (reference-exact, dynamic shapes) for parity tests
# ---------------------------------------------------------------------------


def render_heatmaps_numpy(poses: np.ndarray, height: int, width: int,
                          sigma: float) -> np.ndarray:
    """Direct transcription of the reference loop semantics for testing."""
    heatmaps = np.zeros((NUM_JOINTS + 1, height, width), np.float32)
    sum_heatmap = np.zeros((height, width))
    gx = np.tile(np.arange(width), (height, 1))
    gy = np.tile(np.arange(height), (width, 1)).T
    for j in range(NUM_JOINTS):
        heatmap = np.zeros((height, width))
        for pose in poses:
            if pose[j, 2] > 0:
                d2 = (gx - pose[j, 0]) ** 2 + (gy - pose[j, 1]) ** 2
                jm = np.exp(-0.5 * d2 / sigma**2)
                heatmap = np.maximum(heatmap, jm)
                sum_heatmap = np.maximum(sum_heatmap, jm)
        heatmaps[j] = heatmap
    heatmaps[-1] = 1.0 - sum_heatmap
    return heatmaps


def render_pafs_numpy(poses: np.ndarray, height: int, width: int,
                      paf_width: float) -> np.ndarray:
    gx = np.tile(np.arange(width), (height, 1))
    gy = np.tile(np.arange(height), (width, 1)).T
    pafs = np.zeros((0, height, width))
    for (a, b) in LIMBS:
        paf = np.zeros((2, height, width))
        flags = np.zeros(paf.shape)
        for pose in poses:
            jf, jt = pose[a], pose[b]
            if jf[2] > 0 and jt[2] > 0:
                if np.array_equal(jf[:2], jt[:2]):
                    continue
                dist = np.linalg.norm(jt[:2].astype(float) - jf[:2])
                u = (jt[:2].astype(float) - jf[:2]) / dist
                vp = np.array([u[1], -u[0]])
                horiz = u[0] * (gx - jf[0]) + u[1] * (gy - jf[1])
                vert = vp[0] * (gx - jf[0]) + vp[1] * (gy - jf[1])
                flag = (horiz >= 0) & (horiz <= dist) & (np.abs(vert)
                                                         <= paf_width)
                limb_paf = np.stack([flag, flag]) * u[:, None, None]
                limb_flags = limb_paf != 0
                flags += np.broadcast_to(limb_flags[0] | limb_flags[1],
                                         limb_paf.shape)
                paf += limb_paf
        paf[flags > 0] /= flags[flags > 0]
        pafs = np.vstack((pafs, paf))
    return pafs.astype(np.float32)
