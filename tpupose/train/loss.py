"""Multi-stage masked MSE loss for CPM training.

Parity re-design of the reference's ``compute_loss``
(``/root/reference/train_coco_pose_estimation.py:41-73``):

* GT pafs/heatmaps are rendered at input resolution and resized to each
  stage's output shape with Chainer ``F.resize_images`` semantics
  (align-corners bilinear; all six stages share one output shape here, so
  the resize happens once instead of per stage).
* The ignore mask is resized the same way and re-binarized with ``> 0``.
* At masked pixels the GT is replaced by the *stop-gradient* prediction, so
  the squared error and its gradient vanish there (ref ``:62-63`` replaces
  GT with ``pafs_y.data`` — Chainer's detached array).
* Per-stage loss is ``mean((pred - gt)^2)`` over all elements
  (``F.mean_squared_error``), and the total is the sum over stages and both
  branches.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tpupose.ops.resize import resize_chainer


def _prepare_targets(pafs_t: jnp.ndarray, heatmaps_t: jnp.ndarray,
                     ignore_mask: jnp.ndarray, out_hw: Tuple[int, int]):
    """Resize NHWC GT maps + mask to the stage output shape.

    pafs_t: (B, H, W, 38); heatmaps_t: (B, H, W, 19); ignore_mask: (B, H, W)
    bool or float.  GT maps may already be at ``out_hw`` (rendered there
    directly, ``data.gt.render_labels_at``) while the mask still arrives at
    input resolution — each is resized by its own shape.
    """
    if pafs_t.shape[1:3] != out_hw:
        pafs_t = resize_chainer(pafs_t, out_hw)
        heatmaps_t = resize_chainer(heatmaps_t, out_hw)
    mask = _prepare_mask(ignore_mask, out_hw)
    return pafs_t, heatmaps_t, mask


def _prepare_mask(ignore_mask: jnp.ndarray,
                  out_hw: Tuple[int, int]) -> jnp.ndarray:
    if ignore_mask.shape[1:3] != out_hw:
        return resize_chainer(
            ignore_mask.astype(jnp.float32)[..., None], out_hw)[..., 0] > 0
    return ignore_mask > 0


def compute_loss(pafs_ys: jnp.ndarray, heatmaps_ys: jnp.ndarray,
                 pafs_t: jnp.ndarray, heatmaps_t: jnp.ndarray,
                 ignore_mask: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """pafs_ys/heatmaps_ys: (S, B, h, w, C) stacked stage outputs (NHWC).
    pafs_t/heatmaps_t: (B, H, W, C) GT at input resolution.
    ignore_mask: (B, H, W).

    Returns (total_loss, metrics) with per-branch stage-sum logs matching the
    reference's ``main/paf`` / ``main/heat`` reports
    (``train_coco_pose_estimation.py:118-122``).
    """
    out_hw = pafs_ys.shape[2:4]
    pafs_t, heatmaps_t, mask = _prepare_targets(
        pafs_t, heatmaps_t, ignore_mask, out_hw)
    m = mask[None, :, :, :, None]  # broadcast over stages and channels

    pafs_gt = jnp.where(m, jax.lax.stop_gradient(pafs_ys), pafs_t[None])
    heat_gt = jnp.where(m, jax.lax.stop_gradient(heatmaps_ys),
                        heatmaps_t[None])

    # mean over (B, h, w, C) per stage -> (S,)
    paf_losses = jnp.mean((pafs_ys - pafs_gt) ** 2, axis=(1, 2, 3, 4))
    heat_losses = jnp.mean((heatmaps_ys - heat_gt) ** 2, axis=(1, 2, 3, 4))

    total = jnp.sum(paf_losses) + jnp.sum(heat_losses)
    metrics = {
        "loss": total,
        "paf": jnp.sum(paf_losses),
        "heat": jnp.sum(heat_losses),
        "paf_stages": paf_losses,
        "heat_stages": heat_losses,
    }
    return total, metrics


def compute_loss_single(heatmaps_ys: jnp.ndarray, heatmaps_t: jnp.ndarray,
                        ignore_mask: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Masked multi-stage MSE for the single-branch nets (FaceNet/HandNet,
    which return ONE stacked heatmap tensor instead of a (pafs, heatmaps)
    pair).

    The reference exposes ``--arch facenet|handnet`` on its trainer but its
    loss unpacks two branches, so those choices crash at the first step
    (``train_coco_pose_estimation.py:41-73`` is pose-specific) — this
    extends the identical masked-MSE/stop-gradient semantics to the
    single-branch heads.  Metrics keep the ``paf`` key (always 0) so the
    LogReport-parity logging pipeline is arch-agnostic.

    heatmaps_ys: (S, B, h, w, C) stacked stage outputs;
    heatmaps_t: (B, H, W, C) GT at input resolution; ignore_mask: (B, H, W).
    """
    out_hw = heatmaps_ys.shape[2:4]
    if heatmaps_t.shape[1:3] != out_hw:
        heatmaps_t = resize_chainer(heatmaps_t, out_hw)
    mask = _prepare_mask(ignore_mask, out_hw)
    m = mask[None, :, :, :, None]
    heat_gt = jnp.where(m, jax.lax.stop_gradient(heatmaps_ys),
                        heatmaps_t[None])
    heat_losses = jnp.mean((heatmaps_ys - heat_gt) ** 2, axis=(1, 2, 3, 4))
    total = jnp.sum(heat_losses)
    metrics = {
        "loss": total,
        "paf": jnp.zeros_like(total),
        "heat": total,
        "paf_stages": jnp.zeros_like(heat_losses),
        "heat_stages": heat_losses,
    }
    return total, metrics
