"""pjit data-parallel trainer: train state, step functions, validation.

TPU-native replacement for the reference's Chainer ``Updater`` / ``Trainer``
(``/root/reference/train_coco_pose_estimation.py:85-126, 190-277``): a pure
functional train step jitted once over a device mesh, with

* batch sharded over the ``data`` mesh axis (and optionally image height
  over ``spatial``) — gradients are reduced by XLA-inserted ``psum`` over
  ICI, replacing nothing in the reference (it is single-device);
* GT heatmap/PAF rendering fused INTO the jitted step on device
  (the reference renders them with NumPy in data-worker processes,
  ``coco_data_loader.py:334-341``) — the host only ships images, pose
  tables and ignore masks;
* reference-parity loss, optimizer, LR schedule, stem freeze/scaling
  (see ``tpupose.train.loss`` / ``tpupose.train.optimizer``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh

from tpupose.config import TRAIN, TrainConfig
from tpupose.data.gt import render_labels
from tpupose.parallel import mesh as meshlib
from tpupose.train.loss import compute_loss, compute_loss_single
from tpupose.train.optimizer import make_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


@struct.dataclass
class TrainBatch:
    """Device-side batch.  ``imgs`` uint8 (B, H, W, 3) BGR as the reference
    loads them; ``poses`` (B, P, 18, 3) float32 padded pose tables (v=0 rows
    are unlabeled); ``ignore_mask`` (B, H, W) bool."""

    imgs: jnp.ndarray
    poses: jnp.ndarray
    ignore_mask: jnp.ndarray


def preprocess_imgs(imgs_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 NHWC -> float NHWC, /255 - 0.5 (ref ``:76-82``; layout stays
    NHWC for the MXU instead of the reference's NCHW transpose)."""
    return imgs_u8.astype(jnp.float32) / 255.0 - 0.5


def init_train_state(model, cfg: TrainConfig = TRAIN, arch: str = "posenet",
                     rng: Optional[jax.Array] = None,
                     params: Any = None,
                     insize: Optional[int] = None) -> Tuple[TrainState, Any]:
    """Create (state, tx).  ``params`` may come from a warm start
    (``--initmodel`` parity) else fresh init."""
    insize = insize or cfg.insize
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, insize, insize, 3), jnp.float32)
        params = model.init(rng, dummy)["params"]
    tx = make_optimizer(params, cfg, arch=arch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )
    return state, tx


def _render_batch_labels(batch: TrainBatch, cfg: TrainConfig,
                         out_hw: Optional[Tuple[int, int]] = None):
    """vmap the on-device GT renderers over the batch; returns NHWC maps.

    With ``out_hw`` the maps are rendered directly at the stage output
    resolution (``data.gt.render_labels_at`` — numerically the reference's
    full-res render + align-corners downsample, minus the full-res
    intermediate)."""
    from tpupose.data.gt import render_labels_at

    h, w = batch.imgs.shape[1:3]

    def per_sample(poses):
        if out_hw is not None and tuple(out_hw) != (h, w):
            pafs, heatmaps = render_labels_at(
                poses, h, w, tuple(out_hw), cfg.heatmap_sigma, cfg.paf_sigma)
        else:
            pafs, heatmaps = render_labels(
                poses, h, w, cfg.heatmap_sigma, cfg.paf_sigma)
        # channel-first (C, H, W) -> NHWC for the loss
        return (jnp.transpose(pafs, (1, 2, 0)),
                jnp.transpose(heatmaps, (1, 2, 0)))

    return jax.vmap(per_sample)(batch.poses)


def _render_batch_heatmaps(batch: TrainBatch, cfg: TrainConfig,
                           out_hw: Optional[Tuple[int, int]] = None):
    """Heatmap-only GT for the single-branch nets: batch.poses carries
    (B, P, K, 3) keypoint tables (K = 70 face / 21 hand) and the renderer
    emits K+1 channels matching the net output."""
    from tpupose.data.gt import render_heatmaps, render_heatmaps_at

    h, w = batch.imgs.shape[1:3]

    def per_sample(poses):
        if out_hw is not None and tuple(out_hw) != (h, w):
            heatmaps = render_heatmaps_at(
                poses, h, w, tuple(out_hw), cfg.heatmap_sigma)
        else:
            heatmaps = render_heatmaps(poses, h, w, cfg.heatmap_sigma)
        return jnp.transpose(heatmaps, (1, 2, 0))

    return jax.vmap(per_sample)(batch.poses)


def loss_for_batch(model, params, batch: TrainBatch, cfg: TrainConfig):
    x = preprocess_imgs(batch.imgs)

    def forward(params, x):
        return model.apply({"params": params}, x)

    if cfg.remat:
        # Recompute activations in the backward pass (jax.checkpoint):
        # HBM for the ~100-conv graph drops from O(all activations) to
        # O(one stage), letting batch/resolution scale well past the
        # reference's batch 10 @ 368 on a single chip.
        forward = jax.checkpoint(forward)
    outs = forward(params, x)
    if isinstance(outs, tuple):
        # two-branch CocoPoseNet: (stacked pafs, stacked heatmaps)
        pafs_ys, heatmaps_ys = outs
        out_hw = tuple(pafs_ys.shape[2:4]) if cfg.gt_at_output_res else None
        pafs_t, heatmaps_t = _render_batch_labels(batch, cfg, out_hw=out_hw)
        return compute_loss(pafs_ys, heatmaps_ys, pafs_t, heatmaps_t,
                            batch.ignore_mask)
    # single-branch FaceNet/HandNet: one stacked heatmap tensor (the
    # reference trainer crashes on these archs; see compute_loss_single)
    out_hw = tuple(outs.shape[2:4]) if cfg.gt_at_output_res else None
    heatmaps_t = _render_batch_heatmaps(batch, cfg, out_hw=out_hw)
    return compute_loss_single(outs, heatmaps_t, batch.ignore_mask)


def make_train_step(model, tx, cfg: TrainConfig = TRAIN,
                    mesh: Optional[Mesh] = None, donate: bool = True):
    """Build the jitted train step.  With a mesh, params/opt-state are
    replicated and the batch is sharded (data, spatial)."""

    def step_fn(state: TrainState, batch: TrainBatch):
        def loss_fn(params):
            total, metrics = loss_for_batch(model, params, batch, cfg)
            return total, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt)
        return new_state, metrics

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        repl = meshlib.replicated(mesh)
        batch_sh = TrainBatch(
            imgs=meshlib.batch_sharding(mesh),
            poses=meshlib.data_only_sharding(mesh),
            ignore_mask=meshlib.batch_sharding(mesh),
        )
        return jax.jit(step_fn,
                       in_shardings=(repl, batch_sh),
                       out_shardings=(repl, repl),
                       **kwargs)
    return jax.jit(step_fn, **kwargs)


def make_eval_step(model, cfg: TrainConfig = TRAIN,
                   mesh: Optional[Mesh] = None):
    """Jitted validation loss (ref ``Validator.evaluate``, ``:129-159``)."""

    def eval_fn(params, batch: TrainBatch):
        _, metrics = loss_for_batch(model, params, batch, cfg)
        return metrics

    if mesh is not None:
        repl = meshlib.replicated(mesh)
        batch_sh = TrainBatch(
            imgs=meshlib.batch_sharding(mesh),
            poses=meshlib.data_only_sharding(mesh),
            ignore_mask=meshlib.batch_sharding(mesh),
        )
        return jax.jit(eval_fn, in_shardings=(repl, batch_sh),
                       out_shardings=repl)
    return jax.jit(eval_fn)


def pad_poses(pose_list, max_persons: int,
              num_keypoints: int = 18) -> np.ndarray:
    """Host helper: list of (P_i, K, 3) arrays -> (B, max_persons, K, 3)
    with zero rows (v=0 => ignored by the renderers).  K defaults to the
    18-joint pose schema; single-branch crop datasets pass 70/21."""
    batch = np.zeros((len(pose_list), max_persons, num_keypoints, 3),
                     np.float32)
    for i, poses in enumerate(pose_list):
        n = min(len(poses), max_persons)
        if n:
            batch[i, :n] = poses[:n]
    return batch
