"""Checkpoint / resume: orbax train-state snapshots + npz model exports.

Reference behavior (``/root/reference/train_coco_pose_estimation.py:252-266``
and SURVEY.md section 5): a full trainer snapshot plus a model-only
``model_iter_{N}`` file every ``snapshot_interval`` iterations, ``--resume``
restoring the full state and ``--initmodel`` warm-starting weights only.

TPU-native equivalents:
* full state (params + optimizer moments + step) -> orbax
  ``StandardCheckpointer`` under ``<out>/ckpt/<step>``;
* model-only export -> the Chainer-compatible ``.npz``
  (``tpupose.weights.save_npz_params``) so reference tooling can read
  checkpoints trained here, and vice versa.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from tpupose.train.trainer import TrainState
from tpupose.weights.chainer_npz import save_npz_params


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(out_dir: str, state: TrainState) -> str:
    """Write a full train-state snapshot; returns its path."""
    step = int(np.asarray(state.step))
    path = os.path.abspath(os.path.join(out_dir, "ckpt", f"{step}"))
    ckptr = _checkpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(out_dir: str) -> Optional[str]:
    root = os.path.join(out_dir, "ckpt")
    if not os.path.isdir(root):
        return None
    steps = [int(d) for d in os.listdir(root) if d.isdigit()]
    if not steps:
        return None
    return os.path.join(root, str(max(steps)))


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore a snapshot saved by ``save_checkpoint``; ``template`` supplies
    the pytree structure/shapes (an initialized state)."""
    ckptr = _checkpointer()
    restored = ckptr.restore(path, jax.device_get(template))
    return jax.tree_util.tree_map(lambda x: x, restored)


def export_model_npz(out_dir: str, state: TrainState,
                     name: Optional[str] = None) -> str:
    """Model-only export: ``model_iter_{N}.npz`` (Chainer-compatible)."""
    step = int(np.asarray(state.step))
    name = name or f"model_iter_{step}.npz"
    path = os.path.join(out_dir, name)
    os.makedirs(out_dir, exist_ok=True)
    save_npz_params(path, jax.device_get(state.params))
    return path
