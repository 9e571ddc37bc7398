"""Optimizer assembly: Adam + stem grad scaling + stem freeze + LR schedule.

Reference semantics (``/root/reference/train_coco_pose_estimation.py``):

* Adam(alpha=1e-4, beta1=0.9, beta2=0.999, eps=1e-8) (``:210``).
* ``GradientScaling`` hook multiplies the raw gradients of the 12 stem
  layers (conv1_1..conv4_2, conv4_3_CPM, conv4_4_CPM) by 1/4 *before* the
  Adam update rule (``:25-38, 213-217``; Chainer hooks run pre-update).
* The 10 VGG layers conv1_1..conv4_2 are frozen (``disable_update``) until
  iteration 2000 (``:219-225, 94-100``).  In Chainer the per-param update
  rule simply never runs, so its Adam moments AND its step count stay zero
  until unfreezing; this is replicated with a ``delayed`` wrapper around a
  separate masked ``scale_by_adam`` whose internal count only starts at the
  unfreeze step — not by zeroing gradients (which would desynchronize Adam
  bias correction from the reference).
* alpha drops to 1e-5 at iteration 100k and 1e-6 at 200k (``:102-105``) —
  a global piecewise-constant schedule on the *global* step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from tpupose.config import TrainConfig

# Reference layer lists (``train_coco_pose_estimation.py:214-216, 222-223``).
GRAD_SCALE_LAYERS = (
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3", "conv3_4",
    "conv4_1", "conv4_2", "conv4_3_CPM", "conv4_4_CPM",
)
FREEZE_LAYERS = (
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3", "conv3_4",
    "conv4_1", "conv4_2",
)


def _label_tree(params: Any, layer_names, yes: str, no: str):
    """Label every leaf by whether it lives under ``stem/<layer>`` for one of
    ``layer_names``."""
    names = set(layer_names)

    def label(path, _leaf):
        keys = [getattr(p, "key", None) for p in path]
        if len(keys) >= 2 and keys[0] == "stem" and keys[1] in names:
            return yes
        return no

    return jax.tree_util.tree_map_with_path(label, params)


def scale_stem_grads(params_template: Any,
                     scale: float) -> optax.GradientTransformation:
    """Multiply stem-layer grads by ``scale`` (GradientScaling hook parity)."""
    labels = _label_tree(params_template, GRAD_SCALE_LAYERS, "stem", "rest")

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        scaled = jax.tree_util.tree_map(
            lambda lbl, g: g * scale if lbl == "stem" else g, labels, updates)
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_chainer_adam(b1: float, b2: float,
                          eps: float) -> optax.GradientTransformation:
    """Adam with Chainer's update rule
    ``alpha_t * m / (sqrt(v) + eps)`` where
    ``alpha_t = sqrt(1 - b2^t) / (1 - b1^t)`` (``chainer.optimizers.Adam``).

    optax's ``scale_by_adam`` computes ``m_hat / (sqrt(v_hat) + eps)``
    instead, which is equivalent to an effective epsilon of
    ``eps * sqrt(1 - b2^t)`` — ~31x smaller at step 1 for b2=0.999 — so
    early updates of near-zero-variance parameters would diverge from the
    reference trainer.
    """

    def init_fn(params):
        return {
            "count": jnp.zeros((), jnp.int32),
            "m": jax.tree_util.tree_map(jnp.zeros_like, params),
            "v": jax.tree_util.tree_map(jnp.zeros_like, params),
        }

    def update_fn(updates, state, params=None):
        del params
        count = state["count"] + 1
        m = jax.tree_util.tree_map(
            lambda mu, g: b1 * mu + (1 - b1) * g, state["m"], updates)
        v = jax.tree_util.tree_map(
            lambda nu, g: b2 * nu + (1 - b2) * (g * g), state["v"],
            updates)
        t = count.astype(jnp.float32)
        alpha_t = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        new_updates = jax.tree_util.tree_map(
            lambda mu, nu: alpha_t * mu / (jnp.sqrt(nu) + eps), m, v)
        return new_updates, {"count": count, "m": m, "v": v}

    return optax.GradientTransformation(init_fn, update_fn)


def delayed(inner: optax.GradientTransformation,
            start_step: int) -> optax.GradientTransformation:
    """No-op (zero updates, untouched inner state) until ``start_step``.

    Mirrors Chainer ``disable_update``: while frozen, the wrapped rule never
    runs, so moments and bias-correction counts stay at zero and resume as
    if training had just begun at the unfreeze step.
    """

    def init_fn(params):
        return {"count": jnp.zeros((), jnp.int32), "inner": inner.init(params)}

    def update_fn(updates, state, params=None):
        def frozen(_):
            zeros = jax.tree_util.tree_map(jnp.zeros_like, updates)
            return zeros, state["inner"]

        def live(_):
            return inner.update(updates, state["inner"], params)

        new_updates, new_inner = jax.lax.cond(
            state["count"] >= start_step, live, frozen, None)
        return new_updates, {"count": state["count"] + 1, "inner": new_inner}

    return optax.GradientTransformation(init_fn, update_fn)


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """1e-4 -> 1e-5 @100k -> 1e-6 @200k (ref ``:102-105``)."""
    return optax.piecewise_constant_schedule(
        init_value=cfg.lr,
        boundaries_and_scales={s: cfg.lr_drop_factor
                               for s in cfg.lr_drop_steps},
    )


def make_optimizer(params_template: Any, cfg: TrainConfig,
                   arch: str = "posenet",
                   schedule: Optional[optax.Schedule] = None
                   ) -> optax.GradientTransformation:
    """Full reference-parity optimizer for one of the three archs.

    Only ``posenet`` gets the stem grad scaling + freeze (the reference
    guards both with ``args.arch == 'posenet'``, ``:196, 213, 221``).
    """
    if schedule is None:
        schedule = make_lr_schedule(cfg)

    adam = scale_by_chainer_adam(
        b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.adam_eps)

    parts = []
    if arch == "posenet":
        parts.append(scale_stem_grads(params_template, cfg.stem_grad_scale))
        freeze_labels = _label_tree(
            params_template, FREEZE_LAYERS, "frozen", "live")
        parts.append(optax.multi_transform(
            {"frozen": delayed(adam, cfg.stem_freeze_steps), "live": adam},
            freeze_labels))
    else:
        parts.append(adam)
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
