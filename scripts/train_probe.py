"""Train-step device-time attribution from an xplane trace (VERDICT r3 #8).

``bench.py --train`` reports the authoritative step time (sequential
dispatches chained through the donated TrainState) plus a chained-scan
component split (forward / forward+backward / optimizer update) — but the
chained-scan instrument is known to under-report 20-30% on this box
(CLAUDE.md device-timing rules).  This probe is the drill-down with the
trustworthy instrument: it runs a few REAL donated-state train steps under
``jax.profiler.trace`` and reports

* per-module device time for each step variant (self-describing module
  names, same trick as ``detectors/pose.py:574``), and
* the per-op-kind share inside each step module (convolution forward +
  both gradient convs, ``select-and-scatter`` = the maxpool backward,
  epilogue/elementwise fusions, transposes/copies, the Adam update), via
  ``scripts/op_breakdown.parse_trace_ops``.

Variants: ``f32`` and ``bf16`` compute at the reference train config
(batch 10 @ 368 — ``/root/reference/train_coco_pose_estimation.py:166,210``),
plus ``bf16_remat`` to price ``jax.checkpoint`` at this config.

Usage::

    python scripts/train_probe.py                  # build+trace+parse
    python scripts/train_probe.py --parse-only     # re-parse existing dir
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from op_breakdown import parse_trace_ops  # noqa: E402


def build_batch(cfg):
    import jax.numpy as jnp
    import numpy as np

    from tpupose.train.trainer import TrainBatch, pad_poses

    B, S = cfg.batch_size, cfg.insize
    rng = np.random.RandomState(0)
    raw = rng.rand(B, 6, 18, 3).astype(np.float32)
    raw[..., 0] *= S
    raw[..., 1] *= S
    raw[..., 2] = (raw[..., 2] > 0.2).astype(np.float32) * 2
    return TrainBatch(
        imgs=jnp.asarray(rng.randint(0, 255, (B, S, S, 3), dtype=np.uint8)),
        poses=jnp.asarray(pad_poses(list(raw), cfg.max_persons)),
        ignore_mask=jnp.asarray(rng.rand(B, S, S) < 0.05),
    )


def named_step(model, tx, cfg, tag: str):
    """make_train_step with a self-describing XLA module name."""
    import jax

    from tpupose.train.trainer import TrainState, loss_for_batch

    def step_fn(state, batch):
        def loss_fn(params):
            return loss_for_batch(model, params, batch, cfg)

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), metrics

    step_fn.__name__ = f"train_step_{tag}"
    return jax.jit(step_fn, donate_argnums=(0,))


def named_components(model, tx, cfg, tag: str, state, batch):
    """Forward-loss / grad / optimizer-update as separate named modules.

    No chaining tricks needed: the xplane module clock reports each
    EXECUTION's device time, and a single TPU core runs one program at a
    time, so plain repeated dispatches of the same program are honest.
    """
    import jax
    import jax.numpy as jnp

    from tpupose.train.trainer import loss_for_batch

    # Deep-copy the operands: the step loop DONATES ``state`` on its first
    # call, which would invalidate buffers these thunks capture.
    params0 = jax.tree_util.tree_map(jnp.array, state.params)
    opt0 = jax.tree_util.tree_map(jnp.array, state.opt_state)

    def fwd(params, b):
        return loss_for_batch(model, params, b, cfg)[0]

    fwd.__name__ = f"train_fwdloss_{tag}"

    def grad(params, b):
        return jax.grad(
            lambda p: loss_for_batch(model, p, b, cfg)[0])(params)

    grad.__name__ = f"train_grad_{tag}"

    def update(grads, opt_state, params):
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), params, updates)
        return new_params, new_opt

    update.__name__ = f"train_update_{tag}"

    jfwd, jgrad, jupd = jax.jit(fwd), jax.jit(grad), jax.jit(update)
    grads0 = jgrad(params0, batch)  # compile grad + real operand
    return [
        (f"train_fwdloss_{tag}", lambda: jfwd(params0, batch)),
        (f"train_grad_{tag}", lambda: jgrad(params0, batch)),
        (f"train_update_{tag}", lambda: jupd(grads0, opt0, params0)),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/train_probe")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--variants", default="bf16,bf16_remat")
    ap.add_argument("--components", default="bf16",
                    help="comma list of variants that ALSO get separate "
                         "fwd/grad/update component modules traced")
    args = ap.parse_args()

    if not args.parse_only:
        import dataclasses

        import jax
        import jax.numpy as jnp
        import numpy as np

        from tpupose.config import TRAIN
        from tpupose.models import ARCHS
        from tpupose.train.trainer import init_train_state
        from tpupose.utils.profiling import trace

        comp_tags = {v.strip() for v in args.components.split(",")
                     if v.strip()}
        batch = build_batch(TRAIN)
        runs = []        # (tag, step, state)
        components = []  # (name, thunk)
        for tag in [v.strip() for v in args.variants.split(",") if v.strip()]:
            dtype = jnp.float32 if tag.startswith("f32") else jnp.bfloat16
            cfg = (dataclasses.replace(TRAIN, remat=True)
                   if tag.endswith("remat") else TRAIN)
            model = ARCHS["posenet"](dtype=dtype)
            state, tx = init_train_state(model, cfg)
            step = named_step(model, tx, cfg, tag)
            state, _ = step(state, batch)       # compile + donate initial
            np.asarray(jax.device_get(state.step))
            if tag in comp_tags:
                components += named_components(
                    model, tx, cfg, tag, state, batch)
            runs.append((tag, step, state))
        for _, thunk in components:             # compile outside the trace
            np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(thunk())[0]))
        with trace(args.trace_dir):
            for i, (tag, step, state) in enumerate(runs):
                for _ in range(args.steps):
                    state, metrics = step(state, batch)
                # real sync per variant: force the transfer (CLAUDE.md)
                np.asarray(jax.device_get(state.step))
                runs[i] = (tag, step, state)
            for name, thunk in components:
                out = None
                for _ in range(args.steps):
                    out = thunk()
                np.asarray(jax.device_get(
                    jax.tree_util.tree_leaves(out)[0]))

    ops = parse_trace_ops(args.trace_dir, top=18)
    print(json.dumps(
        {m: v for m, v in ops.items() if "train_" in m}, indent=1))


if __name__ == "__main__":
    main()
