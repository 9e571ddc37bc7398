"""Training CLI — the reference's ``train_coco_pose_estimation.py`` app.

Same flags and schedule (``/root/reference/train_coco_pose_estimation.py:
162-187``), rebuilt on the pjit trainer: sharded device mesh instead of
``--gpu``, process-pool loader instead of MultiprocessIterator, orbax +
Chainer-npz snapshots, JSON LogReport-parity logging.

Usage:
  python -m tpupose.apps.train_cli --coco_dir /data/coco --out result/run1 \
      --batchsize 10 --iteration 300000 --loaderjob 4
  python -m tpupose.apps.train_cli --test --coco_dir ...   # 10-iter smoke
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train pose estimation (TPU)")
    p.add_argument("--arch", "-a", default="posenet",
                   choices=("posenet", "facenet", "handnet"))
    p.add_argument("--batchsize", "-B", type=int, default=10)
    p.add_argument("--valbatchsize", "-b", type=int, default=4)
    p.add_argument("--val_samples", type=int, default=100)
    p.add_argument("--iteration", "-i", type=int, default=300000)
    p.add_argument("--initmodel", help="warm-start weights (.npz)")
    p.add_argument("--vgg", help="warm-start the VGG-19 stem from a Caffe "
                   "VGG release (.caffemodel; copy_vgg_params parity)")
    p.add_argument("--loaderjob", "-j", type=int, default=0,
                   help="number of data-loading worker processes")
    p.add_argument("--resume", "-r", default="",
                   help="resume from checkpoint dir (or 'auto')")
    p.add_argument("--out", "-o", default="result/test")
    p.add_argument("--coco_dir", default="coco",
                   help="COCO root (annotations/, train2017/, ...)")
    p.add_argument("--test", action="store_true",
                   help="10 iterations, small val, for smoke testing")
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated labeled crops instead of COCO "
                        "(pipeline smoke runs; REQUIRED for facenet/handnet "
                        "— no face/hand keypoint dataset exists, and the "
                        "reference trainer is pose-only despite its --arch "
                        "flag)")
    p.add_argument("--n_data", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--n_spatial", type=int, default=1,
                   help="spatial (image-height) mesh size")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (f32 params/loss)")
    p.add_argument("--insize", type=int, default=368,
                   help="training input size (368 = reference)")
    p.add_argument("--log_interval", type=int, default=None,
                   help="iterations per log entry (default: config; "
                        "metrics stay on device between entries)")
    return p.parse_args(argv)


def main(argv=None):
    from tpupose.config import TrainConfig
    from tpupose.data import BatchLoader, CocoPoseDataset
    from tpupose.models import ARCHS
    from tpupose.parallel import make_mesh
    from tpupose.train import (
        init_train_state, make_eval_step, make_train_step)
    from tpupose.train.checkpoint import (
        export_model_npz, latest_checkpoint, restore_checkpoint,
        save_checkpoint)
    from tpupose.utils.reporting import (
        ProgressBar, TrainLogger, dump_computation_graph, dump_run_params)
    from tpupose.weights import params_from_npz_auto

    args = parse_args(argv)
    if args.arch != "posenet" and not args.synthetic:
        raise SystemExit(
            f"--arch {args.arch} cannot train on COCO: the dataset has no "
            "face/hand keypoint labels.  (The reference trainer advertises "
            "this arch but is pose-only in practice — its loss unpacks two "
            "branches, train_coco_pose_estimation.py:41-73 — so the choice "
            "crashes there too.)  Pass --synthetic for a smoke run on "
            "generated labeled crops, or feed a labeled-crop dataset "
            "through tpupose.train.make_train_step directly.")
    cfg = TrainConfig(batch_size=args.batchsize, iterations=args.iteration,
                      insize=args.insize)
    iterations = min(args.iteration, 10) if args.test else args.iteration
    val_interval = 10 if args.test else cfg.snapshot_interval
    log_interval = (args.log_interval if args.log_interval
                    else (1 if args.test else cfg.log_interval))

    model = ARCHS[args.arch](
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    params = None
    if args.initmodel:
        print("Load model from", args.initmodel)
        variables, _ = params_from_npz_auto(args.initmodel, model)
        params = variables["params"]
    elif args.vgg and args.arch == "posenet":
        from tpupose.weights.caffe import init_stem_from_caffe_vgg

        print("Warm-starting VGG stem from", args.vgg)
        import jax.random as jrandom

        dummy = jnp.zeros((1, cfg.insize, cfg.insize, 3), jnp.float32)
        variables = model.init(jrandom.PRNGKey(0), dummy)
        params = init_stem_from_caffe_vgg(variables["params"], args.vgg)
    state, tx = init_train_state(model, cfg, arch=args.arch, params=params)

    n_data = args.n_data
    if n_data is None:
        # largest data-parallel degree dividing BOTH batch sizes (the
        # validation loop shards its batches over the same mesh)
        avail = len(jax.devices()) // args.n_spatial
        n_data = max(d for d in range(1, avail + 1)
                     if args.batchsize % d == 0
                     and args.valbatchsize % d == 0)
    mesh = make_mesh(n_data=n_data, n_spatial=args.n_spatial)
    print(f"mesh: data={n_data} spatial={args.n_spatial} "
          f"(devices: {len(jax.devices())})")
    step = make_train_step(model, tx, cfg, mesh=mesh)
    eval_step = make_eval_step(model, cfg, mesh=mesh)

    if args.resume:
        path = (latest_checkpoint(args.out) if args.resume == "auto"
                else args.resume)
        if path:
            print("Resume from", path)
            state = restore_checkpoint(path, state)

    if args.synthetic:
        from tpupose.data import SyntheticCropDataset

        num_keypoints = {"posenet": 18, "facenet": 70, "handnet": 21}
        k = num_keypoints[args.arch]
        train_ds = SyntheticCropDataset(
            k, insize=cfg.insize,
            n_samples=max(64, 4 * args.batchsize), seed=0)
        val_ds = SyntheticCropDataset(
            k, insize=cfg.insize,
            n_samples=(8 if args.test else args.val_samples), seed=1)
        max_persons = 1  # one synthetic person per crop
    else:
        ann = os.path.join(args.coco_dir, "annotations")
        train_ds = CocoPoseDataset(
            os.path.join(ann, "person_keypoints_train2017.json"),
            os.path.join(args.coco_dir, "train2017"),
            mask_dir=os.path.join(args.coco_dir, "ignore_mask_train2017"),
            mode="train", cfg=cfg)
        val_ds = CocoPoseDataset(
            os.path.join(ann, "person_keypoints_val2017.json"),
            os.path.join(args.coco_dir, "val2017"),
            mask_dir=os.path.join(args.coco_dir, "ignore_mask_val2017"),
            mode="val", cfg=cfg,
            n_samples=(8 if args.test else args.val_samples))
        max_persons = cfg.max_persons
    train_loader = BatchLoader(
        train_ds, args.batchsize, max_persons=max_persons,
        num_workers=args.loaderjob, mesh=mesh)

    logger = TrainLogger(args.out, log_interval=log_interval)
    dump_run_params(args.out, vars(args))

    def run_validation(params):
        val_loader = BatchLoader(
            val_ds, args.valbatchsize, max_persons=max_persons,
            shuffle=False, repeat=False, mesh=mesh)
        sums, n = {}, 0
        for batch in val_loader:
            m = eval_step(params, batch)
            for k in ("loss", "paf", "heat"):
                sums[k] = sums.get(k, 0.0) + float(m[k])
            n += 1
        return {f"val/{k}": v / max(n, 1) for k, v in sums.items()}

    it = iter(train_loader)
    epoch_len = max(len(train_ds) // args.batchsize, 1)
    start = int(np.asarray(state.step))
    # Per-step metrics stay ON DEVICE between log points: a float() per
    # iteration is a blocking device fetch that defeats async dispatch and
    # the loader's double buffering (the reference's LogReport also only
    # materializes scalars at its interval trigger).  One stacked fetch
    # per log window preserves LogReport's window-averaging exactly.
    metric_keys = ("loss", "paf", "heat")
    pending = []  # [(iteration, {k: device scalar})]

    def flush_metrics(extra_scalars=None, last_iter=None):
        if not pending:
            return
        stacked = np.asarray(jax.device_get(jnp.stack(
            [jnp.stack([m[k] for k in metric_keys]) for _, m in pending])))
        for (it_n, _), row in zip(pending, stacked):
            scalars = {f"main/{k}": float(v)
                       for k, v in zip(metric_keys, row)}
            if extra_scalars and it_n == last_iter:
                scalars.update(extra_scalars)
            logger.observe(it_n, scalars, epoch=it_n // epoch_len)
        pending.clear()

    progress = (None if args.test
                else ProgressBar(iterations, update_interval=log_interval))
    for i in range(start, iterations):
        batch = next(it)
        if i == start:
            dump_computation_graph(args.out, step, state, batch)
        state, metrics = step(state, batch)
        pending.append((i + 1, metrics))
        if progress:
            progress.update(i + 1)
        if (i + 1) % val_interval == 0:
            extra = run_validation(state.params)
            save_checkpoint(args.out, state)
            export_model_npz(args.out, state)
            flush_metrics(extra, last_iter=i + 1)
        elif (i + 1) % log_interval == 0 or i + 1 == iterations:
            flush_metrics()

    save_checkpoint(args.out, state)
    export_model_npz(args.out, state, name=f"{args.arch}_final.npz")
    train_loader.close()
    print("done:", int(np.asarray(state.step)), "iterations")


if __name__ == "__main__":
    main()
