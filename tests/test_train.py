"""Tests for the training subsystem: GT rendering, loss, optimizer, step.

Parity targets are the reference semantics of
``/root/reference/coco_data_loader.py:208-268`` (GT maps) and
``/root/reference/train_coco_pose_estimation.py:25-126`` (loss/optimizer).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.config import TrainConfig
from tpupose.data.gt import (
    render_heatmaps,
    render_heatmaps_numpy,
    render_pafs,
    render_pafs_numpy,
)
from tpupose.models import ARCHS
from tpupose.train import (
    FREEZE_LAYERS,
    TrainBatch,
    compute_loss,
    init_train_state,
    make_lr_schedule,
    make_train_step,
)


def _random_poses(rng, n_people, h, w, visible_p=0.8):
    poses = np.zeros((n_people, 18, 3), np.float32)
    poses[:, :, 0] = rng.uniform(0, w - 1, (n_people, 18))
    poses[:, :, 1] = rng.uniform(0, h - 1, (n_people, 18))
    poses[:, :, 2] = (rng.uniform(size=(n_people, 18)) < visible_p) * 2
    return poses


class TestGTRendering:
    def test_heatmaps_match_oracle(self):
        rng = np.random.RandomState(0)
        poses = _random_poses(rng, 3, 40, 48)
        got = np.asarray(render_heatmaps(jnp.asarray(poses), 40, 48, 7.0))
        want = render_heatmaps_numpy(poses, 40, 48, 7.0)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_pafs_match_oracle(self):
        rng = np.random.RandomState(1)
        poses = _random_poses(rng, 3, 40, 48)
        got = np.asarray(render_pafs(jnp.asarray(poses), 40, 48, 8.0))
        want = render_pafs_numpy(poses, 40, 48, 8.0)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_pafs_axis_aligned_limb(self):
        """Axis-aligned unit vectors hit the reference's nonzero-count
        quirk; both implementations must agree."""
        poses = np.zeros((2, 18, 3), np.float32)
        # person 0: vertical neck->waist limb; person 1 overlaps it.
        poses[0, 1] = (20, 5, 2)   # neck
        poses[0, 8] = (20, 30, 2)  # right waist (limb 0, straight down)
        poses[1, 1] = (22, 5, 2)
        poses[1, 8] = (18, 30, 2)
        got = np.asarray(render_pafs(jnp.asarray(poses), 40, 40, 8.0))
        want = render_pafs_numpy(poses, 40, 40, 8.0)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_no_people_gives_background_one(self):
        poses = np.zeros((2, 18, 3), np.float32)
        hm = np.asarray(render_heatmaps(jnp.asarray(poses), 16, 16, 7.0))
        np.testing.assert_allclose(hm[:-1], 0.0)
        np.testing.assert_allclose(hm[-1], 1.0)
        paf = np.asarray(render_pafs(jnp.asarray(poses), 16, 16, 8.0))
        np.testing.assert_allclose(paf, 0.0)

    def test_output_res_render_equals_fullres_plus_resize(self):
        """render_labels_at must reproduce the reference pipeline (full-res
        render, then align-corners bilinear downsample in the loss) to
        summation-order tolerance — on a non-square, non-divisible grid."""
        from tpupose.data.gt import render_labels, render_labels_at
        from tpupose.ops.resize import resize_chainer

        rng = np.random.RandomState(7)
        h, w, out_hw = 56, 48, (7, 6)
        poses = jnp.asarray(_random_poses(rng, 4, h, w))
        pafs_f, heat_f = render_labels(poses, h, w, 7.0, 8.0)

        def down(chw):  # (C, H, W) -> (C, oh, ow) via the loss's resize
            return jnp.transpose(
                resize_chainer(jnp.transpose(chw, (1, 2, 0))[None],
                               out_hw)[0], (2, 0, 1))

        pafs_d, heat_d = render_labels_at(poses, h, w, out_hw, 7.0, 8.0)
        np.testing.assert_allclose(np.asarray(pafs_d),
                                   np.asarray(down(pafs_f)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(heat_d),
                                   np.asarray(down(heat_f)), atol=1e-5)

    def test_loss_matches_across_gt_render_paths(self):
        """The train-step loss with gt_at_output_res on/off must agree (the
        two GT paths are the same math)."""
        from tpupose.train.trainer import loss_for_batch

        rng = np.random.RandomState(3)
        cfg_fast = TrainConfig(insize=32, max_persons=2)
        cfg_ref = TrainConfig(insize=32, max_persons=2,
                              gt_at_output_res=False)
        model = ARCHS["posenet"]()
        state, _ = init_train_state(model, cfg_fast, insize=32)
        poses = np.zeros((2, 2, 18, 3), np.float32)
        poses[:, 0] = _random_poses(rng, 2, 32, 32)
        batch = TrainBatch(
            imgs=jnp.asarray(rng.randint(0, 255, (2, 32, 32, 3),
                                         dtype=np.uint8)),
            poses=jnp.asarray(poses),
            ignore_mask=jnp.asarray(rng.rand(2, 32, 32) < 0.2),
        )
        t_fast, _ = loss_for_batch(model, state.params, batch, cfg_fast)
        t_ref, _ = loss_for_batch(model, state.params, batch, cfg_ref)
        np.testing.assert_allclose(float(t_fast), float(t_ref), rtol=1e-5)


class TestLoss:
    def test_masked_pixels_have_zero_grad(self):
        rng = np.random.RandomState(0)
        s, b, h, w = 2, 1, 8, 8
        pafs_t = jnp.asarray(rng.randn(b, h, w, 38), jnp.float32)
        heat_t = jnp.asarray(rng.randn(b, h, w, 19), jnp.float32)
        mask = jnp.zeros((b, h, w), bool).at[:, :4].set(True)

        def f(pred):
            total, _ = compute_loss(pred["p"], pred["h"], pafs_t, heat_t,
                                    mask)
            return total

        pred = {
            "p": jnp.asarray(rng.randn(s, b, h, w, 38), jnp.float32),
            "h": jnp.asarray(rng.randn(s, b, h, w, 19), jnp.float32),
        }
        g = jax.grad(f)(pred)
        # masked rows (y < 4) -> zero gradient; unmasked -> nonzero
        assert np.all(np.asarray(g["p"])[:, :, :4] == 0)
        assert np.any(np.asarray(g["p"])[:, :, 4:] != 0)
        assert np.all(np.asarray(g["h"])[:, :, :4] == 0)

    def test_loss_value_matches_manual(self):
        """Same-shape GT, no mask: loss = sum over stages+branches of MSE."""
        rng = np.random.RandomState(1)
        s, b, h, w = 3, 2, 4, 4
        pp = rng.randn(s, b, h, w, 38).astype(np.float32)
        ph = rng.randn(s, b, h, w, 19).astype(np.float32)
        tp = rng.randn(b, h, w, 38).astype(np.float32)
        th = rng.randn(b, h, w, 19).astype(np.float32)
        mask = jnp.zeros((b, h, w), bool)
        total, metrics = compute_loss(
            jnp.asarray(pp), jnp.asarray(ph), jnp.asarray(tp),
            jnp.asarray(th), mask)
        want = sum(np.mean((pp[i] - tp) ** 2) + np.mean((ph[i] - th) ** 2)
                   for i in range(s))
        np.testing.assert_allclose(float(total), want, rtol=1e-5)
        assert metrics["paf_stages"].shape == (s,)

    def test_gt_resized_when_shapes_differ(self):
        """GT at 2x the stage resolution is downsampled (align-corners)."""
        s, b, h, w = 1, 1, 4, 4
        pred_p = jnp.zeros((s, b, h, w, 38))
        pred_h = jnp.zeros((s, b, h, w, 19))
        tp = jnp.ones((b, 2 * h, 2 * w, 38))
        th = jnp.ones((b, 2 * h, 2 * w, 19))
        mask = jnp.zeros((b, 2 * h, 2 * w), bool)
        total, _ = compute_loss(pred_p, pred_h, tp, th, mask)
        # constant-1 GT resizes to constant 1 -> MSE = 1 per branch
        np.testing.assert_allclose(float(total), 2.0, rtol=1e-6)


class TestOptimizer:
    def test_lr_schedule_drops(self):
        cfg = TrainConfig()
        sched = make_lr_schedule(cfg)
        assert np.isclose(sched(0), 1e-4)
        assert np.isclose(sched(99_999), 1e-4)
        assert np.isclose(sched(100_000), 1e-5)
        assert np.isclose(sched(200_000), 1e-6, rtol=1e-4)

    def test_stem_frozen_then_unfrozen(self):
        cfg = TrainConfig(insize=32, stem_freeze_steps=2, max_persons=2)
        model = ARCHS["posenet"]()
        state, tx = init_train_state(model, cfg, insize=32)
        step = make_train_step(model, tx, cfg, donate=False)

        rng = np.random.RandomState(0)
        poses = np.zeros((1, 2, 18, 3), np.float32)
        poses[0, 0] = _random_poses(rng, 1, 32, 32)[0]
        batch = TrainBatch(
            imgs=jnp.asarray(rng.randint(0, 255, (1, 32, 32, 3),
                                         dtype=np.uint8)),
            poses=jnp.asarray(poses),
            ignore_mask=jnp.zeros((1, 32, 32), bool),
        )
        frozen0 = np.asarray(
            state.params["stem"][FREEZE_LAYERS[0]]["conv"]["kernel"])
        live0 = np.asarray(
            state.params["stem"]["conv4_3_CPM"]["conv"]["kernel"])

        s1, _ = step(state, batch)
        s2, _ = step(s1, batch)
        frozen2 = np.asarray(
            s2.params["stem"][FREEZE_LAYERS[0]]["conv"]["kernel"])
        live2 = np.asarray(
            s2.params["stem"]["conv4_3_CPM"]["conv"]["kernel"])
        np.testing.assert_array_equal(frozen0, frozen2)
        assert np.any(live0 != live2)

        s3, _ = step(s2, batch)
        frozen3 = np.asarray(
            s3.params["stem"][FREEZE_LAYERS[0]]["conv"]["kernel"])
        assert np.any(frozen2 != frozen3)  # unfrozen at step index 2

    def test_loss_decreases_over_steps(self):
        cfg = TrainConfig(insize=32, stem_freeze_steps=0, max_persons=2)
        model = ARCHS["posenet"]()
        state, tx = init_train_state(model, cfg, insize=32)
        step = make_train_step(model, tx, cfg, donate=False)
        rng = np.random.RandomState(0)
        poses = np.zeros((2, 2, 18, 3), np.float32)
        poses[:, 0] = _random_poses(rng, 2, 32, 32)
        batch = TrainBatch(
            imgs=jnp.asarray(rng.randint(0, 255, (2, 32, 32, 3),
                                         dtype=np.uint8)),
            poses=jnp.asarray(poses),
            ignore_mask=jnp.zeros((2, 32, 32), bool),
        )
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]

    def test_bf16_compute_tracks_f32(self):
        """bf16 compute (f32 params/optimizer/loss) is the documented fast
        training config — its loss trajectory must track f32 closely."""
        cfg = TrainConfig(insize=32, stem_freeze_steps=0, max_persons=2)
        rng = np.random.RandomState(0)
        poses = np.zeros((2, 2, 18, 3), np.float32)
        poses[:, 0] = _random_poses(rng, 2, 32, 32)
        batch = TrainBatch(
            imgs=jnp.asarray(rng.randint(0, 255, (2, 32, 32, 3),
                                         dtype=np.uint8)),
            poses=jnp.asarray(poses),
            ignore_mask=jnp.zeros((2, 32, 32), bool),
        )
        traj = {}
        for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            model = ARCHS["posenet"](dtype=dtype)
            state, tx = init_train_state(model, cfg, insize=32)
            step = make_train_step(model, tx, cfg, donate=False)
            losses = []
            for _ in range(4):
                state, metrics = step(state, batch)
                losses.append(float(metrics["loss"]))
            # params stay f32 regardless of compute dtype
            k = state.params["stem"]["conv1_1"]["conv"]["kernel"]
            assert k.dtype == jnp.float32
            traj[name] = losses
        assert traj["bf16"][-1] < traj["bf16"][0]
        np.testing.assert_allclose(traj["bf16"], traj["f32"], rtol=0.05)


class TestShardedStep:
    def test_train_step_on_mesh(self):
        from tpupose.parallel import make_mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 virtual devices")
        cfg = TrainConfig(insize=32, max_persons=2)
        model = ARCHS["posenet"]()
        state, tx = init_train_state(model, cfg, insize=32)
        mesh = make_mesh(n_data=2, n_spatial=2)
        step = make_train_step(model, tx, cfg, mesh=mesh, donate=False)
        rng = np.random.RandomState(0)
        poses = np.zeros((4, 2, 18, 3), np.float32)
        poses[:, 0] = _random_poses(rng, 4, 32, 32)
        batch = TrainBatch(
            imgs=jnp.asarray(rng.randint(0, 255, (4, 32, 32, 3),
                                         dtype=np.uint8)),
            poses=jnp.asarray(poses),
            ignore_mask=jnp.zeros((4, 32, 32), bool),
        )
        new_state, metrics = step(state, batch)
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_matches_single_device(self):
        """DP+spatial sharding must not change the math."""
        from tpupose.parallel import make_mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 virtual devices")
        cfg = TrainConfig(insize=32, max_persons=2)
        model = ARCHS["posenet"]()
        state, tx = init_train_state(model, cfg, insize=32)
        mesh = make_mesh(n_data=2, n_spatial=2)
        step_m = make_train_step(model, tx, cfg, mesh=mesh, donate=False)
        step_1 = make_train_step(model, tx, cfg, donate=False)
        rng = np.random.RandomState(0)
        poses = np.zeros((4, 2, 18, 3), np.float32)
        poses[:, 0] = _random_poses(rng, 4, 32, 32)
        batch = TrainBatch(
            imgs=jnp.asarray(rng.randint(0, 255, (4, 32, 32, 3),
                                         dtype=np.uint8)),
            poses=jnp.asarray(poses),
            ignore_mask=jnp.zeros((4, 32, 32), bool),
        )
        _, m_mesh = step_m(state, batch)
        _, m_one = step_1(state, batch)
        np.testing.assert_allclose(
            float(m_mesh["loss"]), float(m_one["loss"]), rtol=1e-5)


class TestSingleBranchTraining:
    """FaceNet/HandNet training — the reference's trainer crashes on these
    archs (its loss is pose-specific, train_coco_pose_estimation.py:41-73);
    here the single-branch heatmap loss + generic GT renderer make them
    first-class."""

    def test_facenet_loss_decreases_on_synthetic_crops(self):
        from tpupose.data import BatchLoader, SyntheticCropDataset

        cfg = TrainConfig(insize=32, max_persons=1)
        model = ARCHS["facenet"]()
        state, tx = init_train_state(model, cfg, arch="facenet", insize=32)
        step = make_train_step(model, tx, cfg, donate=False)
        ds = SyntheticCropDataset(70, insize=32, n_samples=4)
        loader = BatchLoader(ds, 2, max_persons=1, shuffle=False)
        it = iter(loader)
        batch = next(it)
        assert batch.poses.shape == (2, 1, 70, 3)
        losses = []
        for _ in range(4):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert float(metrics["paf"]) == 0.0
        assert metrics["heat_stages"].shape == (6,)

    def test_handnet_single_branch_loss_traces(self):
        """Trace-only (no compile): the 21-keypoint path through
        loss_for_batch, including GT channel count = net output count."""
        from tpupose.train.trainer import TrainBatch, loss_for_batch

        cfg = TrainConfig(insize=32, max_persons=1)
        model = ARCHS["handnet"]()
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)))["params"]
        batch = TrainBatch(
            imgs=jnp.zeros((2, 32, 32, 3), jnp.uint8),
            poses=jnp.zeros((2, 1, 21, 3), jnp.float32),
            ignore_mask=jnp.zeros((2, 32, 32), bool),
        )
        total, metrics = jax.eval_shape(
            lambda p, b: loss_for_batch(model, p, b, cfg), params, batch)
        assert total.shape == ()
        assert metrics["heat_stages"].shape == (6,)

    def test_masked_pixels_have_zero_grad_single_branch(self):
        from tpupose.train.loss import compute_loss_single

        rng = np.random.RandomState(0)
        ys = jnp.asarray(rng.randn(2, 1, 8, 8, 22).astype(np.float32))
        t = jnp.asarray(rng.randn(1, 8, 8, 22).astype(np.float32))
        mask = np.zeros((1, 8, 8), bool)
        mask[0, :4] = True

        def loss_of(ys):
            return compute_loss_single(ys, t, jnp.asarray(mask))[0]

        g = np.asarray(jax.grad(loss_of)(ys))
        assert np.all(g[:, :, :4] == 0)
        assert np.any(g[:, :, 4:] != 0)
