"""Checkpoint/resume, remat-gradient equivalence, eval-harness smoke."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from tpupose.config import TrainConfig
from tpupose.models import ARCHS
from tpupose.train import TrainBatch, init_train_state, make_train_step
from tpupose.train.checkpoint import (
    export_model_npz,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def _tiny_batch(rng, b=1, insize=32):
    poses = np.zeros((b, 2, 18, 3), np.float32)
    poses[:, 0, :, 0] = rng.uniform(0, insize, (b, 18))
    poses[:, 0, :, 1] = rng.uniform(0, insize, (b, 18))
    poses[:, 0, :, 2] = 2
    return TrainBatch(
        imgs=jnp.asarray(rng.randint(0, 255, (b, insize, insize, 3),
                                     dtype=np.uint8)),
        poses=jnp.asarray(poses),
        ignore_mask=jnp.zeros((b, insize, insize), bool),
    )


class TestCheckpointResume:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg = TrainConfig(insize=32, max_persons=2)
        model = ARCHS["posenet"]()
        state, tx = init_train_state(model, cfg, insize=32)
        step = make_train_step(model, tx, cfg, donate=False)
        batch = _tiny_batch(np.random.RandomState(0))
        state, _ = step(state, batch)
        state, _ = step(state, batch)

        out = str(tmp_path / "run")
        path = save_checkpoint(out, state)
        assert latest_checkpoint(out) == path

        fresh, _ = init_train_state(model, cfg, insize=32)
        restored = restore_checkpoint(path, fresh)
        assert int(np.asarray(restored.step)) == 2
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            jax.device_get(state.params), restored.params)

        # resumed training continues identically
        s_cont, m_cont = step(jax.device_get(state), batch)
        s_rest, m_rest = step(restored, batch)
        np.testing.assert_allclose(float(m_cont["loss"]),
                                   float(m_rest["loss"]), rtol=1e-6)

    def test_model_npz_export_loads_into_detector(self, tmp_path):
        from tpupose.config import InferenceConfig
        from tpupose.detectors import PoseDetector

        cfg = TrainConfig(insize=32, max_persons=2)
        model = ARCHS["posenet"]()
        state, _ = init_train_state(model, cfg, insize=32)
        path = export_model_npz(str(tmp_path), state, name="m.npz")
        det = PoseDetector(
            "posenet", weights_file=path,
            cfg=InferenceConfig(img_size=32, heatmap_size=32))
        poses, scores = det(np.zeros((48, 64, 3), np.uint8))
        assert poses.shape[1:] == (18, 3)
        assert len(poses) == len(scores)


class TestRemat:
    def test_remat_grads_match(self):
        import dataclasses

        cfg = TrainConfig(insize=32, max_persons=2, stem_freeze_steps=0)
        model = ARCHS["posenet"]()
        state, tx = init_train_state(model, cfg, insize=32)
        batch = _tiny_batch(np.random.RandomState(1))

        from tpupose.train.trainer import loss_for_batch

        def loss_with(cfg_):
            return jax.grad(
                lambda p: loss_for_batch(model, p, batch, cfg_)[0]
            )(state.params)

        g_plain = loss_with(cfg)
        g_remat = loss_with(dataclasses.replace(cfg, remat=True))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6),
            g_plain, g_remat)


class TestEvalHarness:
    def test_evaluate_detector_smoke(self, tmp_path):
        """apps.evaluate.evaluate_detector over a stub detector + fake
        eval dataset produces finite metrics and COCO-format results."""
        from test_eval_apps import _stub_pose_detector

        from tpupose.apps.evaluate import evaluate_detector

        rng = np.random.RandomState(0)

        class FakeEvalDataset:
            def __len__(self):
                return 2

            def eval_sample(self, i):
                img = rng.randint(0, 255, (92, 124, 3), dtype=np.uint8)
                kpts = []
                for j in range(17):
                    kpts += [20 + 4 * j, 30 + 2 * j, 2]
                gts = [{"keypoints": kpts, "num_keypoints": 17,
                        "area": 2000.0, "iscrowd": 0,
                        "bbox": [20, 30, 70, 40]}]
                return img, gts, i + 1

        det = _stub_pose_detector()
        metrics, results = evaluate_detector(det, FakeEvalDataset(),
                                             verbose=False)
        assert metrics["images"] == 2
        assert "AP" in metrics
        for r in results:
            assert len(r["keypoints"]) == 51
            assert r["image_id"] in (1, 2)

    def test_evaluate_pipelined_matches_serial(self):
        """submit/collect pipelining must not change metrics or results
        (it only overlaps host scoring with device compute)."""
        from test_eval_apps import _stub_pose_detector

        from tpupose.apps.evaluate import evaluate_detector

        rng = np.random.RandomState(1)
        imgs = [rng.randint(0, 255, (92, 124, 3), dtype=np.uint8)
                for _ in range(5)]

        class DeterministicEvalDataset:
            def __len__(self):
                return len(imgs)

            def eval_sample(self, i):
                kpts = []
                for j in range(17):
                    kpts += [20 + 4 * j + i, 30 + 2 * j, 2]
                gts = [{"keypoints": kpts, "num_keypoints": 17,
                        "area": 2000.0, "iscrowd": 0,
                        "bbox": [20, 30, 70, 40]}]
                return imgs[i], gts, i + 1

        det = _stub_pose_detector()
        m_serial, r_serial = evaluate_detector(
            det, DeterministicEvalDataset(), verbose=False,
            pipeline_depth=0)
        m_pipe, r_pipe = evaluate_detector(
            det, DeterministicEvalDataset(), verbose=False,
            pipeline_depth=2)
        for k in m_serial:
            if k != "seconds_per_image":
                assert m_serial[k] == m_pipe[k], k
        assert len(r_serial) == len(r_pipe)
        for a, b in zip(r_serial, r_pipe):
            assert a["image_id"] == b["image_id"]
            np.testing.assert_allclose(a["keypoints"], b["keypoints"])
            np.testing.assert_allclose(a["score"], b["score"])
