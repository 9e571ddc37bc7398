"""AOT serving bundles (`tpupose/serving.py`): export -> load -> run parity.

New capability beyond the reference (which re-executes its Chainer model
definition in every process); the contract under test is that a deserialized
bundle reproduces the live detector's fast path exactly, with no model code
on the serving path.
"""

import numpy as np
import pytest

from test_eval_apps import SMALL_CFG, _stub_pose_detector

from tpupose.serving import ServingPoseDetector, save_bundle


def _frame(rng, hw=(92, 124)):
    return rng.randint(0, 255, (hw[0], hw[1], 3), dtype=np.uint8)


class TestServingBundle:
    def test_bundle_matches_live_detector(self, tmp_path):
        det = _stub_pose_detector()
        rng = np.random.RandomState(0)
        img = _frame(rng)
        want_poses, want_scores = det(img)
        assert len(want_poses), "stub must detect people"

        path = str(tmp_path / "bundle")
        save_bundle(det, path, [img.shape[:2]], platforms=("cpu",))
        srv = ServingPoseDetector(path)
        got_poses, got_scores = srv(img)
        np.testing.assert_array_equal(got_poses, want_poses)
        np.testing.assert_array_equal(got_scores, want_scores)
        assert srv.arch == det.arch
        assert srv.cfg == det.cfg
        assert srv.image_sizes == [img.shape[:2]]

    def test_unknown_geometry_raises(self, tmp_path):
        det = _stub_pose_detector()
        path = str(tmp_path / "bundle")
        save_bundle(det, path, [(92, 124)], platforms=("cpu",))
        srv = ServingPoseDetector(path)
        with pytest.raises(ValueError, match="no program exported"):
            srv(np.zeros((64, 64, 3), np.uint8))

    def test_real_model_params_round_trip(self, tmp_path):
        """With the real (randomly initialized) CocoPoseNet, the bundle's
        program output must match the live jitted program bit-for-bit —
        this exercises the params.npz round trip through the exported
        call signature (the stub has empty params)."""
        import cv2
        import jax
        import jax.numpy as jnp

        from tpupose.detectors import PoseDetector
        from tpupose.serving import _geometry

        det = PoseDetector("posenet", cfg=SMALL_CFG)
        rng = np.random.RandomState(1)
        img = _frame(rng, hw=(48, 56))
        path = str(tmp_path / "bundle")
        save_bundle(det, path, [img.shape[:2]], platforms=("cpu",))
        srv = ServingPoseDetector(path)

        in_hw, map_hw = _geometry(det.cfg, *img.shape[:2])
        resized = jnp.asarray(cv2.resize(img, (in_hw[1], in_hw[0])))
        want = jax.device_get(
            det._fast_fn(in_hw, map_hw)(det.variables, resized))
        exported, _, _ = srv._by_size[img.shape[:2]]
        got = jax.device_get(exported.call(srv.variables, resized))
        for g, w in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_precise_bundle_matches_live_detector(self, tmp_path):
        det = _stub_pose_detector(precise=True)
        rng = np.random.RandomState(2)
        img = _frame(rng)
        want_poses, want_scores = det(img)
        assert len(want_poses), "stub must detect people"

        path = str(tmp_path / "bundle")
        save_bundle(det, path, [img.shape[:2]], platforms=("cpu",))
        srv = ServingPoseDetector(path)
        assert srv.mode == "precise"
        got_poses, got_scores = srv(img)
        np.testing.assert_array_equal(got_poses, want_poses)
        np.testing.assert_array_equal(got_scores, want_scores)

    def test_bf16_bundle_round_trips_params(self, tmp_path):
        """npz cannot store bf16 (numpy loads it back as void); bundles
        store floats f32 and re-cast from meta's params_dtype — the loaded
        program must accept the bf16 variables and match the live one."""
        import cv2
        import jax
        import jax.numpy as jnp

        from test_eval_apps import SMALL_CFG

        from tpupose.detectors import PoseDetector
        from tpupose.serving import _geometry

        det = PoseDetector("posenet", cfg=SMALL_CFG,
                           compute_dtype=jnp.bfloat16)
        img = _frame(np.random.RandomState(4), hw=(48, 56))
        path = str(tmp_path / "bundle")
        save_bundle(det, path, [img.shape[:2]], platforms=("cpu",))
        srv = ServingPoseDetector(path)
        leaf = jax.tree_util.tree_leaves(srv.variables)[0]
        assert leaf.dtype == jnp.bfloat16

        in_hw, map_hw = _geometry(det.cfg, *img.shape[:2])
        resized = jnp.asarray(cv2.resize(img, (in_hw[1], in_hw[0])))
        want = jax.device_get(
            det._fast_fn(in_hw, map_hw)(det.variables, resized))
        exported, _, _ = srv._by_size[img.shape[:2]]
        got = jax.device_get(exported.call(srv.variables, resized))
        for g, w in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_precise_host_pyramid_rejected(self, tmp_path):
        import dataclasses

        from test_eval_apps import SMALL_CFG

        det = _stub_pose_detector(precise=True)
        det.cfg = dataclasses.replace(SMALL_CFG, device_pyramid=False)
        with pytest.raises(ValueError, match="device_pyramid"):
            save_bundle(det, str(tmp_path / "b"), [(92, 124)])

    def test_export_cli(self, tmp_path):
        """CLI end to end: save npz weights, export, serve."""
        import jax

        from tpupose.apps.export_serving import main, parse_sizes
        from tpupose.detectors import PoseDetector
        from tpupose.weights.chainer_npz import save_npz_params

        assert parse_sizes("480x640,584x584") == [(480, 640), (584, 584)]
        det = PoseDetector("posenet", cfg=SMALL_CFG)
        npz = str(tmp_path / "w.npz")
        save_npz_params(npz, jax.device_get(det.variables)["params"])
        out = str(tmp_path / "bundle")
        main([npz, out, "--sizes", "48x56", "--platforms", "cpu",
              "--img-size", "64", "--heatmap-size", "64"])
        srv = ServingPoseDetector(out)
        poses, scores = srv(np.zeros((48, 56, 3), np.uint8))
        assert poses.shape[1:] == (18, 3)
