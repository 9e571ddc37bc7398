"""Detector-level tests: preprocessing parity, degenerate inputs,
device-pyramid vs host-cv2 pyramid, submit/collect streaming API."""

import sys
import os

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from tpupose.detectors.pose import pad_image_np
from tpupose.ops.resize import compute_optimal_size, resize_cv2_cubic

CV2 = pytest.importorskip("cv2")

from test_eval_apps import (  # shared small config + video fixture helper
    SMALL_CFG,
    _write_video,
)


def _stub_detector(precise=False):
    from test_eval_apps import _stub_pose_detector

    return _stub_pose_detector(precise=precise)


class TestDevicePyramid:
    def test_resize_quantize_matches_cv2_within_1lsb(self):
        """Device cubic resize + round/clip vs cv2 uint8 INTER_CUBIC: the
        fixed-point vs float difference must stay within 1 u8 step for
        essentially every pixel."""
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (120, 90, 3), dtype=np.uint8)
        for out_hw in [(61, 45), (181, 137), (240, 180)]:
            ref = CV2.resize(img, (out_hw[1], out_hw[0]),
                             interpolation=CV2.INTER_CUBIC)
            dev = np.asarray(jnp.clip(jnp.round(
                resize_cv2_cubic(jnp.asarray(img, jnp.float32), out_hw)),
                0, 255)).astype(np.uint8)
            diff = np.abs(dev.astype(int) - ref.astype(int))
            assert (diff <= 1).mean() > 0.999, out_hw
            assert diff.max() <= 2

    def test_precise_modes_agree(self):
        """Full precise detection with device pyramid vs host pyramid must
        produce the same poses (stub model -> identical maps)."""
        from test_eval_apps import _stub_pose_detector
        import dataclasses

        img = np.random.RandomState(1).randint(
            0, 255, (92, 124, 3), dtype=np.uint8)
        det_dev = _stub_pose_detector(precise=True)
        det_dev.cfg = dataclasses.replace(SMALL_CFG, device_pyramid=True)
        det_host = _stub_pose_detector(precise=True)
        det_host.cfg = dataclasses.replace(SMALL_CFG, device_pyramid=False)
        poses_d, scores_d = det_dev(img)
        poses_h, scores_h = det_host(img)
        np.testing.assert_array_equal(poses_d, poses_h)
        np.testing.assert_allclose(scores_d, scores_h, rtol=1e-5)


class TestDegenerateInputs:
    def test_tiny_images_do_not_crash(self):
        det = _stub_detector()
        for shape in [(1, 1, 3), (16, 9, 3), (9, 16, 3)]:
            img = np.zeros(shape, np.uint8)
            poses, scores = det(img)
            assert poses.shape[1:] == (18, 3)
            assert len(poses) == len(scores)

    def test_empty_heatmaps_return_no_people(self):
        from test_eval_apps import _StubModel
        from tpupose.detectors import PoseDetector

        det = PoseDetector("posenet", params={"params": {}}, cfg=SMALL_CFG)
        det.model = _StubModel(np.zeros((38, 46, 62), np.float32),
                               np.zeros((19, 46, 62), np.float32))
        poses, scores = det(np.zeros((80, 100, 3), np.uint8))
        assert poses.shape == (0, 18, 3)
        assert scores.shape == (0,)


class TestStreamingAPI:
    def test_submit_collect_matches_call(self):
        det = _stub_detector()
        img = np.random.RandomState(2).randint(
            0, 255, (92, 124, 3), dtype=np.uint8)
        poses_a, scores_a = det(img)
        poses_b, scores_b = det.collect(det.submit(img))
        np.testing.assert_array_equal(poses_a, poses_b)
        np.testing.assert_array_equal(scores_a, scores_b)

    def test_pipelined_order_independent(self):
        """Two frames in flight: results correspond to their own frames.

        The stub's detection SCORES depend on each frame's pixel values
        (see _StubModel), so a frame<->result swap fails the score
        comparison — poses alone would be identical for both frames."""
        det = _stub_detector()
        rng = np.random.RandomState(3)
        img1 = rng.randint(0, 255, (92, 124, 3), dtype=np.uint8)
        img2 = rng.randint(0, 255, (92, 124, 3), dtype=np.uint8)
        h1 = det.submit(img1)
        h2 = det.submit(img2)
        p1, s1 = det.collect(h1)
        p2, s2 = det.collect(h2)
        q1, t1 = det(img1)
        q2, t2 = det(img2)
        assert not np.allclose(t1, t2), "stub must differentiate frames"
        np.testing.assert_array_equal(p1, q1)
        np.testing.assert_array_equal(p2, q2)
        np.testing.assert_allclose(s1, t1, rtol=1e-6)
        np.testing.assert_allclose(s2, t2, rtol=1e-6)


class TestPreprocess:
    def test_compute_optimal_size_stride(self):
        for h, w in [(480, 640), (584, 584), (37, 91)]:
            out_w, out_h = compute_optimal_size(h, w, 368, 8)
            assert out_w % 8 == 0
            assert out_h % 8 == 0

    def test_pad_image(self):
        img = np.zeros((37, 53, 3), np.uint8)
        padded, (pad_b, pad_r) = pad_image_np(img, 8, (104, 117, 123))
        assert padded.shape[0] % 8 == 0 and padded.shape[1] % 8 == 0
        assert (padded[:37, :53] == 0).all()
        if pad_b:
            assert tuple(padded[-1, 0]) == (104, 117, 123)


class TestBatchedDetect:
    def test_detect_batch_matches_single(self):
        det = _stub_detector()
        rng = np.random.RandomState(4)
        imgs = rng.randint(0, 255, (3, 92, 124, 3), dtype=np.uint8)
        batched = det.detect_batch(imgs)
        for i in range(3):
            poses_s, scores_s = det(imgs[i])
            poses_b, scores_b = batched[i]
            np.testing.assert_array_equal(poses_s, poses_b)
            np.testing.assert_allclose(scores_s, scores_b, rtol=1e-5)

    def test_camera_batch_mode(self, tmp_path, monkeypatch):
        import tpupose.detectors as det_mod
        from tpupose.apps import camera

        video = str(tmp_path / "in.mp4")
        _write_video(video, 6, wh=(124, 92))

        stub = _stub_detector()
        monkeypatch.setattr(det_mod, "PoseDetector",
                            lambda *a, **kw: stub)
        out = str(tmp_path / "out.mp4")
        camera.main(["pose", "--video", video, "--headless", "--save", out,
                     "--batch", "3", "--max-frames", "6"])
        cap = CV2.VideoCapture(out)
        assert int(cap.get(CV2.CAP_PROP_FRAME_COUNT)) == 6
        cap.release()

        # --max-frames not divisible by --batch: the cap must be exact,
        # AND the tail must be padded to the full batch size so the
        # already-compiled programs are reused (never a one-off batch
        # geometry, which costs a full recompile and cannot shard evenly
        # over a --mesh data axis)
        sizes = []
        real_detect = stub.detect_batch

        def recording(imgs):
            sizes.append(len(imgs))
            return real_detect(imgs)

        monkeypatch.setattr(stub, "detect_batch", recording)
        out2 = str(tmp_path / "out2.mp4")
        camera.main(["pose", "--video", video, "--headless", "--save", out2,
                     "--batch", "4", "--max-frames", "5"])
        cap = CV2.VideoCapture(out2)
        assert int(cap.get(CV2.CAP_PROP_FRAME_COUNT)) == 5
        cap.release()
        assert sizes == [4, 4]  # tail of 1 padded to the compiled size

    def test_camera_mesh_flag_builds_sharded_detector(self, tmp_path,
                                                      monkeypatch):
        """--mesh DxS reaches PoseDetector as a real (data, spatial) Mesh
        on the virtual 8-device CPU backend; misuse without --batch is
        rejected."""
        import pytest

        import tpupose.detectors as det_mod
        from tpupose.apps import camera

        video = str(tmp_path / "in.mp4")
        _write_video(video, 4, wh=(124, 92))

        stub = _stub_detector()   # build BEFORE patching (it constructs one)
        seen = {}

        def fake_detector(*a, **kw):
            seen.update(kw)
            return stub

        monkeypatch.setattr(det_mod, "PoseDetector", fake_detector)
        camera.main(["pose", "--video", video, "--headless",
                     "--batch", "4", "--mesh", "4x2", "--max-frames", "4",
                     "--nms-mode", "conv"])
        mesh = seen["mesh"]
        assert mesh.shape == {"data": 4, "spatial": 2}
        assert seen["cfg"].nms_mode == "conv"   # --nms-mode plumbs through

        with pytest.raises(SystemExit):
            camera.main(["pose", "--video", video, "--headless",
                         "--mesh", "4x2"])
        with pytest.raises(SystemExit):
            camera.main(["pose", "--video", video, "--headless",
                         "--batch", "4", "--mesh", "banana"])


class TestMeshedBatchDetect:
    def test_mesh_batch_matches_unsharded(self):
        import jax
        import pytest

        from tpupose.parallel import make_mesh
        from test_eval_apps import _StubModel, _render_scene

        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 virtual devices")
        from tpupose.detectors import PoseDetector

        rng = np.random.RandomState(7)
        pafs, heatmaps = _render_scene(rng, n_people=2, hw=(46, 62))
        mesh = make_mesh(n_data=4, n_spatial=1)
        det_m = PoseDetector("posenet", params={"params": {}},
                             cfg=SMALL_CFG, mesh=mesh)
        det_m.model = _StubModel(pafs, heatmaps)
        det_1 = PoseDetector("posenet", params={"params": {}},
                             cfg=SMALL_CFG)
        det_1.model = _StubModel(pafs, heatmaps)

        imgs = rng.randint(0, 255, (4, 92, 124, 3), dtype=np.uint8)
        res_m = det_m.detect_batch(imgs)
        res_1 = det_1.detect_batch(imgs)
        for (pm, sm), (p1, s1) in zip(res_m, res_1):
            np.testing.assert_array_equal(pm, p1)
            np.testing.assert_allclose(sm, s1, rtol=1e-5)

    def test_precise_mesh_batch_pins_xla_peak_path(self, monkeypatch):
        """The batched precise postprocess runs under mesh shardings, where
        GSPMD cannot auto-partition a Pallas custom call — it must pin
        use_pallas=False (like the batched fast path) instead of letting
        the TPU-backend auto-select pick Pallas at compile time."""
        import jax

        import tpupose.detectors.pose as pose_mod
        from tpupose.detectors import PoseDetector
        from tpupose.parallel import make_mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 virtual devices")

        seen = {}
        real = pose_mod.postprocess_pose

        def recorder(*args, **kwargs):
            seen["use_pallas"] = kwargs.get("use_pallas", "absent")
            return real(*args, **kwargs)

        monkeypatch.setattr(pose_mod, "postprocess_pose", recorder)
        mesh = make_mesh(n_data=4, n_spatial=1)
        det = PoseDetector("posenet", params={"params": {}},
                           cfg=SMALL_CFG, precise=True, mesh=mesh)
        paf = jnp.zeros((4, 24, 32, 38), jnp.float32)
        hm = jnp.zeros((4, 24, 32, 19), jnp.float32)
        # eval_shape traces (runs the Python body) without compiling.
        jax.eval_shape(det._batch_avg_postprocess_fn((24, 32), 2, 4),
                       [paf, paf], [hm, hm])
        assert seen["use_pallas"] is False

        # Without a mesh, auto-selection stays in charge.
        seen.clear()
        det_1 = PoseDetector("posenet", params={"params": {}},
                             cfg=SMALL_CFG, precise=True)
        jax.eval_shape(det_1._batch_avg_postprocess_fn((24, 32), 2, 4),
                       [paf, paf], [hm, hm])
        assert seen["use_pallas"] is None


class TestPostprocessCap:
    def test_capped_precise_close_to_exact(self):
        import dataclasses

        from test_eval_apps import _stub_pose_detector

        img = np.random.RandomState(8).randint(
            0, 255, (184, 248, 3), dtype=np.uint8)
        det_exact = _stub_pose_detector(precise=True)
        det_exact.cfg = SMALL_CFG
        det_cap = _stub_pose_detector(precise=True)
        det_cap.cfg = dataclasses.replace(SMALL_CFG,
                                          max_postprocess_len=124)
        poses_e, _ = det_exact(img)
        poses_c, _ = det_cap(img)
        assert len(poses_e) == len(poses_c)
        # same people, coordinates within the cap's resolution step
        pe = np.sort(poses_e[:, :, :2].reshape(-1))
        pc = np.sort(poses_c[:, :, :2].reshape(-1))
        np.testing.assert_allclose(pc, pe, atol=4.0)


class TestCropLimbSemantics:
    def test_unit_length_counts_absent_joints_like_reference(self):
        """The reference's `is not None` never filters ndarray rows, so
        limbs to absent joints at (0, 0) ARE measured."""
        from tpupose.detectors import compute_limbs_length, get_unit_length

        pose = np.zeros((18, 3))
        pose[1] = (300, 200, 2)  # neck only; nose absent at (0, 0, 0)
        limbs_len, limbs = compute_limbs_length(pose)
        # limb 14 = neck-nose -> distance neck to (0, 0)
        np.testing.assert_allclose(limbs_len[14], np.hypot(300, 200),
                                   rtol=1e-6)
        # base limbs nonzero -> unit length from base table
        assert get_unit_length(pose) > 0

    def test_tail_stride_bounds_compiles_and_stays_close(self):
        from tpupose.config import FaceConfig
        from tpupose.detectors import FaceDetector

        rng = np.random.RandomState(9)
        exact = FaceDetector("facenet", cfg=FaceConfig(img_size=64))
        strided = FaceDetector("facenet", cfg=FaceConfig(img_size=64),
                               tail_stride=16)
        crops = [rng.randint(0, 255, (40 + i, 37 + 2 * i, 3),
                             dtype=np.uint8) for i in range(4)]
        for crop in crops:
            strided(crop)
        # 4 distinct crop sizes -> at most 2 distinct strided tails
        tails = {k for k in strided._fns if k[0] == "tail"}
        assert len(tails) <= 2
        # keypoints stay within ~2 px of the exact path
        for crop in crops:
            a = exact(crop)
            b = strided(crop)
            for ka, kb in zip(a, b):
                if ka is None or kb is None:
                    assert ka == kb
                else:
                    assert abs(ka[0] - kb[0]) <= 2
                    assert abs(ka[1] - kb[1]) <= 2


class TestFusedSmallScales:
    """cfg.fuse_small_scales: the two smallest pyramid scales ride ONE
    batch-2 dispatch at the larger one's padded canvas (serving knob,
    default off = exact reference pyramid)."""

    class _LocalStubModel:
        """Per-pixel 'network': stride-8 average pools of the input.  A
        local model is unaffected by extra canvas context, so fused and
        unfused pyramids must agree EXACTLY except where the tail
        resize's cubic taps cross the crop border."""

        def apply(self, variables, x):
            b, h, w = x.shape[0], x.shape[1], x.shape[2]
            m = x.mean(-1).reshape(b, h // 8, 8, w // 8, 8).mean((2, 4))
            paf = jnp.stack([m * (0.01 * (i + 1)) for i in range(38)], -1)
            hm = jnp.stack([m * (0.02 * (i + 1)) for i in range(19)], -1)
            return paf[None], hm[None]

    def _cfg(self, fused):
        import dataclasses

        from tpupose.config import InferenceConfig

        return dataclasses.replace(
            InferenceConfig(img_size=128, scales=(0.5, 1.0),
                            heatmap_size=128),
            fuse_small_scales=fused)

    def test_pair_selection(self):
        from tpupose.detectors import PoseDetector

        det = PoseDetector("posenet", params={"params": {}},
                           precise=True, cfg=self._cfg(True))
        geoms = det._pyramid_geometries(96, 128)
        assert det._fused_small_pair(geoms) == (0, 1)
        det_off = PoseDetector("posenet", params={"params": {}},
                               precise=True, cfg=self._cfg(False))
        assert det_off._fused_small_pair(geoms) is None
        # host pyramid: no device canvas to fuse on
        import dataclasses

        det_host = PoseDetector(
            "posenet", params={"params": {}}, precise=True,
            cfg=dataclasses.replace(self._cfg(True), device_pyramid=False))
        assert det_host._fused_small_pair(geoms) is None

    def test_fused_maps_match_unfused_away_from_borders(self):
        from tpupose.detectors import PoseDetector

        img = np.random.RandomState(6).randint(
            0, 255, (192, 256, 3), dtype=np.uint8)
        det = PoseDetector("posenet", params={"params": {}},
                           precise=True, cfg=self._cfg(False))
        det.model = self._LocalStubModel()
        det_f = PoseDetector("posenet", params={"params": {}},
                             precise=True, cfg=self._cfg(True))
        det_f.model = self._LocalStubModel()
        (paf, hm), _ = det.compute_maps(img)
        (paf_f, hm_f), _ = det_f.compute_maps(img)
        # interior: the ONLY legitimate difference region is where the
        # tail resize's cubic taps clamp at the small scale's crop edge
        # in the unfused canvas but read real (pad-value-driven) cells in
        # the fused one — last ~20 crop px, smeared by the final upsample
        pad = 64
        np.testing.assert_allclose(
            np.asarray(hm)[:, pad:-pad, pad:-pad],
            np.asarray(hm_f)[:, pad:-pad, pad:-pad], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(paf)[:, pad:-pad, pad:-pad],
            np.asarray(paf_f)[:, pad:-pad, pad:-pad], atol=1e-6)

    def test_fused_batched_matches_fused_single(self):
        from tpupose.detectors import PoseDetector

        rng = np.random.RandomState(7)
        imgs = rng.randint(0, 255, (2, 96, 128, 3), dtype=np.uint8)
        det = PoseDetector("posenet", params={"params": {}},
                           precise=True, cfg=self._cfg(True))
        det.model = self._LocalStubModel()
        batched = det.detect_batch(imgs)
        for i in range(2):
            poses_s, scores_s = det(imgs[i])
            poses_b, scores_b = batched[i]
            np.testing.assert_array_equal(poses_s, poses_b)
            np.testing.assert_allclose(scores_s, scores_b, rtol=1e-5)
