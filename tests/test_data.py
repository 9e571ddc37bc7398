"""Data-pipeline tests: COCO JSON parsing, masks, augmentation, loader,
and a smoke run of the training CLI on a synthetic mini-COCO dataset."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

from tpupose.config import JointType, TrainConfig
from tpupose.data import (
    BatchLoader,
    CocoPoseDataset,
    ann_to_mask,
    generate_ignore_masks,
    parse_annotations,
)
from tpupose.data.coco_json import decode_compressed_rle

CV2 = pytest.importorskip("cv2")


def _coco_keypoints(xys, vis=2):
    """17 COCO keypoints from a dict {coco_index: (x, y)}."""
    kpts = []
    for i in range(17):
        if i in xys:
            kpts += [int(xys[i][0]), int(xys[i][1]), vis]
        else:
            kpts += [0, 0, 0]
    return kpts


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    """Synthetic 3-image COCO dataset with persons + a crowd region."""
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)

    images, annotations = [], []
    ann_id = 1
    for img_id in (1, 2, 3):
        h, w = 240, 320
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        name = f"{img_id:012d}.jpg"
        CV2.imwrite(str(img_dir / name), img)
        images.append({"id": img_id, "file_name": name,
                       "height": h, "width": w})
        # one well-annotated person
        xys = {i: (40 + 10 * i + img_id, 60 + 7 * i) for i in range(17)}
        annotations.append({
            "id": ann_id, "image_id": img_id, "category_id": 1,
            "keypoints": _coco_keypoints(xys), "num_keypoints": 17,
            "area": 5000.0, "iscrowd": 0,
            "segmentation": [[30, 30, 120, 30, 120, 200, 30, 200]],
        })
        ann_id += 1
        # one under-annotated person (should be filtered + masked)
        annotations.append({
            "id": ann_id, "image_id": img_id, "category_id": 1,
            "keypoints": _coco_keypoints({0: (200, 50)}), "num_keypoints": 1,
            "area": 1500.0, "iscrowd": 0,
            "segmentation": [[190, 40, 230, 40, 230, 90, 190, 90]],
        })
        ann_id += 1
    # a crowd annotation with uncompressed RLE on image 1
    from test_native import _mask_to_counts

    h, w = 240, 320
    crowd_mask = np.zeros((h, w), np.uint8)
    crowd_mask[100:140, 250:300] = 1
    counts = _mask_to_counts(crowd_mask)
    annotations.append({
        "id": ann_id, "image_id": 1, "category_id": 1,
        "keypoints": [0] * 51, "num_keypoints": 0,
        "area": 2000.0, "iscrowd": 1,
        "segmentation": {"counts": [int(c) for c in counts],
                         "size": [h, w]},
    })

    ann_file = root / "person_keypoints.json"
    with open(ann_file, "w") as f:
        json.dump({
            "images": images,
            "annotations": annotations,
            "categories": [{"id": 1, "name": "person"}],
        }, f)
    return {"root": str(root), "ann": str(ann_file),
            "img_dir": str(img_dir)}


class TestCocoJson:
    def test_polygon_mask(self):
        ann = {"segmentation": [[10, 10, 20, 10, 20, 20, 10, 20]]}
        mask = ann_to_mask(ann, 32, 32)
        assert mask[15, 15] == 1
        assert mask[5, 5] == 0

    def test_uncompressed_rle_roundtrip(self, mini_coco):
        from tpupose.data.coco_json import CocoAnnotations

        coco = CocoAnnotations(mini_coco["ann"])
        crowd = [a for a in coco.annotations(1) if a["iscrowd"] == 1][0]
        mask = ann_to_mask(crowd, 240, 320)
        assert mask[120, 270] == 1
        assert mask[50, 50] == 0
        assert mask.sum() == 40 * 50

    def test_compressed_rle_simple(self):
        # 4x4 mask, first column set: counts [0, 4, 12].  "04<" is the
        # LEB encoding (third count stored as delta 12-0=12 -> chr(12+48));
        # verified to round-trip through BOTH the native decoder and the
        # pure-Python fallback.
        import tpupose.native as native_mod

        for force_python in (False, True):
            if force_python:
                orig = native_mod.rle_decode_native
                native_mod.rle_decode_native = lambda *a: None
            try:
                mask = decode_compressed_rle("04<", 4, 4)
            finally:
                if force_python:
                    native_mod.rle_decode_native = orig
            assert mask.shape == (4, 4)
            assert mask[:, 0].sum() == 4
            assert mask[:, 1:].sum() == 0


class TestParseAnnotations:
    def test_neck_synthesis_and_mapping(self):
        xys = {i: (10 * i, 5 * i) for i in range(17)}
        anns = [{"keypoints": _coco_keypoints(xys)}]
        poses = parse_annotations(anns)
        assert poses.shape == (1, 18, 3)
        # COCO idx 5 = LeftShoulder, 6 = RightShoulder
        ls, rs = xys[5], xys[6]
        assert poses[0, JointType.Neck, 0] == int((ls[0] + rs[0]) / 2)
        assert poses[0, JointType.Neck, 2] == 2
        assert tuple(poses[0, JointType.Nose, :2]) == xys[0]

    def test_no_neck_without_both_shoulders(self):
        xys = {5: (50, 50)}  # left shoulder only
        anns = [{"keypoints": _coco_keypoints(xys)}]
        poses = parse_annotations(anns)
        assert poses[0, JointType.Neck, 2] == 0


class TestDataset:
    def test_train_sample_shapes(self, mini_coco):
        cfg = TrainConfig(insize=128)
        ds = CocoPoseDataset(mini_coco["ann"], mini_coco["img_dir"],
                             mode="train", cfg=cfg)
        assert len(ds) == 3
        img, poses, mask = ds.sample(0)
        assert img.shape == (128, 128, 3) and img.dtype == np.uint8
        assert poses.shape[1:] == (18, 3)
        assert mask.shape == (128, 128) and mask.dtype == bool

    def test_under_annotated_filtered(self, mini_coco):
        cfg = TrainConfig(insize=128)
        ds = CocoPoseDataset(mini_coco["ann"], mini_coco["img_dir"],
                             mode="val", cfg=cfg)
        _, poses, _ = ds.sample(0)
        assert poses.shape[0] == 1  # only the 17-kpt person survives

    def test_eval_sample(self, mini_coco):
        ds = CocoPoseDataset(mini_coco["ann"], mini_coco["img_dir"],
                             mode="eval")
        img, anns, img_id = ds.eval_sample(0)
        assert img_id == 1
        assert len(anns) == 3  # unfiltered in eval mode (ref :307-308)

    def test_ignore_mask_generation(self, mini_coco):
        out = os.path.join(mini_coco["root"], "masks")
        n = generate_ignore_masks(mini_coco["ann"], mini_coco["img_dir"],
                                  out)
        assert n == 3  # every image has an under-annotated person
        m = CV2.imread(os.path.join(out, f"{1:012d}.png"), 0)
        assert m is not None
        assert (m == 255).any()
        # the under-annotated person's region is masked
        assert m[60, 210] == 255
        # the well-annotated person's region is NOT
        assert m[150, 60] == 0


class TestBatchLoader:
    def test_batches(self, mini_coco):
        cfg = TrainConfig(insize=128)
        ds = CocoPoseDataset(mini_coco["ann"], mini_coco["img_dir"],
                             mode="val", cfg=cfg)
        loader = BatchLoader(ds, batch_size=2, max_persons=4,
                             shuffle=False, repeat=False)
        batches = list(loader)
        assert len(batches) == 2  # 3 samples -> 2 + 1
        assert batches[0].imgs.shape == (2, 128, 128, 3)
        assert batches[0].poses.shape == (2, 4, 18, 3)
        assert batches[0].ignore_mask.shape == (2, 128, 128)


def _coco_root(mini_coco, tmp_path, val=True):
    """Symlink ``mini_coco`` into the annotations/train2017/val2017 layout
    the CLIs expect — the ONE place this tree is built."""
    coco_root = tmp_path / "coco"
    (coco_root / "annotations").mkdir(parents=True)
    os.symlink(mini_coco["ann"],
               coco_root / "annotations" / "person_keypoints_train2017.json")
    os.symlink(mini_coco["img_dir"], coco_root / "train2017")
    if val:
        os.symlink(mini_coco["ann"],
                   coco_root / "annotations" /
                   "person_keypoints_val2017.json")
        os.symlink(mini_coco["img_dir"], coco_root / "val2017")
    return coco_root


class TestTrainCLI:
    def test_smoke_train(self, mini_coco, tmp_path):
        """2 iterations end-to-end through the CLI main()."""
        from tpupose.apps import train_cli

        coco_root = _coco_root(mini_coco, tmp_path)
        out = str(tmp_path / "result")
        train_cli.main([
            "--coco_dir", str(coco_root), "--out", out, "--test",
            "--batchsize", "2", "--valbatchsize", "2", "--iteration", "2",
            "--insize", "64",
        ])
        assert os.path.exists(os.path.join(out, "log"))
        assert os.path.exists(os.path.join(out, "params.json"))
        # dump_graph parity: the lowered train-step graph is recorded
        assert os.path.exists(os.path.join(out, "train_step.stablehlo.txt"))
        with open(os.path.join(out, "log")) as f:
            log = json.load(f)
        assert any("main/loss" in e for e in log)

    def test_metrics_stay_on_device_between_logs(self, mini_coco, tmp_path,
                                                 monkeypatch):
        """Training-loop desync: per-step metrics must NOT be fetched to
        host every iteration (that blocks async dispatch); one stacked
        fetch per log window, with LogReport window-averaging intact."""
        import jax

        from tpupose.apps import train_cli

        coco_root = _coco_root(mini_coco, tmp_path)

        calls = {"n": 0}
        real = jax.device_get

        def counting(x):
            calls["n"] += 1
            return real(x)

        monkeypatch.setattr(jax, "device_get", counting)
        out = str(tmp_path / "result")
        train_cli.main([
            "--coco_dir", str(coco_root), "--out", out, "--test",
            "--batchsize", "2", "--valbatchsize", "2", "--iteration", "4",
            "--insize", "64", "--log_interval", "2",
        ])
        # 4 iterations / window 2 = 2 metric flushes; allow a couple more
        # fetches for checkpointing — but nowhere near one per step x3.
        assert calls["n"] <= 6, calls["n"]
        with open(os.path.join(out, "log")) as f:
            log = json.load(f)
        its = [e["iteration"] for e in log if "main/loss" in e]
        assert its == [2, 4]  # window-averaged entries at the interval


class TestDataViz:
    def test_render_panel_and_cli(self, mini_coco, tmp_path):
        from tpupose.apps import data_viz

        coco_root = _coco_root(mini_coco, tmp_path, val=False)
        out = str(tmp_path / "viz")
        data_viz.main(["--coco_dir", str(coco_root), "--out", out,
                       "--n", "2", "--insize", "64"])
        assert os.path.exists(os.path.join(out, "sample_0.png"))
        panel = CV2.imread(os.path.join(out, "sample_0.png"))
        assert panel.shape == (64, 128, 3)  # raw | overlay side-by-side


class TestLoaderFaultTolerance:
    def test_bad_sample_skipped(self, mini_coco):
        cfg = TrainConfig(insize=64)
        ds = CocoPoseDataset(mini_coco["ann"], mini_coco["img_dir"],
                             mode="val", cfg=cfg)
        calls = {"n": 0}
        orig = ds.sample

        def flaky(i):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("corrupt image")
            return orig(i)

        ds.sample = flaky
        loader = BatchLoader(ds, batch_size=2, max_persons=2,
                             shuffle=False, repeat=False)
        batches = list(loader)
        # 3 samples, 1 bad -> 1 full batch of 2 good samples
        assert len(batches) == 1
        assert batches[0].imgs.shape[0] == 2


class TestMultiprocessLoader:
    def test_spawn_worker_pool(self, mini_coco):
        """MultiprocessIterator-parity path: spawn pool workers decode and
        augment; batches arrive assembled."""
        cfg = TrainConfig(insize=64)
        ds = CocoPoseDataset(mini_coco["ann"], mini_coco["img_dir"],
                             mode="val", cfg=cfg)
        loader = BatchLoader(ds, batch_size=2, max_persons=2,
                             shuffle=False, repeat=False, num_workers=1)
        try:
            batches = list(loader)
        finally:
            loader.close()
        assert len(batches) == 2
        assert batches[0].imgs.shape == (2, 64, 64, 3)


class TestCapacityAndDtypeParity:
    def test_poses_stay_int_through_augmentation(self, mini_coco):
        """The reference truncates pose coords into int32 arrays at every
        augmentation stage; the chain must preserve that dtype."""
        from tpupose.data.augment import augment
        from tpupose.data.dataset import parse_annotations
        from tpupose.data.coco_json import CocoAnnotations

        coco = CocoAnnotations(mini_coco["ann"])
        anns = [a for a in coco.annotations(1)
                if a.get("num_keypoints", 0) >= 5]
        poses = parse_annotations(anns)
        assert poses.dtype == np.int32
        img = CV2.imread(os.path.join(mini_coco["img_dir"],
                                      "000000000001.jpg"))
        mask = np.zeros(img.shape[:2], bool)
        rng = np.random.RandomState(0)
        cfg = TrainConfig(insize=128)
        _, _, out = augment(img, mask, poses, cfg, rng)
        assert out.dtype == np.int32

    def test_excess_persons_masked_not_trained_as_background(self,
                                                             tmp_path):
        """Persons beyond max_persons must land in the ignore mask."""
        import json as json_mod

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.RandomState(0)
        CV2.imwrite(str(img_dir / "000000000001.jpg"),
                    rng.randint(0, 255, (128, 128, 3), dtype=np.uint8))
        anns = []
        for p in range(3):  # 3 persons, max_persons=2
            kpts = []
            for i in range(17):
                kpts += [20 + 30 * p + 2 * i, 30 + 4 * i, 2]
            anns.append({"id": p + 1, "image_id": 1, "category_id": 1,
                         "keypoints": kpts, "num_keypoints": 17,
                         "area": 2000.0, "iscrowd": 0,
                         "segmentation": [[0, 0, 1, 0, 1, 1]]})
        ann_file = str(tmp_path / "ann.json")
        with open(ann_file, "w") as f:
            json_mod.dump({
                "images": [{"id": 1, "file_name": "000000000001.jpg",
                            "height": 128, "width": 128}],
                "annotations": anns,
                "categories": [{"id": 1, "name": "person"}]}, f)

        cfg = TrainConfig(insize=128, max_persons=2)
        ds = CocoPoseDataset(ann_file, str(img_dir), mode="val", cfg=cfg)
        with pytest.warns(RuntimeWarning, match="exceed max_persons"):
            img, poses, mask = ds.sample(0)
        assert poses.shape[0] == 2
        assert mask.any()  # dropped person's region is ignored


class TestSingleBranchTrainCLI:
    def test_facenet_on_coco_exits_with_clear_error(self, tmp_path):
        """An exposed CLI choice must never crash mid-run: face/hand archs
        cannot train on COCO (no labels) and must say so up front."""
        from tpupose.apps import train_cli

        with pytest.raises(SystemExit, match="synthetic"):
            train_cli.main(["--arch", "facenet",
                            "--coco_dir", str(tmp_path / "nope")])

    def test_facenet_synthetic_smoke_train(self, tmp_path):
        """2 iterations of facenet end-to-end through the CLI on the
        synthetic labeled-crop dataset (a capability the reference
        advertises but cannot deliver)."""
        from tpupose.apps import train_cli

        out = str(tmp_path / "result")
        train_cli.main([
            "--arch", "facenet", "--synthetic", "--out", out, "--test",
            "--batchsize", "2", "--valbatchsize", "2", "--iteration", "2",
            "--insize", "32",
        ])
        with open(os.path.join(out, "log")) as f:
            log = json.load(f)
        assert any("main/loss" in e for e in log)
        assert os.path.exists(os.path.join(out, "facenet_final.npz"))
