"""Weight-interchange tests: caffemodel parsing, npz round-trips.

The caffemodel fixtures are synthesized here with a minimal protobuf wire
ENCODER (the inverse of ``tpupose.weights.caffe``'s reader), covering both
the new ``layer=100`` and legacy ``layers=2`` formats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.models import CocoPoseNet
from tpupose.weights.caffe import (
    ARCH_LAYERS,
    caffemodel_to_flat,
    init_stem_from_caffe_vgg,
    load_caffemodel,
)
from tpupose.weights.chainer_npz import (
    load_npz_params,
    save_npz_params,
)


# --- tiny protobuf writer ---------------------------------------------------

def _varint(x: int) -> bytes:
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _blob(arr: np.ndarray, legacy_dims: bool = False) -> bytes:
    data = _len_delim(5, np.asarray(arr, "<f4").tobytes())
    if legacy_dims:
        dims = [1] * (4 - arr.ndim) + list(arr.shape)
        shape_bytes = b"".join(
            _tag(i + 1, 0) + _varint(d) for i, d in enumerate(dims))
        return shape_bytes + data
    shape = _len_delim(7, _len_delim(1, b"".join(
        _varint(d) for d in arr.shape)))
    return data + shape


def _layer_new(name: str, blobs) -> bytes:
    payload = _len_delim(1, name.encode())
    payload += _len_delim(2, b"Convolution")
    for b in blobs:
        payload += _len_delim(7, _blob(b))
    return _len_delim(100, payload)


def _layer_v1(name: str, blobs) -> bytes:
    payload = _len_delim(4, name.encode())
    for b in blobs:
        payload += _len_delim(6, _blob(b, legacy_dims=True))
    return _len_delim(2, payload)


def _make_caffemodel(path, layers, v1=False):
    enc = _layer_v1 if v1 else _layer_new
    with open(path, "wb") as f:
        f.write(_len_delim(1, b"testnet"))
        for name, blobs in layers.items():
            f.write(enc(name, blobs))


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("v1", [False, True])
def test_load_caffemodel_roundtrip(tmp_path, v1):
    rng = np.random.RandomState(0)
    layers = {
        "conv1_1": [rng.randn(64, 3, 3, 3).astype(np.float32),
                    rng.randn(64).astype(np.float32)],
        "fc_like": [rng.randn(10, 20).astype(np.float32)],
    }
    path = str(tmp_path / "m.caffemodel")
    _make_caffemodel(path, layers, v1=v1)
    got = load_caffemodel(path)
    assert set(got) == set(layers)
    for name in layers:
        for a, b in zip(got[name], layers[name]):
            # legacy (v1) blobs carry padded 4-D shapes (1, 1, ...) — the
            # values and trailing dims are what matters
            assert a.size == b.size
            np.testing.assert_array_equal(a.reshape(b.shape), b)


def test_caffemodel_to_flat_posenet_quirk(tmp_path):
    rng = np.random.RandomState(1)
    names = ["conv1_1", "conv5_5_CPM_L1", "conv5_5_CPM_L2"]
    layers = {
        n: [rng.randn(4, 3, 3, 3).astype(np.float32),
            rng.randn(4).astype(np.float32)]
        for n in names
    }
    path = str(tmp_path / "m.caffemodel")
    _make_caffemodel(path, layers)

    flat = caffemodel_to_flat(path, "posenet", verbose=False)
    assert "conv5_5_CPM_L1/W" in flat  # the fixed behavior
    flat_quirk = caffemodel_to_flat(
        path, "posenet", replicate_reference_quirk=True, verbose=False)
    assert "conv5_5_CPM_L1/W" not in flat_quirk  # reference behavior
    assert "conv5_5_CPM_L2/W" in flat_quirk


def test_full_posenet_caffemodel_loads_into_model(tmp_path):
    """Synthesize every posenet layer, convert, and load into the Flax
    model; forward output must change accordingly."""
    rng = np.random.RandomState(2)
    model = CocoPoseNet()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)))

    # shapes from the real model tree
    from tpupose.weights.chainer_npz import layer_to_path

    layers = {}
    for name in ARCH_LAYERS["posenet"]:
        block, lname = layer_to_path(name)
        conv = variables["params"][block][lname]["conv"]
        kh, kw, cin, cout = conv["kernel"].shape
        layers[name] = [
            rng.randn(cout, cin, kh, kw).astype(np.float32) * 0.01,
            rng.randn(cout).astype(np.float32) * 0.01,
        ]
    path = str(tmp_path / "posenet.caffemodel")
    _make_caffemodel(path, layers)

    flat = caffemodel_to_flat(path, "posenet", verbose=False)
    npz_path = str(tmp_path / "posenet.npz")
    np.savez(npz_path, **flat)

    params, report = load_npz_params(npz_path, variables["params"])
    assert not report["missing"], report["missing"][:4]
    assert not report["unused"]
    # kernels transposed OIHW -> HWIO correctly
    w = layers["conv1_1"][0]
    np.testing.assert_array_equal(
        params["stem"]["conv1_1"]["conv"]["kernel"],
        np.transpose(w, (2, 3, 1, 0)))


def test_vgg_stem_warm_start(tmp_path):
    rng = np.random.RandomState(3)
    model = CocoPoseNet()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)))
    layers = {}
    for name in ("conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1",
                 "conv3_2", "conv3_3", "conv3_4", "conv4_1", "conv4_2"):
        conv = variables["params"]["stem"][name]["conv"]
        kh, kw, cin, cout = conv["kernel"].shape
        layers[name] = [rng.randn(cout, cin, kh, kw).astype(np.float32),
                        rng.randn(cout).astype(np.float32)]
    path = str(tmp_path / "vgg.caffemodel")
    _make_caffemodel(path, layers)

    params = init_stem_from_caffe_vgg(variables["params"], path,
                                      verbose=False)
    np.testing.assert_array_equal(
        params["stem"]["conv1_1"]["conv"]["bias"], layers["conv1_1"][1])
    # non-VGG layers untouched
    np.testing.assert_array_equal(
        params["stem"]["conv4_3_CPM"]["conv"]["kernel"],
        variables["params"]["stem"]["conv4_3_CPM"]["conv"]["kernel"])


def test_npz_save_load_roundtrip(tmp_path):
    model = CocoPoseNet()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)))
    path = str(tmp_path / "w.npz")
    save_npz_params(path, variables["params"])
    params, report = load_npz_params(path, variables["params"])
    assert not report["missing"] and not report["unused"]
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, params,
        jax.tree_util.tree_map(np.asarray, variables["params"]))


class TestLoadReportWarnings:
    """Silent-random-layer loading must be impossible: detectors warn on
    any npz gap beyond the reference's documented conv5_5_CPM_L1 quirk
    (its converter never copies that layer, convert_model.py:24-34)."""

    def _posenet_npz(self, tmp_path, name="w.npz"):
        model = CocoPoseNet()
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
        path = str(tmp_path / name)
        save_npz_params(path, variables["params"])
        return path

    def test_truncated_npz_warns(self, tmp_path):
        from tpupose.detectors import PoseDetector

        path = self._posenet_npz(tmp_path)
        flat = dict(np.load(path))
        for k in ("conv1_1/W", "conv1_1/b", "Mconv7_stage6_L2/W"):
            flat.pop(k)
        trunc = str(tmp_path / "trunc.npz")
        np.savez(trunc, **flat)
        with pytest.warns(RuntimeWarning, match="RANDOM init"):
            PoseDetector("posenet", weights_file=trunc)

    def test_reference_quirk_npz_loads_silently(self, tmp_path):
        import warnings

        from tpupose.detectors import PoseDetector

        path = self._posenet_npz(tmp_path)
        flat = dict(np.load(path))
        # exactly what an official converted coco_posenet.npz looks like
        flat.pop("conv5_5_CPM_L1/W")
        flat.pop("conv5_5_CPM_L1/b")
        quirk = str(tmp_path / "quirk.npz")
        np.savez(quirk, **flat)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            PoseDetector("posenet", weights_file=quirk)

    def test_unused_keys_warn(self, tmp_path):
        from tpupose.detectors import PoseDetector

        path = self._posenet_npz(tmp_path)
        flat = dict(np.load(path))
        flat["not_a_layer/W"] = np.zeros((1, 1, 1, 1), np.float32)
        extra = str(tmp_path / "extra.npz")
        np.savez(extra, **flat)
        with pytest.warns(RuntimeWarning, match="matched no model layer"):
            PoseDetector("posenet", weights_file=extra)

    def test_crop_detector_truncated_npz_warns(self, tmp_path):
        from tpupose.detectors import FaceDetector
        from tpupose.models import ARCHS

        model = ARCHS["facenet"]()
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
        path = str(tmp_path / "face.npz")
        save_npz_params(path, variables["params"])
        flat = dict(np.load(path))
        # facenet has NO expected-missing quirk: even one gap must warn
        flat.pop("conv1_1/W")
        trunc = str(tmp_path / "face_trunc.npz")
        np.savez(trunc, **flat)
        with pytest.warns(RuntimeWarning, match="RANDOM init"):
            FaceDetector("facenet", weights_file=trunc)


class TestCommitDtype:
    def test_commit_casts_float_leaves_only(self):
        from tpupose.weights.chainer_npz import commit_variables

        tree = {"params": {"w": np.ones((2, 2), np.float32),
                           "step": np.asarray(3, np.int32)}}
        out = commit_variables(tree, dtype=jnp.bfloat16)
        assert out["params"]["w"].dtype == jnp.bfloat16
        assert out["params"]["step"].dtype == jnp.int32
        # default: no cast
        out32 = commit_variables(tree)
        assert out32["params"]["w"].dtype == jnp.float32

    def test_bf16_detector_runs_and_stores_bf16_at_rest(self):
        """compute_dtype=bf16 detectors commit params at rest in bf16
        (numerically free — Flax casts per dispatch anyway; halves the
        tree's HBM footprint) and the pipeline still runs."""
        from tpupose.config import InferenceConfig
        from tpupose.detectors import PoseDetector

        cfg = InferenceConfig(img_size=32, heatmap_size=32)
        det = PoseDetector("posenet", cfg=cfg,
                           compute_dtype=jnp.bfloat16)
        leaf = jax.tree_util.tree_leaves(det.variables)[0]
        assert leaf.dtype == jnp.bfloat16
        poses, scores = det(np.zeros((48, 64, 3), np.uint8))
        assert poses.shape[1:] == (18, 3)
