"""Model structure + numerical parity tests.

The reference has no tests (SURVEY.md section 4); parity here is checked
against a torch CPU oracle that replicates the Chainer graph
(``/root/reference/models/CocoPoseNet.py:132-262``) operation-for-operation:
NCHW convs with identical weights, ReLU, 2x2 max-pool, channel concat.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpupose.models import ARCHS, CocoPoseNet
from tpupose.weights import load_npz_params, save_npz_params

INSIZE = 64  # small but pool-divisible (64 -> 8 at stride 8)


def _init(model, insize=INSIZE):
    x = jnp.zeros((1, insize, insize, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(0), x)


def test_posenet_shapes():
    model = CocoPoseNet()
    variables = _init(model)
    x = jnp.asarray(np.random.RandomState(0).randn(2, INSIZE, INSIZE, 3),
                    jnp.float32)
    pafs, heatmaps = model.apply(variables, x)
    assert pafs.shape == (6, 2, INSIZE // 8, INSIZE // 8, 38)
    assert heatmaps.shape == (6, 2, INSIZE // 8, INSIZE // 8, 19)
    assert pafs.dtype == jnp.float32


@pytest.mark.parametrize("arch,channels", [("facenet", 71), ("handnet", 22)])
def test_single_branch_shapes(arch, channels):
    model = ARCHS[arch]()
    variables = _init(model)
    x = jnp.asarray(np.random.RandomState(1).randn(1, INSIZE, INSIZE, 3),
                    jnp.float32)
    heatmaps = model.apply(variables, x)
    assert heatmaps.shape == (6, 1, INSIZE // 8, INSIZE // 8, channels)


def test_npz_roundtrip(tmp_path):
    model = CocoPoseNet()
    variables = _init(model)
    path = str(tmp_path / "posenet.npz")
    save_npz_params(path, variables["params"])
    # Perturbed params restored exactly from the npz.
    zeros = jax.tree_util.tree_map(np.zeros_like, variables["params"])
    restored, report = load_npz_params(path, zeros)
    assert not report["missing"] and not report["unused"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        variables["params"], restored)


def test_npz_layer_names_match_reference():
    """Saved npz keys must use the reference's exact Chainer layer names
    (ref models/CocoPoseNet.py:26-129)."""
    model = CocoPoseNet()
    variables = _init(model)
    import io
    buf = io.BytesIO()
    save_npz_params(buf, variables["params"])
    buf.seek(0)
    keys = set(np.load(buf).files)
    for expected in [
        "conv1_1/W", "conv4_4_CPM/b", "conv5_5_CPM_L1/W",
        "conv5_5_CPM_L2/W", "Mconv7_stage6_L2/b", "Mconv1_stage2_L1/W",
    ]:
        assert expected in keys, expected
    assert len(keys) == 2 * (12 + 10 + 5 * 14)  # stem + stage1 + stages2-6


def _torch_posenet_forward(params, x_nchw):
    """Torch oracle replicating the Chainer forward graph."""
    import torch
    import torch.nn.functional as tF

    def conv(name_block, name_layer, h, pad):
        conv_p = params[name_block][name_layer]["conv"]
        w = torch.from_numpy(
            np.transpose(np.asarray(conv_p["kernel"]), (3, 2, 0, 1)).copy())
        b = torch.from_numpy(np.asarray(conv_p["bias"]).copy())
        return tF.conv2d(h, w, b, stride=1, padding=pad)

    h = torch.from_numpy(x_nchw)
    relu = tF.relu
    pool = lambda t: tF.max_pool2d(t, 2, 2)

    stem = [
        ("conv1_1", 1), ("conv1_2", 1), ("pool", 0),
        ("conv2_1", 1), ("conv2_2", 1), ("pool", 0),
        ("conv3_1", 1), ("conv3_2", 1), ("conv3_3", 1), ("conv3_4", 1),
        ("pool", 0),
        ("conv4_1", 1), ("conv4_2", 1), ("conv4_3_CPM", 1),
        ("conv4_4_CPM", 1),
    ]
    for name, pad in stem:
        h = pool(h) if name == "pool" else relu(conv("stem", name, h, pad))
    feature = h

    def branch_stage1(suffix):
        b = f"stage1{suffix}"
        h1 = relu(conv(b, f"conv5_1_CPM{suffix}", feature, 1))
        h1 = relu(conv(b, f"conv5_2_CPM{suffix}", h1, 1))
        h1 = relu(conv(b, f"conv5_3_CPM{suffix}", h1, 1))
        h1 = relu(conv(b, f"conv5_4_CPM{suffix}", h1, 0))
        return conv(b, f"conv5_5_CPM{suffix}", h1, 0)

    h1, h2 = branch_stage1("_L1"), branch_stage1("_L2")
    pafs, heatmaps = [h1], [h2]

    for stage in range(2, 7):
        hin = torch.cat([h1, h2, feature], dim=1)

        def branch(suffix):
            b = f"stage{stage}{suffix}"
            t = f"_stage{stage}{suffix}"
            g = hin
            for j in range(1, 6):
                g = relu(conv(b, f"Mconv{j}{t}", g, 3))
            g = relu(conv(b, f"Mconv6{t}", g, 0))
            return conv(b, f"Mconv7{t}", g, 0)

        h1, h2 = branch("_L1"), branch("_L2")
        pafs.append(h1)
        heatmaps.append(h2)
    return pafs, heatmaps


def test_posenet_matches_torch_oracle():
    model = CocoPoseNet()
    variables = _init(model, insize=32)
    rng = np.random.RandomState(42)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)

    pafs, heatmaps = model.apply(variables, jnp.asarray(x))
    t_pafs, t_heatmaps = _torch_posenet_forward(
        variables["params"], np.transpose(x, (0, 3, 1, 2)).copy())

    for s in range(6):
        ref_paf = np.transpose(t_pafs[s].numpy(), (0, 2, 3, 1))
        ref_hm = np.transpose(t_heatmaps[s].numpy(), (0, 2, 3, 1))
        # Accumulation-order differences grow through ~40 conv layers;
        # tolerate noise relative to the per-stage output scale.
        atol_paf = 1e-3 * max(np.abs(ref_paf).max(), 1e-3)
        atol_hm = 1e-3 * max(np.abs(ref_hm).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(pafs[s]), ref_paf,
                                   rtol=1e-3, atol=atol_paf)
        np.testing.assert_allclose(np.asarray(heatmaps[s]), ref_hm,
                                   rtol=1e-3, atol=atol_hm)


def test_bf16_compute_dtype():
    """bf16 compute path: activations ride bf16, outputs return f32."""
    import jax.numpy as jnp

    model = CocoPoseNet(dtype=jnp.bfloat16)
    variables = _init(model, insize=32)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                    jnp.float32)
    pafs, heatmaps = model.apply(variables, x)
    assert pafs.dtype == jnp.float32  # stack_stages upcasts for the loss
    assert heatmaps.shape == (6, 1, 4, 4, 19)
    # params stay f32
    k = variables["params"]["stem"]["conv1_1"]["conv"]["kernel"]
    assert k.dtype == jnp.float32
