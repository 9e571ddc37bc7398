"""Fixed-shape op kernels vs dynamic NumPy/SciPy/cv2 oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpupose.config import NUM_JOINTS, InferenceConfig
from tpupose.ops import (
    compute_optimal_size,
    find_peaks,
    gaussian_blur_reflect,
    global_argmax_keypoints,
    resize_chainer,
    resize_cv2_cubic,
    resize_cv2_linear,
)

from oracles import oracle_peaks, oracle_peaks_conv

CFG = InferenceConfig(max_peaks_per_joint=16)


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("in_hw,out_hw", [((23, 31), (46, 62)),
                                          ((40, 40), (17, 29)),
                                          ((8, 8), (64, 64))])
def test_resize_cv2_linear_matches_cv2(in_hw, out_hw):
    import cv2
    rng = np.random.RandomState(0)
    x = rng.rand(*in_hw, 3).astype(np.float32)
    ref = cv2.resize(x, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_cv2_linear(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, ref, atol=2e-3)  # cv2 is fixed-point


@pytest.mark.parametrize("in_hw,out_hw", [((23, 31), (46, 62)),
                                          ((12, 20), (89, 67))])
def test_resize_cv2_cubic_matches_cv2(in_hw, out_hw):
    import cv2
    rng = np.random.RandomState(1)
    x = rng.rand(*in_hw, 3).astype(np.float32)
    ref = cv2.resize(x, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_CUBIC)
    got = np.asarray(resize_cv2_cubic(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_resize_chainer_align_corners():
    """Chainer F.resize_images parity: align-corners bilinear oracle."""
    rng = np.random.RandomState(2)
    x = rng.rand(9, 13, 2).astype(np.float32)
    out_h, out_w = 33, 21
    # Direct oracle: src = dst * (in-1)/(out-1).
    ys = np.arange(out_h) * (x.shape[0] - 1) / (out_h - 1)
    xs = np.arange(out_w) * (x.shape[1] - 1) / (out_w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, x.shape[0] - 1)
    x1 = np.minimum(x0 + 1, x.shape[1] - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    ref = ((1 - wy) * (1 - wx) * x[y0][:, x0]
           + (1 - wy) * wx * x[y0][:, x1]
           + wy * (1 - wx) * x[y1][:, x0]
           + wy * wx * x[y1][:, x1])
    got = np.asarray(resize_chainer(jnp.asarray(x), (out_h, out_w)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


# (spot checks of compute_optimal_size live in the 209-case reference
# parity sweep below — see test_compute_optimal_size_reference_parity)


# ---------------------------------------------------------------------------
# gaussian blur
# ---------------------------------------------------------------------------


def test_gaussian_blur_matches_scipy():
    from scipy.ndimage import gaussian_filter
    rng = np.random.RandomState(3)
    x = rng.rand(4, 37, 53).astype(np.float32)
    ref = np.stack([gaussian_filter(x[i], sigma=2.5) for i in range(4)])
    got = np.asarray(gaussian_blur_reflect(jnp.asarray(x), 2.5))
    np.testing.assert_allclose(got, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# peaks
# ---------------------------------------------------------------------------


def _synthetic_heatmaps(rng, num_joints=NUM_JOINTS, hw=(46, 54), n_blobs=3):
    h, w = hw
    maps = np.zeros((num_joints, h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for j in range(num_joints):
        for _ in range(rng.randint(1, n_blobs + 1)):
            cy, cx = rng.randint(3, h - 3), rng.randint(3, w - 3)
            amp = 0.3 + 0.7 * rng.rand()
            maps[j] += amp * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 2.0 ** 2))
    return maps


def test_find_peaks_matches_oracle():
    rng = np.random.RandomState(4)
    heatmaps = _synthetic_heatmaps(rng)
    ref = oracle_peaks(heatmaps, CFG)
    got = find_peaks(jnp.asarray(heatmaps), CFG.gaussian_sigma,
                     CFG.heatmap_peak_thresh, CFG.max_peaks_per_joint)
    for j in range(NUM_JOINTS):
        n = int(np.sum(np.asarray(got.valid[j])))
        assert n == len(ref[j]), f"joint {j}: {n} vs {len(ref[j])}"
        for k, (x, y, score) in enumerate(ref[j]):
            assert int(got.x[j, k]) == x
            assert int(got.y[j, k]) == y
            np.testing.assert_allclose(float(got.score[j, k]), score,
                                       atol=1e-5)


def test_gaussian_blur_conv_zero_matches_2d_kernel():
    """Separable device form == the reference's full 2-D unnormalized
    kernel (``pose_detector.py:37-44,112-113``), zero boundary."""
    from scipy.ndimage import correlate
    from tpupose.ops import gaussian_blur_conv_zero

    rng = np.random.RandomState(11)
    x = rng.rand(3, 30, 41).astype(np.float32)
    sigma, k = 2.5, 17
    center = int(k / 2)
    gx = np.tile(np.arange(k), (k, 1))
    d2 = (gx - center) ** 2 + (gx.T - center) ** 2
    kern = 1 / (sigma ** 2 * 2 * np.pi) * np.exp(-0.5 * d2 / sigma ** 2)
    ref = np.stack([correlate(c.astype(np.float64), kern,
                              mode="constant", cval=0.0) for c in x])
    got = np.asarray(gaussian_blur_conv_zero(jnp.asarray(x), sigma, k))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_find_peaks_conv_mode_matches_gpu_oracle():
    rng = np.random.RandomState(7)
    heatmaps = _synthetic_heatmaps(rng)
    ref = oracle_peaks_conv(heatmaps, CFG)
    got = find_peaks(jnp.asarray(heatmaps), CFG.gaussian_sigma,
                     CFG.heatmap_peak_thresh, CFG.max_peaks_per_joint,
                     mode="conv", ksize=CFG.ksize)
    for j in range(NUM_JOINTS):
        n = int(np.sum(np.asarray(got.valid[j])))
        assert n == len(ref[j]), f"joint {j}: {n} vs {len(ref[j])}"
        for k, (x, y, score) in enumerate(ref[j]):
            assert int(got.x[j, k]) == x
            assert int(got.y[j, k]) == y
            np.testing.assert_allclose(float(got.score[j, k]), score,
                                       atol=1e-5)


def test_conv_mode_plateau_emits_ties_scipy_mode_none():
    """Two impulses one pixel apart blur to an exactly tied 2-pixel
    plateau: the GPU ``>=`` rule emits both, the CPU strict-``>`` rule
    emits neither — the reference's own documented disagreement."""
    hm = np.zeros((1, 25, 25), np.float32)
    hm[0, 12, 11] = 3.0
    hm[0, 12, 12] = 3.0
    conv = find_peaks(jnp.asarray(hm), 2.5, 0.05, 8, mode="conv")
    assert int(np.sum(np.asarray(conv.valid))) == 2
    assert sorted((int(conv.x[0, i]), int(conv.y[0, i]))
                  for i in range(2)) == [(11, 12), (12, 12)]
    scipy_mode = find_peaks(jnp.asarray(hm), 2.5, 0.05, 8, mode="scipy")
    assert int(np.sum(np.asarray(scipy_mode.valid))) == 0


def test_find_peaks_mode_validation():
    hm = jnp.zeros((1, 8, 8), jnp.float32)
    with pytest.raises(ValueError):
        find_peaks(hm, 2.5, 0.05, 4, mode="nope")
    with pytest.raises(ValueError):
        find_peaks(hm, 2.5, 0.05, 4, mode="conv", use_pallas=True)


def test_global_argmax_keypoints():
    rng = np.random.RandomState(5)
    heatmaps = _synthetic_heatmaps(rng, num_joints=5, n_blobs=1)
    from scipy.ndimage import gaussian_filter
    xs, ys, score, valid = global_argmax_keypoints(
        jnp.asarray(heatmaps), 2.5, 0.1)
    for c in range(5):
        sm = gaussian_filter(heatmaps[c], sigma=2.5)
        ref_y, ref_x = np.unravel_index(np.argmax(sm), sm.shape)
        assert int(xs[c]) == ref_x and int(ys[c]) == ref_y
        np.testing.assert_allclose(float(score[c]), sm.max(), atol=1e-5)
        assert bool(valid[c]) == (sm.max() > 0.1)


def test_compute_optimal_size_reference_parity():
    """Exact parity with the reference formula (pose_detector.py:57-73)
    across many geometries, including np.round half-to-even cases."""
    def reference(img_h, img_w, size, stride=8):
        ratio = img_h / img_w
        if img_h < img_w:
            h = size
            w = int(np.round(size / ratio))
            if w % stride:
                w += stride - w % stride
        else:
            w = size
            h = int(np.round(size * ratio))
            if h % stride:
                h += stride - h % stride
        return w, h

    rng = np.random.RandomState(0)
    cases = [(480, 640), (640, 480), (584, 584), (368, 368), (37, 91),
             (91, 37), (720, 1280), (1080, 1920), (100, 300)]
    cases += [(int(rng.randint(10, 2000)), int(rng.randint(10, 2000)))
              for _ in range(200)]
    for h, w in cases:
        for target in (368, 320):
            assert compute_optimal_size(h, w, target) == \
                reference(h, w, target), (h, w, target)


def test_gaussian_blur_conv_zero_even_ksize():
    """Even ksize is accepted (the reference's kernel builder centers at
    int(ksize/2) and never requires odd): output equals a direct 2-D
    correlation with the same centering, at input size (see
    conv_gaussian_kernel_1d's docstring for the deviation from the
    reference's off-by-one output canvas)."""
    from scipy.ndimage import correlate
    from tpupose.ops import gaussian_blur_conv_zero

    rng = np.random.RandomState(12)
    x = rng.rand(2, 18, 23).astype(np.float32)
    sigma, k = 2.5, 16
    center = int(k / 2)
    gx = np.tile(np.arange(k), (k, 1))
    d2 = (gx - center) ** 2 + (gx.T - center) ** 2
    kern = 1 / (sigma ** 2 * 2 * np.pi) * np.exp(-0.5 * d2 / sigma ** 2)
    ref = np.stack([correlate(c.astype(np.float64), kern,
                              mode="constant", cval=0.0) for c in x])
    got = np.asarray(gaussian_blur_conv_zero(jnp.asarray(x), sigma, k))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_find_peaks_even_ksize_runs():
    from tpupose.ops import find_peaks

    rng = np.random.RandomState(13)
    heatmaps = _synthetic_heatmaps(rng)
    got = find_peaks(jnp.asarray(heatmaps), CFG.gaussian_sigma,
                     CFG.heatmap_peak_thresh, CFG.max_peaks_per_joint,
                     mode="conv", ksize=16)
    assert int(np.asarray(got.valid).sum()) > 0


def test_gaussian_conv_kernel_rejects_ksize_below_one():
    from tpupose.ops.gaussian import conv_gaussian_kernel_1d

    import pytest

    with pytest.raises(ValueError, match="ksize >= 1"):
        conv_gaussian_kernel_1d(2.5, 0)
