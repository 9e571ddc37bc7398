"""Image/featuremap resizing as MXU-friendly dense interpolation matmuls.

The reference mixes three resize semantics (SURVEY.md section 7 hard-part b):

* ``chainer.functions.resize_images`` — bilinear with *align-corners*
  coordinates, ``src = dst * (in-1)/(out-1)`` (used on device at
  ``/root/reference/pose_detector.py:501-502`` and in the training loss
  ``train_coco_pose_estimation.py:57-60``).
* ``cv2.resize(..., INTER_LINEAR)`` — bilinear with *half-pixel* coordinates
  ``src = (dst+0.5)*in/out - 0.5`` (default preprocessing resize,
  ``pose_detector.py:493``).
* ``cv2.resize(..., INTER_CUBIC)`` — 4-tap Keys cubic (a = -0.75) with
  half-pixel coordinates (precise mode, ``pose_detector.py:439-467``).

Rather than translating those host loops, each 2-D resize is expressed as two
dense matmuls ``out = M_h @ x @ M_w^T`` with interpolation matrices
precomputed on the host at trace time.  On TPU this maps directly onto the
MXU and XLA fuses the pair; sizes here are at most ~2000, so the matrices
are tiny relative to HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_matrix_align_corners(in_size: int, out_size: int) -> np.ndarray:
    """(out,in) bilinear weights, align-corners (Chainer resize_images)."""
    m = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    if out_size == 1:
        # src = 0 under align-corners scaling.
        m[0, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    frac = (src - i0).astype(np.float64)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), (1.0 - frac).astype(np.float32))
    np.add.at(m, (rows, i1), frac.astype(np.float32))
    return m


@functools.lru_cache(maxsize=256)
def _linear_matrix_half_pixel(in_size: int, out_size: int) -> np.ndarray:
    """(out,in) bilinear weights, half-pixel centers (cv2 INTER_LINEAR)."""
    m = np.zeros((out_size, in_size), np.float32)
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    i0c = np.clip(i0, 0, in_size - 1)
    i1c = np.clip(i0 + 1, 0, in_size - 1)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0c), (1.0 - frac).astype(np.float32))
    np.add.at(m, (rows, i1c), frac.astype(np.float32))
    return m


def _keys_cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (cv2's INTER_CUBIC uses a = -0.75)."""
    t = np.abs(t)
    w = np.where(
        t <= 1.0,
        (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
        np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a,
                 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def _cubic_matrix_half_pixel(in_size: int, out_size: int) -> np.ndarray:
    """(out,in) 4-tap cubic weights, half-pixel centers + edge clamp."""
    m = np.zeros((out_size, in_size), np.float32)
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    rows = np.arange(out_size)
    for tap in (-1, 0, 1, 2):
        w = _keys_cubic_weight(frac - tap)
        idx = np.clip(i0 + tap, 0, in_size - 1)
        np.add.at(m, (rows, idx), w.astype(np.float32))
    return m


_MATRIX_BUILDERS = {
    "linear_align_corners": _linear_matrix_align_corners,
    "linear_half_pixel": _linear_matrix_half_pixel,
    "cubic_half_pixel": _cubic_matrix_half_pixel,
}


def resize_hw(x: jnp.ndarray, out_hw: Tuple[int, int],
              method: str = "linear_half_pixel") -> jnp.ndarray:
    """Resize the (-3, -2) spatial axes of a channels-last array.

    x: (..., H, W, C) -> (..., out_h, out_w, C).  ``method`` is one of
    ``linear_align_corners`` (Chainer F.resize_images),
    ``linear_half_pixel`` (cv2 INTER_LINEAR),
    ``cubic_half_pixel`` (cv2 INTER_CUBIC).
    """
    builder = _MATRIX_BUILDERS[method]
    in_h, in_w = x.shape[-3], x.shape[-2]
    out_h, out_w = out_hw
    if (in_h, in_w) == (out_h, out_w):
        return x
    mh = jnp.asarray(builder(in_h, out_h))
    mw = jnp.asarray(builder(in_w, out_w))
    # HIGHEST precision: on TPU the MXU would otherwise run these in
    # bf16, costing ~1e-3 absolute error — enough to move integer peak
    # coordinates and break keypoint parity.
    import jax

    y = jnp.einsum("oh,...hwc->...owc", mh, x,
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,...owc->...opc", mw, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y


def resize_chainer(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Chainer ``F.resize_images`` parity (align-corners bilinear)."""
    return resize_hw(x, out_hw, "linear_align_corners")


def resize_cv2_linear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2 ``INTER_LINEAR`` parity (half-pixel bilinear)."""
    return resize_hw(x, out_hw, "linear_half_pixel")


def resize_cv2_cubic(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2 ``INTER_CUBIC`` parity (half-pixel Keys cubic, a=-0.75)."""
    return resize_hw(x, out_hw, "cubic_half_pixel")


def compute_optimal_size(img_h: int, img_w: int, target: int,
                         stride: int = 8) -> Tuple[int, int]:
    """Scale so the *short* side ~= target, long side rounded up to a stride
    multiple; returns (width, height).  Parity with
    ``pose_detector.py:57-73`` including its ``np.round`` half-to-even.
    """
    aspect = img_h / img_w
    if img_h < img_w:
        out_h = target
        # np.round rounds half to even; python round() matches for this use.
        out_w = int(np.round(target / aspect))
        if out_w % stride != 0:
            out_w += stride - out_w % stride
    else:
        out_w = target
        out_h = int(np.round(target * aspect))
        if out_h % stride != 0:
            out_h += stride - out_h % stride
    return out_w, out_h
