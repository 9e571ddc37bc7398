"""Gaussian heatmap smoothing with SciPy-parity semantics.

The reference smooths each joint heatmap with
``scipy.ndimage.gaussian_filter(heatmap, sigma=2.5)`` before peak NMS
(``/root/reference/pose_detector.py:86``; the GPU path's zero-padded 17x17
conv at ``:112-113`` disagrees with it — SURVEY.md section 7(c) picks the CPU
path as the parity target since it produced the golden images).

SciPy semantics replicated here: kernel radius ``int(truncate*sigma + 0.5)``
with ``truncate=4.0``, Gaussian sampled at integer offsets and normalized to
sum 1, separable correlation with *reflect* boundary (edge pixel mirrored
including itself, i.e. ``jnp.pad(mode="symmetric")``).

On TPU this is two small depthwise convolutions; XLA fuses the symmetric
padding into the surrounding computation.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=32)
def scipy_gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """1-D kernel identical to scipy.ndimage._gaussian_kernel1d (normalized)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    phi /= phi.sum()
    return phi.astype(np.float32)


def gaussian_blur_reflect(heatmaps: jnp.ndarray, sigma: float,
                          truncate: float = 4.0) -> jnp.ndarray:
    """Separable Gaussian blur with scipy 'reflect' boundary.

    heatmaps: (..., H, W) -> same shape, blurred over the last two axes.
    """
    kernel = scipy_gaussian_kernel_1d(sigma, truncate)
    radius = (len(kernel) - 1) // 2
    orig_shape = heatmaps.shape
    h, w = orig_shape[-2], orig_shape[-1]
    x = heatmaps.reshape((-1, h, w))

    # Rows (axis -2).
    xp = jnp.pad(x, ((0, 0), (radius, radius), (0, 0)), mode="symmetric")
    k = jnp.asarray(kernel)
    # Depthwise 1-D conv via conv_general_dilated on NHWC with C=1.
    xp4 = xp[..., None]  # (N, H+2r, W, 1)
    kh = k.reshape(len(kernel), 1, 1, 1)  # HWIO
    # HIGHEST precision: TPU would otherwise run the f32 conv through
    # bf16 MXU passes (~1e-3 error — enough to flip NMS comparisons and
    # break keypoint parity with the SciPy CPU golden path).
    y = lax.conv_general_dilated(
        xp4, kh, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)
    # Cols (axis -1).
    yp = jnp.pad(y[..., 0], ((0, 0), (0, 0), (radius, radius)),
                 mode="symmetric")[..., None]
    kw = k.reshape(1, len(kernel), 1, 1)
    z = lax.conv_general_dilated(
        yp, kw, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)
    return z[..., 0].reshape(orig_shape)
