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


@functools.lru_cache(maxsize=32)
def conv_gaussian_kernel_1d(sigma: float, ksize: int) -> np.ndarray:
    """1-D factor of the reference GPU path's 2-D kernel.

    ``create_gaussian_kernel`` (``pose_detector.py:37-44``) builds the
    *unnormalized* 2-D density ``1/(2*pi*sigma^2) * exp(-d2/(2*sigma^2))``
    on a ``ksize x ksize`` grid centered at ``int(ksize/2)``.  That grid is
    exactly the outer product of this 1-D factor with itself
    (``exp(-(dx^2+dy^2)) = exp(-dx^2) * exp(-dy^2)``), so the smoothing can
    run separably on the VPU instead of as a 289-tap 2-D conv.

    Even ``ksize`` is accepted (the reference's kernel builder is, too):
    the kernel centers at ``ksize // 2`` like the reference.  Note the
    reference's even-ksize conv (``pad=ksize//2`` on both sides) emits a
    map one pixel LARGER than its input, silently shifting downstream peak
    work onto that off-size map; here the output stays input-sized and
    equals the first H x W entries of the reference's — the sane reading
    of a config the reference only nominally supports.
    """
    if ksize < 1:
        raise ValueError(f"conv NMS smoothing needs ksize >= 1, got "
                         f"{ksize} (InferenceConfig.ksize)")
    center = ksize // 2
    d = np.arange(ksize, dtype=np.float64) - center
    phi = np.exp(-0.5 * (d / sigma) ** 2) / np.sqrt(2.0 * np.pi * sigma ** 2)
    return phi.astype(np.float32)


def gaussian_blur_conv_zero(heatmaps: jnp.ndarray, sigma: float,
                            ksize: int) -> jnp.ndarray:
    """Reference-GPU-parity smoothing: zero-padded ``ksize`` Gaussian conv.

    Semantics of the reference's GPU branch (``pose_detector.py:112-113``):
    ``F.convolution_2d(h, kernel, pad=ksize//2)`` with the unnormalized
    kernel above — zero boundary (not reflect) and a kernel whose sum is
    only ~1, so absolute map values differ slightly from the SciPy path.
    Runs through the same :func:`_separable_blur` VPU shift-and-add with
    the exact separable factors and zero padding.

    heatmaps: (..., H, W) -> same shape.
    """
    kernel = conv_gaussian_kernel_1d(sigma, ksize)
    return _separable_blur(heatmaps, kernel, "constant")


def _separable_blur(heatmaps: jnp.ndarray, kernel, pad_mode: str
                    ) -> jnp.ndarray:
    """Separable blur as unrolled f32 shift-and-add over statically
    shifted slices — pure VPU work that XLA fuses into one pass per
    axis.  A depthwise-conv formulation pads the single channel to the
    MXU's 128-lane width (>100x wasted FLOPs) and, run at the
    ``HIGHEST`` precision peak parity needs, costs ~20 ms at 584x584x18
    on a v5e; this form is f32-exact by construction (same tap order as
    the fused Pallas kernel, bit-identical on chip) and runs in well
    under 1 ms.  Symmetric taps applied to equal inputs produce
    bit-equal outputs (the per-position tap products are the same floats
    added in commuting pairs), which preserves the plateau ties the
    conv mode's ``>=`` NMS rule depends on.

    heatmaps: (..., H, W) -> same shape, blurred over the last two axes.
    """
    # Tap alignment: out[i] = sum_t k[t] * x[i + t - center] with
    # center = len//2 — for odd kernels the usual symmetric radius; for
    # even kernels the reference's int(ksize/2) centering (left pad one
    # larger than right).
    center = len(kernel) // 2
    pads = (center, len(kernel) - 1 - center)
    orig_shape = heatmaps.shape
    h, w = orig_shape[-2], orig_shape[-1]
    x = heatmaps.reshape((-1, h, w)).astype(jnp.float32)
    taps = [float(t) for t in kernel]
    pad_kw = {} if pad_mode == "constant" else {"mode": pad_mode}

    # Rows (axis -2): (N, H+k-1, W) -> (N, H, W).
    xp = jnp.pad(x, ((0, 0), pads, (0, 0)), **pad_kw)
    acc = None
    for t, wgt in enumerate(taps):
        sl = xp[:, t:t + h, :] * wgt
        acc = sl if acc is None else acc + sl
    # Cols (axis -1): (N, H, W+k-1) -> (N, H, W).
    yp = jnp.pad(acc, ((0, 0), (0, 0), pads), **pad_kw)
    out = None
    for t, wgt in enumerate(taps):
        sl = yp[:, :, t:t + w] * wgt
        out = sl if out is None else out + sl
    return out.reshape(orig_shape)


def gaussian_blur_reflect(heatmaps: jnp.ndarray, sigma: float,
                          truncate: float = 4.0) -> jnp.ndarray:
    """Separable Gaussian blur with scipy 'reflect' boundary.

    heatmaps: (..., H, W) -> same shape, blurred over the last two axes.
    """
    kernel = scipy_gaussian_kernel_1d(sigma, truncate)
    return _separable_blur(heatmaps, kernel, "symmetric")
