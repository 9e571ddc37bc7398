"""Fixed-shape heatmap peak extraction (NMS) for TPU.

Re-design of the reference's dynamic host loop
(``/root/reference/pose_detector.py:75-110``, CPU path = parity target):
per joint channel, Gaussian-smooth then keep pixels that are

* strictly greater than ``heatmap_peak_thresh`` and
* strictly greater than all 4 neighbors, with out-of-image neighbors
  treated as 0 (the reference compares against zero-initialized shift
  buffers at ``:87-102``).

Dynamic peak lists become a static ``(num_joints, K)`` table ordered by the
reference's enumeration order (row-major scan: ascending y, then x — the
order of ``np.nonzero`` at ``:104``), with a validity mask.  Scores are the
*smoothed* heatmap values, as in the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpupose.ops.gaussian import gaussian_blur_conv_zero, gaussian_blur_reflect


class Peaks(NamedTuple):
    """Static-shape peak table.

    x, y:    (J, K) float32 peak coordinates (heatmap pixel space)
    score:   (J, K) float32 smoothed-heatmap value at the peak
    valid:   (J, K) bool
    dropped: () int32 — peaks beyond the static K capacity that were
             silently dropped (saturation signal; 0 = exact reference
             semantics, >0 = a crowd scene overflowed the table)
    """

    x: jnp.ndarray
    y: jnp.ndarray
    score: jnp.ndarray
    valid: jnp.ndarray
    dropped: jnp.ndarray = 0

    @property
    def counts(self) -> jnp.ndarray:
        """(J,) number of valid peaks per joint."""
        return jnp.sum(self.valid, axis=1)


def _neighbor_shifts(h: jnp.ndarray):
    """Zero-padded 4-neighbor shift buffers (up, down, left, right) — the
    reference's ``map_left/right/top/bottom`` construction
    (``pose_detector.py:87-102``, shared by both its NMS rules)."""
    lead = [(0, 0)] * (h.ndim - 2)
    up = jnp.pad(h[..., :-1, :], lead + [(1, 0), (0, 0)])
    down = jnp.pad(h[..., 1:, :], lead + [(0, 1), (0, 0)])
    left = jnp.pad(h[..., :, :-1], lead + [(0, 0), (1, 0)])
    right = jnp.pad(h[..., :, 1:], lead + [(0, 0), (0, 1)])
    return up, down, left, right


def nms_mask(smoothed: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """4-neighbor strict local-max mask with zero borders.

    smoothed: (..., H, W) -> bool mask of the same shape.
    """
    h = smoothed
    up, down, left, right = _neighbor_shifts(h)
    return (
        (h > thresh) & (h > up) & (h > down) & (h > left) & (h > right)
    )


def nms_mask_ge(smoothed: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """4-neighbor ``>=`` local-max mask — the reference's GPU NMS rule.

    Parity with ``pose_detector.py:123-126``: a pixel is a peak when it is
    ``> thresh`` and ``>=`` all four neighbors (zero-padded shift buffers),
    so equal-valued plateau neighbors *all* become peaks — unlike the
    strict-``>`` CPU rule, which emits none of them.
    """
    h = smoothed
    up, down, left, right = _neighbor_shifts(h)
    return (
        (h > thresh) & (h >= up) & (h >= down) & (h >= left) & (h >= right)
    )


def extract_peaks(mask: jnp.ndarray, smoothed: jnp.ndarray,
                  max_peaks: int) -> Peaks:
    """Select up to ``max_peaks`` peaks per joint in row-major scan order.

    mask, smoothed: (J, H, W).  If a joint has more than ``max_peaks``
    peaks, the later ones (in scan order) are dropped — the reference keeps
    all, but >K peaks of one joint type in a single image is far beyond any
    realistic crowd at K=32.
    """
    j, h, w = mask.shape
    hw = h * w
    flat_mask = mask.reshape(j, hw)
    flat_score = smoothed.reshape(j, hw)

    # Key: valid peaks get (hw - scan_idx) > 0, invalid get 0; top_k then
    # yields the first K peaks in ascending scan order.  f32 keys when the
    # values fit a float exactly (hw < 2^24): TPU's f32 top_k is ~5x the
    # int32 path (2.6 vs 12.9 ms at 18x584x584 on a v5e) with identical
    # selections.
    scan_idx = jnp.arange(hw, dtype=jnp.int32)
    key_dtype = jnp.float32 if hw < (1 << 24) else jnp.int32
    key = jnp.where(flat_mask, hw - scan_idx, 0).astype(key_dtype)
    k_eff = min(max_peaks, hw)  # degenerate tiny maps: top_k needs k <= hw
    top_key, top_idx = jax.lax.top_k(key, k_eff)  # (J, k_eff)
    if k_eff < max_peaks:
        pad = [(0, 0), (0, max_peaks - k_eff)]
        top_key = jnp.pad(top_key, pad)
        top_idx = jnp.pad(top_idx, pad)
    valid = top_key > 0
    ys = (top_idx // w).astype(jnp.float32)
    xs = (top_idx % w).astype(jnp.float32)
    scores = jnp.take_along_axis(flat_score, top_idx, axis=1)
    zero = jnp.zeros_like(ys)
    total = jnp.sum(flat_mask, dtype=jnp.int32)
    return Peaks(
        x=jnp.where(valid, xs, zero),
        y=jnp.where(valid, ys, zero),
        score=jnp.where(valid, scores, zero),
        valid=valid,
        dropped=total - jnp.sum(valid, dtype=jnp.int32),
    )


# Map area above which the fused Pallas blur+NMS kernel beats the XLA
# shift-and-add path on a real TPU (measured on a v5e, 18 channels:
# 120x160 XLA 0.08 vs Pallas 0.23 ms; 320x426 0.94 vs 0.72; 584x584
# 2.24 vs 1.66 — crossover between 160p and 240p maps).
_PALLAS_MIN_AREA = 256 * 256


def find_peaks(heatmaps: jnp.ndarray, sigma: float, thresh: float,
               max_peaks: int, use_pallas: bool | None = None,
               mode: str = "scipy", ksize: int = 17) -> Peaks:
    """Full peak pipeline: blur -> NMS -> static top-K extraction.

    heatmaps: (J, H, W) *without* the background channel (the reference
    drops it at ``pose_detector.py:78``).

    ``mode`` selects which of the reference's two (mutually disagreeing)
    NMS paths to reproduce:

    * ``"scipy"`` (default) — the CPU path (``pose_detector.py:82-110``):
      SciPy reflect-boundary Gaussian, strict-``>`` neighbor rule.  This is
      the parity target that produced the golden images (SURVEY.md
      section 7(c)).
    * ``"conv"`` — the GPU path (``:112-126``): zero-padded ``ksize``
      unnormalized Gaussian conv, ``>=`` neighbor rule (plateaus emit
      every tied pixel).

    ``use_pallas`` (scipy mode only) selects the fused Pallas blur+NMS
    kernel (``tpupose/ops/pallas/blur_nms.py``) — a single VMEM-resident
    pass per joint channel, bit-identical to the XLA path on chip.  The
    default ``None`` picks whichever is measured faster: Pallas on a TPU
    backend for maps >= ``_PALLAS_MIN_AREA`` — which covers BOTH precise
    mode's original-resolution maps and the fast path's 320-based maps
    (320x426: 0.72 vs 0.94 ms) — and the XLA shift-and-add otherwise
    (training/eval-sized maps under ~256², where kernel launch overhead
    dominates).
    """
    if mode == "conv":
        if use_pallas:
            raise ValueError("use_pallas supports mode='scipy' only")
        smoothed = gaussian_blur_conv_zero(heatmaps, sigma, ksize)
        mask = nms_mask_ge(smoothed, thresh)
    elif mode != "scipy":
        raise ValueError(f"unknown peak NMS mode {mode!r}")
    else:
        if use_pallas is None:
            use_pallas = (jax.default_backend() == "tpu"
                          and heatmaps.shape[-2] * heatmaps.shape[-1]
                          >= _PALLAS_MIN_AREA)
        if use_pallas:
            from tpupose.ops.pallas.blur_nms import blur_nms_pallas

            smoothed, mask = blur_nms_pallas(
                heatmaps, sigma, thresh,
                interpret=jax.default_backend() != "tpu")
        else:
            smoothed = gaussian_blur_reflect(heatmaps, sigma)
            mask = nms_mask(smoothed, thresh)
    return extract_peaks(mask, smoothed, max_peaks)


def global_argmax_keypoints(heatmaps: jnp.ndarray, sigma: float,
                            thresh: float):
    """Face/hand-style peak: per-channel global argmax of the blurred map.

    Parity with ``face_detector.py:54-66`` / ``hand_detector.py:64-76``:
    each of the first J-1 channels yields (x, y, score) with valid =
    score > thresh.  Returns (x, y, score, valid) arrays of shape (C,).

    heatmaps: (C, H, W) — pass maps *without* the background channel.
    """
    smoothed = gaussian_blur_reflect(heatmaps, sigma)
    c, h, w = smoothed.shape
    flat = smoothed.reshape(c, h * w)
    idx = jnp.argmax(flat, axis=1)
    score = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    ys = (idx // w).astype(jnp.int32)
    xs = (idx % w).astype(jnp.int32)
    return xs, ys, score, score > thresh
