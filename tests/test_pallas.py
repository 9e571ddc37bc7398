"""Pallas kernel parity vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from tpupose.ops.gaussian import gaussian_blur_reflect
from tpupose.ops.pallas.blur_nms import blur_nms_pallas
from tpupose.ops.peaks import find_peaks, nms_mask


def _random_heatmaps(rng, j=18, h=46, w=62):
    hm = rng.rand(j, h, w).astype(np.float32) * 0.3
    # plant sharp peaks
    for c in range(j):
        for _ in range(3):
            y, x = rng.randint(2, h - 2), rng.randint(2, w - 2)
            hm[c, y, x] += rng.uniform(0.5, 1.0)
    return hm


def test_blur_nms_matches_xla_path():
    rng = np.random.RandomState(0)
    hm = _random_heatmaps(rng)
    smoothed_ref = np.asarray(gaussian_blur_reflect(jnp.asarray(hm), 2.5))
    mask_ref = np.asarray(nms_mask(jnp.asarray(smoothed_ref), 0.05))

    smoothed, mask = blur_nms_pallas(jnp.asarray(hm), 2.5, 0.05,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(smoothed), smoothed_ref,
                               atol=2e-6)
    np.testing.assert_array_equal(np.asarray(mask), mask_ref)


def test_blur_nms_small_map_boundaries():
    """Maps smaller than the blur radius exercise repeated reflection."""
    rng = np.random.RandomState(1)
    hm = rng.rand(3, 7, 9).astype(np.float32)
    smoothed_ref = np.asarray(gaussian_blur_reflect(jnp.asarray(hm), 2.5))
    smoothed, _ = blur_nms_pallas(jnp.asarray(hm), 2.5, 0.05,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(smoothed), smoothed_ref,
                               atol=2e-6)


def test_blur_nms_row_tiled_matches_untiled():
    """Multi-tile path (precise mode postprocesses at original image
    resolution, far beyond one VMEM block): tile boundaries must be
    seamless — the NMS at a boundary row compares against the real blurred
    neighbor in the adjacent tile, and a non-divisible height exercises
    the padded last tile."""
    rng = np.random.RandomState(3)
    hm = _random_heatmaps(rng, j=4, h=46, w=30)
    # plant peaks ON the tile boundaries (rows 15/16 and 31/32 at tile_h 16)
    for c in range(4):
        for y in (15, 16, 31, 32):
            hm[c, y, 5 + 3 * c] += 1.0
    one_tile = blur_nms_pallas(jnp.asarray(hm), 2.5, 0.05, interpret=True,
                               tile_h=64)
    tiled = blur_nms_pallas(jnp.asarray(hm), 2.5, 0.05, interpret=True,
                            tile_h=16)  # 46 -> 3 tiles, last one padded
    np.testing.assert_allclose(np.asarray(tiled[0]),
                               np.asarray(one_tile[0]), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(tiled[1]),
                                  np.asarray(one_tile[1]))
    mask_ref = np.asarray(nms_mask(
        gaussian_blur_reflect(jnp.asarray(hm), 2.5), 0.05))
    np.testing.assert_array_equal(np.asarray(tiled[1]), mask_ref)
    assert mask_ref.sum() > 8  # the boundary peaks actually exist


def test_find_peaks_same_result_both_backends():
    rng = np.random.RandomState(2)
    hm = jnp.asarray(_random_heatmaps(rng))
    p_xla = find_peaks(hm, 2.5, 0.05, 16, use_pallas=False)
    p_pallas = find_peaks(hm, 2.5, 0.05, 16, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(p_xla.valid),
                                  np.asarray(p_pallas.valid))
    np.testing.assert_array_equal(np.asarray(p_xla.x),
                                  np.asarray(p_pallas.x))
    np.testing.assert_array_equal(np.asarray(p_xla.y),
                                  np.asarray(p_pallas.y))
    np.testing.assert_allclose(np.asarray(p_xla.score),
                               np.asarray(p_pallas.score), atol=2e-6)
