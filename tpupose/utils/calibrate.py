"""Deterministic output-conv calibration for weightless benchmarking/tests.

No pretrained ``coco_posenet.npz`` exists on this box (zero egress), and a
randomly initialized CocoPoseNet emits ~1e-3-amplitude maps: no peaks, so
the data-dependent postprocess loops (peak tables, greedy matching,
grouping) run near-empty and any measured latency flatters the real
workload.  This helper rescales the stage-6 output convs per channel so the
blurred heatmaps yield ~``n_target`` above-threshold peaks per joint and
the PAF channels have unit amplitude — the network still computes every
real conv, and the postprocess sees realistic irregular maps.

Linear and exact: the output layers have no activation, so scaling
kernel+bias scales the emitted maps exactly.  Used by the golden-parity
harness (``tests/test_golden_parity.py``) and by ``bench.py`` so published
serving numbers exercise a realistically loaded postprocess
(ADVICE r2: random weights made the fast-path numbers flattering).
"""

from __future__ import annotations

import numpy as np


def calibrate_output_convs(det, img, n_target: int = 4,
                           capacity_frac: float = 0.5) -> bool:
    """Rescale ``det``'s stage-6 output convs in place (posenet only).

    ``det``: a PoseDetector; ``img``: the BGR uint8 frame whose maps drive
    the per-channel scale choice (``PoseDetector.compute_maps`` shares the
    traced map code with the detection programs, so calibration sees the
    exact tensors the postprocess will).  Returns False (no-op) when the
    parameter tree lacks the posenet output convs (e.g. a stubbed model in
    tests).

    Capacity-aware (VERDICT r3): a random-weight map's local-max spectrum
    decays slowly, so putting the ``n_target``-th max above threshold can
    put far more than ``max_peaks_per_joint`` maxima above it at precise
    mode's full postprocess resolution — saturating the static peak table
    and firing the divergence RuntimeWarning mid-bench.  The gain is
    therefore capped so the (``capacity_frac * max_peaks_per_joint``)-th
    max stays clearly below threshold; the margin absorbs bench frame
    jitter and the device NMS rule being weaker (4-neighbor strict) than
    this SciPy 8-neighbor count.  Capacity wins over ``n_target``."""
    import jax

    from scipy.ndimage import gaussian_filter, maximum_filter

    # ONE device_get for the whole tree: per-leaf np.asarray would issue
    # ~200 sequential round trips over the (high-latency) remote link.
    p = jax.device_get(det.variables)
    try:
        l2 = p["params"]["stage6_L2"]["Mconv7_stage6_L2"]["conv"]
        l1 = p["params"]["stage6_L1"]["Mconv7_stage6_L1"]["conv"]
    except (KeyError, TypeError):
        return False

    maps, _ = det.compute_maps(img)
    paf0, hm0 = np.asarray(maps[0]), np.asarray(maps[1])

    limit = max(n_target, int(det.cfg.max_peaks_per_joint * capacity_frac))
    hg = np.ones(hm0.shape[0], np.float32)
    for j in range(hm0.shape[0] - 1):  # background channel stays as-is
        sm = gaussian_filter(hm0[j], sigma=det.cfg.gaussian_sigma)
        mx = (sm == maximum_filter(sm, size=3)) & (sm > 0)
        vals = np.sort(sm[mx])[::-1]
        n = min(n_target, len(vals))
        v = vals[n - 1] if n else 1.0
        g = det.cfg.heatmap_peak_thresh * 1.05 / v
        if len(vals) > limit:
            g = min(g, det.cfg.heatmap_peak_thresh * 0.90 / vals[limit])
        hg[j] = g
    pg = (1.0 / np.maximum(np.abs(paf0).max(axis=(1, 2)), 1e-9)
          ).astype(np.float32)

    # Keep each leaf's dtype: the numpy multiply would promote bf16
    # leaves to f32, leaving a mixed-dtype tree that silently retraces
    # every already-compiled program (and breaks serving-bundle export).
    for layer, g in ((l2, hg), (l1, pg)):
        layer["kernel"] = (layer["kernel"]
                           * g[None, None, None, :]).astype(
            layer["kernel"].dtype)
        layer["bias"] = (layer["bias"] * g).astype(layer["bias"].dtype)
    # Commit back to device: leaving the tree as host numpy arrays makes
    # every later dispatch re-upload ~200 MB of params over the tunnel
    # (measured 27 s/frame streaming vs 66 ms committed).
    from tpupose.weights import commit_variables

    det.variables = commit_variables(p, mesh=getattr(det, "mesh", None))
    return True
