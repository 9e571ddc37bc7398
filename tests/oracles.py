"""Dynamic-shape NumPy oracles with the reference's exact semantics.

These re-state the algorithms of ``/root/reference/pose_detector.py``
(peaks ``:75-110``, candidate connections ``:135-159``, greedy matching
``:161-181``) in plain NumPy with dynamic lists, used as the ground truth
the fixed-shape TPU kernels are tested against.  Peaks are addressed as
(joint, slot-within-joint) rather than global ids — a bijective relabeling
(ids are only compared within a joint column).
"""

import numpy as np
from scipy.ndimage import gaussian_filter

from tpupose.config import LIMBS, InferenceConfig


def oracle_peaks(heatmaps, cfg: InferenceConfig):
    """heatmaps: (18, H, W) without background.  Returns per-joint list of
    (x, y, score) in row-major scan order; scores from the smoothed map."""
    out = []
    for hm in heatmaps:
        smoothed = gaussian_filter(hm, sigma=cfg.gaussian_sigma)
        h, w = smoothed.shape
        left = np.zeros_like(smoothed)
        right = np.zeros_like(smoothed)
        top = np.zeros_like(smoothed)
        bottom = np.zeros_like(smoothed)
        left[1:, :] = smoothed[:-1, :]
        right[:-1, :] = smoothed[1:, :]
        top[:, 1:] = smoothed[:, :-1]
        bottom[:, :-1] = smoothed[:, 1:]
        mask = (
            (smoothed > cfg.heatmap_peak_thresh)
            & (smoothed > left) & (smoothed > right)
            & (smoothed > top) & (smoothed > bottom)
        )
        ys, xs = np.nonzero(mask)
        out.append([(int(x), int(y), float(smoothed[y, x]))
                    for y, x in zip(ys, xs)])
    return out


def oracle_peaks_conv(heatmaps, cfg: InferenceConfig):
    """The reference's *GPU* peak path (``pose_detector.py:112-133``):
    zero-padded conv with the unnormalized ``create_gaussian_kernel``
    (``:37-44``) density, ``>=`` 4-neighbor rule (plateaus emit every tied
    pixel).  Full 2-D f64 convolution — deliberately NOT the separable
    form the device kernel uses.  Same (x, y, score) row format as
    :func:`oracle_peaks`."""
    from scipy.ndimage import correlate

    k, sigma = cfg.ksize, cfg.gaussian_sigma
    center = int(k / 2)
    grid_x = np.tile(np.arange(k), (k, 1))
    grid_y = grid_x.T.copy()
    d2 = (grid_x - center) ** 2 + (grid_y - center) ** 2
    kernel = 1 / (sigma ** 2 * 2 * np.pi) * np.exp(-0.5 * d2 / sigma ** 2)

    out = []
    for hm in heatmaps:
        smoothed = correlate(hm.astype(np.float64), kernel,
                             mode="constant", cval=0.0)
        left = np.zeros_like(smoothed)
        right = np.zeros_like(smoothed)
        top = np.zeros_like(smoothed)
        bottom = np.zeros_like(smoothed)
        left[1:, :] = smoothed[:-1, :]
        right[:-1, :] = smoothed[1:, :]
        top[:, 1:] = smoothed[:, :-1]
        bottom[:, :-1] = smoothed[:, 1:]
        mask = (
            (smoothed > cfg.heatmap_peak_thresh)
            & (smoothed >= left) & (smoothed >= right)
            & (smoothed >= top) & (smoothed >= bottom)
        )
        ys, xs = np.nonzero(mask)
        out.append([(int(x), int(y), float(smoothed[y, x]))
                    for y, x in zip(ys, xs)])
    return out


def oracle_candidate_connections(paf, cand_a, cand_b, img_len,
                                 cfg: InferenceConfig):
    """paf: (2, H, W).  cand_a/cand_b: lists of (x, y, score).  Returns
    [(slot_a, slot_b, score)] sorted by score desc (stable)."""
    cands = []
    for ia, (ax, ay, _) in enumerate(cand_a):
        for ib, (bx, by, _) in enumerate(cand_b):
            vx, vy = bx - ax, by - ay
            norm = float(np.hypot(vx, vy))
            if norm == 0:
                continue
            ys = np.linspace(ay, by, num=cfg.n_integ_points)
            xs = np.linspace(ax, bx, num=cfg.n_integ_points)
            yi = np.round(ys).astype(int)
            xi = np.round(xs).astype(int)
            inner = (paf[0][yi, xi] * (vx / norm)
                     + paf[1][yi, xi] * (vy / norm))
            integ = float(inner.sum() / len(inner))
            score = integ + min(
                cfg.limb_length_ratio * img_len / norm
                - cfg.length_penalty_value, 0.0)
            n_valid = int(np.sum(inner > cfg.inner_product_thresh))
            if n_valid > cfg.n_integ_points_thresh and score > 0:
                cands.append((ia, ib, score))
    return sorted(cands, key=lambda c: c[2], reverse=True)


def oracle_full_pipeline(pafs, heatmaps, cfg: InferenceConfig,
                         scale_x=1.0, scale_y=1.0):
    """The complete reference postprocess on host, dynamic shapes end to
    end: peaks -> candidate connections -> greedy matching -> grouping ->
    pose arrays scaled to original pixels (``pose_detector.py:508-517``).

    pafs: (38, H, W); heatmaps: (19, H, W) — the maps at postprocess
    resolution (as returned by ``PoseDetector.compute_maps``).
    Returns (poses (N, 18, 3) float64, scores (N,), peaks_per_joint).
    Raises if any joint's peak count exceeds the static capacity — the
    device table would silently truncate there, so the comparison would
    be invalid rather than failing loudly.
    """
    from tpupose.ops.grouping import group_keypoints_numpy

    img_len = pafs.shape[2]
    peak_fn = (oracle_peaks_conv if cfg.nms_mode == "conv"
               else oracle_peaks)
    peaks = peak_fn(heatmaps[:-1], cfg)
    k = cfg.max_peaks_per_joint
    counts = [len(p) for p in peaks]
    if max(counts) > k:
        raise AssertionError(
            f"oracle peak counts {counts} exceed static capacity K={k}; "
            "recalibrate the harness weights")
    conns = oracle_connections(pafs, peaks, img_len, cfg)
    peak_scores = np.zeros((len(peaks), k), np.float32)
    for j, plist in enumerate(peaks):
        for i, (_, _, s) in enumerate(plist):
            peak_scores[j, i] = s
    subsets = group_keypoints_numpy(conns, peak_scores, cfg)
    poses, scores = [], []
    for s in subsets:
        pose = np.zeros((len(peaks), 3), np.float64)
        for j in range(len(peaks)):
            slot = s["j"][j]
            if slot >= 0:
                x, y, _ = peaks[j][slot]
                pose[j] = (x * scale_x, y * scale_y, 2)
        poses.append(pose)
        scores.append(float(s["score"]))
    poses = (np.stack(poses) if poses
             else np.zeros((0, len(peaks), 3), np.float64))
    return poses, np.asarray(scores, np.float64), peaks


def oracle_connections(pafs, peaks_per_joint, img_len, cfg: InferenceConfig):
    """pafs: (38, H, W).  Returns per-limb list of accepted
    (slot_a, slot_b, score) in greedy order."""
    all_connections = []
    for l, (ja, jb) in enumerate(LIMBS):
        paf = pafs[2 * l:2 * l + 2]
        cand_a = peaks_per_joint[ja]
        cand_b = peaks_per_joint[jb]
        conns = []
        if cand_a and cand_b:
            used_a, used_b = set(), set()
            for ia, ib, score in oracle_candidate_connections(
                    paf, cand_a, cand_b, img_len, cfg):
                if ia not in used_a and ib not in used_b:
                    conns.append((ia, ib, score))
                    used_a.add(ia)
                    used_b.add(ib)
                    if len(conns) >= min(len(cand_a), len(cand_b)):
                        break
        all_connections.append(conns)
    return all_connections
