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
