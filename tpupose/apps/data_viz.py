"""Data-pipeline visual check: render GT PAF/heatmap/mask overlays.

Headless-friendly equivalent of the reference's eyeball loops
(``/root/reference/coco_data_loader.py:359-387`` shows augmented samples
with PAF hue-wheel + heatmap colormap + ignore-mask overlays in a cv2
window; ``gen_ignore_mask.py --vis`` does the same for masks).  Writes
``<out>/sample_<i>.png`` side-by-side panels instead of opening windows
(optionally ``--show`` for an interactive window), with the GT maps coming
from the same on-device renderers the trainer uses.

Usage:
  python -m tpupose.apps.data_viz --coco_dir coco --out viz [--n 8]
      [--insize 368] [--split train] [--show]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def overlay_pafs(img: np.ndarray, pafs: np.ndarray) -> np.ndarray:
    """PAF field as hue (direction) / saturation+value (magnitude), mixed
    per-pixel across limbs (ref ``coco_data_loader.py:29-50``)."""
    import cv2

    paf_xy = pafs.reshape(-1, 2, *pafs.shape[1:])   # (L, 2, H, W)
    nonzero = (paf_xy != 0).any(axis=1)             # (L, H, W)
    counts = np.maximum(nonzero.sum(axis=0), 1)
    mix = paf_xy.sum(axis=0) / counts               # (2, H, W)
    hue = (np.arctan2(mix[1], mix[0]) / np.pi) / -2 + 0.5
    sat = np.minimum(np.hypot(mix[0], mix[1]), 1.0)
    hsv = np.stack([hue * 180, sat * 255, sat * 255],
                   axis=-1).astype(np.uint8)
    rgb = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    return cv2.addWeighted(img, 0.6, rgb, 0.4, 0)


def overlay_heatmap(img: np.ndarray, heatmap: np.ndarray) -> np.ndarray:
    """Max-combined joint heatmap under a JET colormap
    (ref ``:52-55, 381``)."""
    import cv2

    colored = cv2.applyColorMap(
        np.clip(heatmap * 255, 0, 255).astype(np.uint8), cv2.COLORMAP_JET)
    return cv2.addWeighted(img, 0.6, colored, 0.4, 0)


def overlay_ignore_mask(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Black out ignored regions (ref ``:57-59``)."""
    return img * (~mask).astype(np.uint8)[:, :, None]


def render_panel(img, poses, ignore_mask, cfg):
    """One sample -> side-by-side (raw | paf+heatmap+mask overlay)."""
    import jax.numpy as jnp

    from tpupose.data.gt import render_labels

    h, w = img.shape[:2]
    pafs, heatmaps = render_labels(
        jnp.asarray(poses), h, w, cfg.heatmap_sigma, cfg.paf_sigma)
    pafs = np.asarray(pafs)
    heatmaps = np.asarray(heatmaps)

    shown = img.copy()
    shown = overlay_pafs(shown, pafs)
    shown = overlay_heatmap(shown, heatmaps[:-1].max(axis=0))
    shown = overlay_ignore_mask(shown, ignore_mask)
    return np.hstack([img, shown])


def main(argv=None):
    import cv2

    from tpupose.config import TrainConfig
    from tpupose.data import CocoPoseDataset

    p = argparse.ArgumentParser(description="GT label visual check")
    p.add_argument("--coco_dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--out", default="viz")
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--insize", type=int, default=368)
    p.add_argument("--show", action="store_true",
                   help="interactive window instead of files")
    args = p.parse_args(argv)

    cfg = TrainConfig(insize=args.insize)
    ds = CocoPoseDataset(
        os.path.join(args.coco_dir, "annotations",
                     f"person_keypoints_{args.split}2017.json"),
        os.path.join(args.coco_dir, f"{args.split}2017"),
        mask_dir=os.path.join(args.coco_dir,
                              f"ignore_mask_{args.split}2017"),
        mode="train", cfg=cfg)

    os.makedirs(args.out, exist_ok=True)
    for i in range(min(args.n, len(ds))):
        img, poses, mask = ds.sample(i)
        panel = render_panel(img, poses, mask, cfg)
        if args.show:
            cv2.imshow("w", panel)
            if cv2.waitKey(0) == ord("q"):
                break
        else:
            path = os.path.join(args.out, f"sample_{i}.png")
            cv2.imwrite(path, panel)
            print("wrote", path)


if __name__ == "__main__":
    main()
