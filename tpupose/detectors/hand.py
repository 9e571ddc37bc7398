"""HandDetector: 21-keypoint hand inference engine.

Facade mirroring ``/root/reference/hand_detector.py:12-87``:
``detector(hand_img, hand_type="right") -> list of 21 [x, y, conf] or
None``.  Left hands are detected by horizontally flipping the input and
un-flipping the heatmaps (ref ``:29-30, 46-47``); the pipeline mechanics
live in the shared ``CropKeypointDetector`` (flip happens on device inside
the same jit).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tpupose.config import HAND, HandConfig
from tpupose.detectors.crop_keypoints import CropKeypointDetector


class HandDetector(CropKeypointDetector):
    def __init__(self, arch: str = "handnet",
                 weights_file: Optional[str] = None,
                 params=None,
                 cfg: HandConfig = HAND,
                 compute_dtype=jnp.float32,
                 tail_stride: int = 1):
        super().__init__(arch, cfg, weights_file=weights_file,
                         params=params, compute_dtype=compute_dtype,
                         tail_stride=tail_stride)

    def __call__(self, hand_img: np.ndarray, hand_type: str = "right"):
        return self.detect_crop(hand_img, flip=(hand_type == "left"))

    def detect_batch(self, hand_imgs, hand_types):
        """All hand crops through one batched forward (left hands flipped
        on input, heatmaps un-flipped in the per-crop tail)."""
        return self.detect_crops(
            hand_imgs, [t == "left" for t in hand_types])


def _main():
    """CLI parity with ``hand_detector.py:119-140``:
    ``python -m tpupose.detectors.hand handnet <npz> --img hand.png``"""
    import argparse

    import cv2

    from tpupose.detectors.draw import draw_hand_keypoints

    p = argparse.ArgumentParser(description="Hand detector")
    p.add_argument("arch", choices=("handnet",))
    p.add_argument("weights", help="weights file path (.npz)")
    p.add_argument("--img", required=True)
    p.add_argument("--hand-type", default="right", choices=("left", "right"))
    p.add_argument("--out", default="result.png")
    args = p.parse_args()

    detector = HandDetector(args.arch, weights_file=args.weights)
    img = cv2.imread(args.img)
    keypoints = detector(img, hand_type=args.hand_type)
    print(f"Saving result into {args.out}...")
    cv2.imwrite(args.out, draw_hand_keypoints(img, keypoints, (0, 0)))


if __name__ == "__main__":
    _main()
