"""FaceDetector: 70-keypoint face inference engine.

Facade mirroring ``/root/reference/face_detector.py:12-77``:
``detector(face_img) -> list of 70 [x, y, conf] or None`` in crop pixels.
All the pipeline mechanics (the /256 normalization, align-corners heatmap
resize, blur+argmax, batched crops) live in the shared
``CropKeypointDetector``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tpupose.config import FACE, FaceConfig
from tpupose.detectors.crop_keypoints import CropKeypointDetector


class FaceDetector(CropKeypointDetector):
    def __init__(self, arch: str = "facenet",
                 weights_file: Optional[str] = None,
                 params=None,
                 cfg: FaceConfig = FACE,
                 compute_dtype=jnp.float32,
                 tail_stride: int = 1):
        super().__init__(arch, cfg, weights_file=weights_file,
                         params=params, compute_dtype=compute_dtype,
                         tail_stride=tail_stride)

    def __call__(self, face_img: np.ndarray):
        return self.detect_crop(face_img)

    def detect_batch(self, face_imgs):
        """All persons' face crops through one batched forward."""
        return self.detect_crops(face_imgs)


def _main():
    """CLI parity with ``face_detector.py:116-139``:
    ``python -m tpupose.detectors.face facenet <npz> --img face.png``"""
    import argparse

    import cv2

    from tpupose.detectors.draw import draw_face_keypoints

    p = argparse.ArgumentParser(description="Face detector")
    p.add_argument("arch", choices=("facenet",))
    p.add_argument("weights", help="weights file path (.npz)")
    p.add_argument("--img", required=True)
    p.add_argument("--out", default="result.png")
    args = p.parse_args()

    detector = FaceDetector(args.arch, weights_file=args.weights)
    img = cv2.imread(args.img)
    keypoints = detector(img)
    print(f"Saving result into {args.out}...")
    cv2.imwrite(args.out, draw_face_keypoints(img, keypoints, (0, 0)))


if __name__ == "__main__":
    _main()
