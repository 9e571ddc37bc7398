"""FaceDetector: 70-keypoint face inference engine.

Facade mirroring ``/root/reference/face_detector.py:12-77``:
``detector(face_img) -> list of 70 [x, y, conf] or None`` in crop pixels.

Device path (one jit per crop geometry): normalize (note the reference's
/256 here vs the pose net's /255, ``face_detector.py:32``), FaceNet forward,
align-corners resize of the last-stage heatmaps back to crop size
(``:38``), Gaussian blur + per-channel global argmax (``:54-66``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.config import FACE, FaceConfig
from tpupose.models import ARCHS
from tpupose.ops.peaks import global_argmax_keypoints
from tpupose.ops.resize import resize_chainer
from tpupose.weights import params_from_npz_auto


class FaceDetector:
    def __init__(self, arch: str = "facenet",
                 weights_file: Optional[str] = None,
                 params=None,
                 cfg: FaceConfig = FACE,
                 compute_dtype=jnp.float32):
        self.cfg = cfg
        self.model = ARCHS[arch](dtype=compute_dtype)
        if params is not None:
            self.variables = params if "params" in params else {
                "params": params}
        elif weights_file:
            self.variables, _ = params_from_npz_auto(weights_file, self.model)
        else:
            dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
            self.variables = self.model.init(jax.random.PRNGKey(0), dummy)
        self._fns: Dict[tuple, object] = {}

    def _fn(self, crop_hw):
        if crop_hw not in self._fns:
            cfg = self.cfg
            model = self.model

            def fn(variables, img_u8):
                # Reference normalizes face/hand crops by /256 (not /255).
                x = img_u8.astype(jnp.float32) / 256.0 - 0.5
                heatmaps = model.apply(variables, x[None])
                hm = resize_chainer(heatmaps[-1, 0], crop_hw)   # (h, w, 71)
                hm = jnp.transpose(hm, (2, 0, 1))
                return global_argmax_keypoints(
                    hm[:-1], cfg.gaussian_sigma, cfg.heatmap_peak_thresh)

            self._fns[crop_hw] = jax.jit(fn)
        return self._fns[crop_hw]

    def __call__(self, face_img: np.ndarray):
        import cv2

        h, w = face_img.shape[:2]
        resized = cv2.resize(face_img, (self.cfg.img_size, self.cfg.img_size))
        xs, ys, score, valid = self._fn((h, w))(
            self.variables, jnp.asarray(resized))
        return self._to_keypoints(xs, ys, score, valid)

    @staticmethod
    def _to_keypoints(xs, ys, score, valid):
        xs, ys = np.asarray(xs), np.asarray(ys)
        score, valid = np.asarray(score), np.asarray(valid)
        return [
            [int(xs[i]), int(ys[i]), float(score[i])] if valid[i] else None
            for i in range(len(xs))
        ]

    # -- batched crops (new: the reference runs crops serially per person,
    #    ``demo.py:31-49``) ------------------------------------------------

    def _batch_forward_fn(self, batch: int):
        key = ("batch", batch)
        if key not in self._fns:
            model = self.model

            def fn(variables, imgs_u8):
                x = imgs_u8.astype(jnp.float32) / 256.0 - 0.5
                heatmaps = model.apply(variables, x)
                return heatmaps[-1]            # (B, h, w, C)

            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def _tail_fn(self, crop_hw):
        key = ("tail", crop_hw)
        if key not in self._fns:
            cfg = self.cfg

            def fn(hm):
                hm = resize_chainer(hm, crop_hw)
                hm = jnp.transpose(hm, (2, 0, 1))
                return global_argmax_keypoints(
                    hm[:-1], cfg.gaussian_sigma, cfg.heatmap_peak_thresh)

            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def detect_batch(self, face_imgs):
        """All persons' face crops through ONE batched forward; per-crop
        resize+argmax tails stay jitted per geometry.  Returns a list of
        per-crop keypoint lists."""
        import cv2

        if not face_imgs:
            return []
        resized = np.stack([
            cv2.resize(img, (self.cfg.img_size, self.cfg.img_size))
            for img in face_imgs])
        heatmaps = self._batch_forward_fn(len(face_imgs))(
            self.variables, jnp.asarray(resized))
        out = []
        for i, img in enumerate(face_imgs):
            tail = self._tail_fn(img.shape[:2])
            out.append(self._to_keypoints(*tail(heatmaps[i])))
        return out


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
