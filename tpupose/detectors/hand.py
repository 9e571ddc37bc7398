"""HandDetector: 21-keypoint hand inference engine.

Facade mirroring ``/root/reference/hand_detector.py:12-87``:
``detector(hand_img, hand_type="right") -> list of 21 [x, y, conf] or
None``.  Left hands are detected by horizontally flipping the input and
un-flipping the heatmaps (ref ``:29-30, 46-47``) — here the heatmap flip
happens on device inside the same jit.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.config import HAND, HandConfig
from tpupose.models import ARCHS
from tpupose.ops.peaks import global_argmax_keypoints
from tpupose.ops.resize import resize_chainer
from tpupose.weights import params_from_npz_auto


class HandDetector:
    def __init__(self, arch: str = "handnet",
                 weights_file: Optional[str] = None,
                 params=None,
                 cfg: HandConfig = HAND,
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

    def _fn(self, crop_hw, flip: bool):
        key = (crop_hw, flip)
        if key not in self._fns:
            cfg = self.cfg
            model = self.model

            def fn(variables, img_u8):
                x = img_u8.astype(jnp.float32) / 256.0 - 0.5
                heatmaps = model.apply(variables, x[None])
                hm = resize_chainer(heatmaps[-1, 0], crop_hw)   # (h, w, 22)
                if flip:
                    hm = hm[:, ::-1, :]
                hm = jnp.transpose(hm, (2, 0, 1))
                return global_argmax_keypoints(
                    hm[:-1], cfg.gaussian_sigma, cfg.heatmap_peak_thresh)

            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def __call__(self, hand_img: np.ndarray, hand_type: str = "right"):
        import cv2

        flip = hand_type == "left"
        if flip:
            hand_img = cv2.flip(hand_img, 1)
        h, w = hand_img.shape[:2]
        resized = cv2.resize(hand_img, (self.cfg.img_size, self.cfg.img_size))
        xs, ys, score, valid = self._fn((h, w), flip)(
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
    #    ``demo.py:44-58``) ------------------------------------------------

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

    def _tail_fn(self, crop_hw, flip: bool):
        key = ("tail", crop_hw, flip)
        if key not in self._fns:
            cfg = self.cfg

            def fn(hm):
                hm = resize_chainer(hm, crop_hw)
                if flip:
                    hm = hm[:, ::-1, :]
                hm = jnp.transpose(hm, (2, 0, 1))
                return global_argmax_keypoints(
                    hm[:-1], cfg.gaussian_sigma, cfg.heatmap_peak_thresh)

            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def detect_batch(self, hand_imgs, hand_types):
        """All hand crops through ONE batched forward (left hands flipped
        on input, heatmaps un-flipped in the per-crop tail)."""
        import cv2

        if not hand_imgs:
            return []
        prepped = []
        for img, hand_type in zip(hand_imgs, hand_types):
            if hand_type == "left":
                img = cv2.flip(img, 1)
            prepped.append(
                cv2.resize(img, (self.cfg.img_size, self.cfg.img_size)))
        heatmaps = self._batch_forward_fn(len(prepped))(
            self.variables, jnp.asarray(np.stack(prepped)))
        out = []
        for i, (img, hand_type) in enumerate(zip(hand_imgs, hand_types)):
            tail = self._tail_fn(img.shape[:2], hand_type == "left")
            out.append(self._to_keypoints(*tail(heatmaps[i])))
        return out


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
