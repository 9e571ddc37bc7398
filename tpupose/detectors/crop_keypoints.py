"""Shared crop-keypoint engine behind FaceDetector and HandDetector.

The reference implements face and hand inference as two near-identical
classes (``/root/reference/face_detector.py:12-77`` vs
``hand_detector.py:12-87`` — same normalize/forward/resize/argmax pipeline,
differing only in keypoint count and the left-hand flip).  This base class
holds the one pipeline; the subclasses contribute their config and flip
policy.

Device path per crop geometry (one jit each): normalize by **/256 - 0.5**
(the face/hand nets' convention, ``face_detector.py:32`` — note it differs
from the pose net's /255), forward, Chainer align-corners resize of the
last-stage heatmaps back to crop size, optional horizontal un-flip,
Gaussian blur + per-channel global argmax with a confidence threshold.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.models import ARCHS
from tpupose.ops.peaks import global_argmax_keypoints
from tpupose.ops.resize import resize_chainer
from tpupose.weights import (commit_variables, params_from_npz_auto,
                             warn_on_load_report)


class CropKeypointDetector:
    """Runs a single-branch CPM net on fixed-size crops and extracts one
    keypoint per channel."""

    def __init__(self, arch: str, cfg,
                 weights_file: Optional[str] = None,
                 params=None,
                 compute_dtype=jnp.float32,
                 tail_stride: int = 1):
        """``tail_stride`` > 1 rounds each crop's tail-resize target up to a
        multiple, so streaming workloads with continuously varying crop
        sizes (person boxes derive from float unit lengths) compile a
        BOUNDED set of tail programs instead of one per unique (h, w);
        keypoint coordinates are rescaled back to the true crop size
        (<= ~1 px shift).  1 = exact reference semantics (argmax at crop
        resolution, ``face_detector.py:38,54-66``)."""
        self.arch = arch
        self.cfg = cfg
        self.tail_stride = tail_stride
        self.model = ARCHS[arch](dtype=compute_dtype)
        if params is not None:
            self.variables = params if "params" in params else {
                "params": params}
        elif weights_file:
            self.variables, report = params_from_npz_auto(
                weights_file, self.model)
            warn_on_load_report(report, weights_file, arch=arch)
        else:
            # param shapes are input-size independent; small dummy = cheap
            # eager init
            dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
            self.variables = self.model.init(jax.random.PRNGKey(0), dummy)
        # Host (numpy) trees — the npz path and user-supplied params —
        # would be re-uploaded on EVERY dispatch; commit once (pre-cast to
        # a non-f32 compute dtype: numerically free, halves the tree's
        # HBM footprint and one-time upload).
        self.variables = commit_variables(
            self.variables,
            dtype=None if compute_dtype == jnp.float32 else compute_dtype)
        # The forward seam the batched programs dispatch through; swapped
        # by ``quantize()`` for the w8a8 int8-MXU forward (tpupose/quant.py).
        # Late-binds self.model so tests may stub it after construction.
        self._apply = lambda variables, x: self.model.apply(variables, x)
        # Export-portable twin (``detectors/portable.py``): the crop nets
        # run at the fixed crop insize (stage grids 46x46, above the
        # conv7 crossover — ``ops/pallas/conv7.py::use_for_layer``), so
        # no layer ever routes to the Mosaic kernel and the twin is
        # always the same function; kept so ``portable_programs`` works
        # uniformly across detector classes.
        self._apply_portable = self._apply
        self.quantized = False
        self._fns: Dict[tuple, object] = {}

    def quantize(self, calib_crops) -> None:
        """Switch to post-training w8a8 int8 inference (see
        ``PoseDetector.quantize`` / ``tpupose/quant.py``).  ``calib_crops``:
        a few representative HWC uint8 crops (any same size)."""
        import cv2

        from tpupose.quant import (calibrate_ranges, make_quant_apply,
                                   quantize)

        if self.quantized:
            raise ValueError("detector is already quantized")
        size = self.cfg.img_size
        frames = np.stack([
            cv2.resize(np.asarray(c), (size, size)) for c in calib_crops])
        normalized = jnp.asarray(frames).astype(jnp.float32) / 256.0 - 0.5
        ranges = calibrate_ranges(self.model, self.variables, normalized)
        qtree, static = quantize(self.arch, self.variables, ranges)
        self.variables = commit_variables(qtree)
        self._apply = make_quant_apply(static)
        self._apply_portable = self._apply
        self.quantized = True
        self._clear_program_caches()

    def _clear_program_caches(self) -> None:
        self._fns.clear()

    # ------------------------------------------------------------------

    @staticmethod
    def _to_keypoints(outputs, scale=(1.0, 1.0)):
        """(xs, ys, score, valid) device outputs -> list of [x, y, conf] or
        None per channel (the reference's per-keypoint threshold gating).

        One ``jax.device_get`` for the whole tuple — per-array fetches
        would issue four sequential round trips per crop."""
        xs, ys, score, valid = jax.device_get(outputs)
        sx, sy = scale
        return [
            [int(round(xs[i] * sx)), int(round(ys[i] * sy)),
             float(score[i])] if valid[i] else None
            for i in range(len(xs))
        ]

    def _tail_target(self, crop_hw):
        """Tail-resize target (== crop size at stride 1) and the coord
        rescale back to true crop pixels (align-corners mapping)."""
        s = self.tail_stride
        h, w = crop_hw
        if s <= 1:
            return (h, w), (1.0, 1.0)
        th = -(-h // s) * s
        tw = -(-w // s) * s
        return (th, tw), ((w - 1) / max(tw - 1, 1),
                          (h - 1) / max(th - 1, 1))

    def _tail_traced(self, hm, crop_hw, flip: bool):
        """Heatmap -> keypoints tail body (resize to crop, optional
        un-flip, blur + per-channel global argmax) — shared by the jitted
        per-geometry tail and the bench's chained device timer."""
        hm = resize_chainer(hm, crop_hw)
        if flip:
            hm = hm[:, ::-1, :]
        hm = jnp.transpose(hm, (2, 0, 1))
        return global_argmax_keypoints(
            hm[:-1], self.cfg.gaussian_sigma, self.cfg.heatmap_peak_thresh)

    def _tail_fn(self, crop_hw, flip: bool):
        """Heatmap -> keypoints tail, jitted per crop geometry."""
        key = ("tail", crop_hw, flip)
        if key not in self._fns:

            def fn(hm):
                return self._tail_traced(hm, crop_hw, flip)

            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def _batch_forward_fn(self, batch: int):
        key = ("batch", batch)
        if key not in self._fns:
            apply_fn = self._apply

            def fn(variables, imgs_u8):
                x = imgs_u8.astype(jnp.float32) / 256.0 - 0.5
                heatmaps = apply_fn(variables, x)
                return heatmaps[-1]            # (B, h, w, C)

            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    # ------------------------------------------------------------------

    def detect_crop(self, crop: np.ndarray, flip: bool = False):
        """One crop -> keypoint list (flip: mirror input, un-mirror the
        heatmaps on device — the left-hand path).

        Runs as a batch of one: the net forward is keyed on batch size
        only, so varying crop geometries recompile just the small
        resize+argmax tail, never the ~50-conv network (fusing forward+
        tail per geometry made streaming recompile the whole net per
        frame)."""
        return self.detect_crops([crop], [flip])[0]

    def detect_crops(self, crops, flips=None):
        """All crops through ONE batched forward (the reference runs crops
        serially per person, ``demo.py:31-58``); per-crop resize+argmax
        tails stay jitted per geometry."""
        return self.collect_crops(self.submit_crops(crops, flips))

    def submit_crops(self, crops, flips=None):
        """Dispatch the batched forward + per-crop tails WITHOUT blocking
        — returns a pending handle for :meth:`collect_crops`.

        The streaming-pipeline API, mirroring ``PoseDetector.submit``:
        JAX dispatch is asynchronous, so a capture loop can overlap host
        work (locating faces in frame N, drawing frame N-1) with device
        compute of the crops in flight; only ``collect_crops`` forces the
        device->host transfer.  The reference's face loop is strictly
        serial per frame (``camera_face_demo.py:26-59``)."""
        import cv2

        if not crops:
            return []
        flips = flips or [False] * len(crops)
        prepped = []
        for crop, flip in zip(crops, flips):
            if flip:
                crop = cv2.flip(crop, 1)
            prepped.append(
                cv2.resize(crop, (self.cfg.img_size, self.cfg.img_size)))
        heatmaps = self._batch_forward_fn(len(prepped))(
            self.variables, jnp.asarray(np.stack(prepped)))
        pending = []
        for i, (crop, flip) in enumerate(zip(crops, flips)):
            target_hw, scale = self._tail_target(crop.shape[:2])
            tail = self._tail_fn(target_hw, flip)
            pending.append((tail(heatmaps[i]), scale))
        return pending

    def collect_crops(self, pending):
        """Block on a ``submit_crops`` handle; keypoint lists per crop."""
        return [self._to_keypoints(outputs, scale=scale)
                for outputs, scale in pending]
