"""PoseDetector: the multi-person pose inference engine.

API-compatible facade over the TPU pipeline, mirroring
``/root/reference/pose_detector.py:15-517``: ``detector(img) -> (poses,
scores)`` with ``poses: (N, 18, 3)`` rows of ``(x, y, 2)`` in original image
pixels.

TPU-first design differences from the reference (same results):

* The whole device path — normalize, CNN forward, map resize, Gaussian
  smoothing, peak NMS, PAF scoring, greedy matching, grouping — is ONE
  jitted function per input geometry; the host<->device boundary is crossed
  exactly twice per frame (reference: same for the forward, but its entire
  postprocess is single-threaded NumPy, SURVEY.md section 3.1).
* Precise (multi-scale) mode keeps the per-scale output maps on device and
  averages them at original resolution there (the reference round-trips
  through cv2 on host per scale, ``pose_detector.py:441-470``).
* Resize semantics are matched call-site-for-call-site: host cv2 resize for
  the uint8 input image (bit-identical), Chainer align-corners resize for
  output maps in fast mode (``:501-502``), cv2 INTER_CUBIC parity resize
  for precise-mode maps (``:439,461-467``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.config import INFERENCE, NUM_JOINTS, InferenceConfig
from tpupose.models import ARCHS
from tpupose.ops.postprocess import postprocess_pose
from tpupose.ops.resize import (
    compute_optimal_size,
    resize_chainer,
    resize_cv2_cubic,
)
from tpupose.weights import (commit_variables, params_from_npz_auto,
                             warn_on_load_report)


def preprocess_u8(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 HWC -> normalized float HWC (ref ``pose_detector.py:426-431``,
    /255 - 0.5; layout stays NHWC on TPU instead of NCHW)."""
    return img_u8.astype(jnp.float32) / 255.0 - 0.5


def pad_image_np(img: np.ndarray, stride: int,
                 pad_value: Tuple[int, int, int]):
    """Pad bottom/right to a stride multiple with a constant BGR value
    (ref ``pose_detector.py:46-55``)."""
    h, w = img.shape[:2]
    pad_b = (stride - h % stride) % stride
    pad_r = (stride - w % stride) % stride
    out = np.empty((h + pad_b, w + pad_r, 3), np.uint8)
    out[...] = np.asarray(pad_value, np.uint8)
    out[:h, :w] = img
    return out, (pad_b, pad_r)


def emit_result(result, scale_x: float, scale_y: float,
                warned: bool = False):
    """Rescale a device ``PoseResult`` to original pixels and compact to
    dynamic (N, 18, 3) arrays (ref ``pose_detector.py:513-517``).

    Returns ``(poses, scores, warned)``; thread the returned ``warned``
    flag back in to get at most one saturation warning per consumer (the
    fail-safe default warns on every saturated call).  One ``jax.device_get``
    for the whole result tuple — per-field ``np.asarray`` would issue four
    sequential round trips over the (high-latency) device link per frame."""
    result = jax.device_get(result)
    dropped = int(result.peaks_dropped)
    suppressed = int(result.spawns_suppressed)
    if (dropped or suppressed) and not warned:
        import warnings

        warned = True
        warnings.warn(
            f"pose postprocess capacity saturated ({dropped} peaks "
            f"dropped beyond max_peaks_per_joint, {suppressed} person "
            "subsets suppressed beyond max_subsets); results may "
            "diverge from the reference on this crowd — raise "
            "InferenceConfig.max_peaks_per_joint/max_subsets",
            RuntimeWarning, stacklevel=4)
    valid = np.asarray(result.valid)
    if int(result.num_peaks) == 0 or not valid.any():
        return np.empty((0, NUM_JOINTS, 3)), np.empty(0), warned
    poses = np.asarray(result.poses)[valid]
    scores = np.asarray(result.scores)[valid]
    present = poses[:, :, 2] > 0
    poses[:, :, 0] = np.where(present, poses[:, :, 0] * scale_x, 0.0)
    poses[:, :, 1] = np.where(present, poses[:, :, 1] * scale_y, 0.0)
    return poses, scores, warned


class PoseDetector:
    """Multi-person pose detector running the full pipeline on TPU."""

    def __init__(self, arch: str = "posenet",
                 weights_file: Optional[str] = None,
                 params=None,
                 precise: bool = False,
                 cfg: InferenceConfig = INFERENCE,
                 compute_dtype=jnp.float32,
                 mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` — ``detect_batch``
        then shards frames over the mesh's ``data`` axis (params
        replicated), scaling serving throughput across chips; the
        reference has no multi-device execution at all (SURVEY.md
        section 2)."""
        self.arch = arch
        self.precise = precise
        self.cfg = cfg
        self.mesh = mesh
        self.model = ARCHS[arch](dtype=compute_dtype)
        if params is not None:
            self.variables = params if "params" in params else {
                "params": params}
        elif weights_file:
            self.variables, report = params_from_npz_auto(
                weights_file, self.model)
            warn_on_load_report(report, weights_file, arch=arch)
        else:
            # param shapes are input-size independent; a small dummy keeps
            # the eager init cheap (368px costs seconds per detector)
            dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
            self.variables = self.model.init(jax.random.PRNGKey(0), dummy)
        # Host (numpy) trees — the npz path and user-supplied params —
        # would be re-uploaded on EVERY dispatch; commit once (replicated
        # over the mesh when one is attached).  A non-f32 compute dtype is
        # also applied at rest: Flax casts params to it per dispatch
        # anyway, so pre-casting is numerically free and halves the tree's
        # HBM footprint and one-time upload.
        self.variables = commit_variables(
            self.variables, mesh=mesh,
            dtype=None if compute_dtype == jnp.float32 else compute_dtype)
        # The forward seam every traced body dispatches through; swapped
        # by ``quantize()`` for the w8a8 int8-MXU forward (tpupose/quant.py).
        # Late-binds self.model so tests may stub it after construction.
        self._apply = lambda variables, x: self.model.apply(variables, x)
        # Export-portable twin of ``_apply``: identical semantics but free
        # of Pallas custom calls, so ``jax.export`` bundles stay
        # multi-platform (``serving.py`` swaps to it via
        # ``portable_programs``).  Diverges from ``_apply`` only when
        # ``quantize()`` routes small-grid 7x7 layers through the Mosaic
        # conv kernel.
        self._apply_portable = self._apply
        self.quantized = False
        self._quant_min_side = 0
        # prefix of the self-describing XLA module names (profiler traces
        # map programs to pipeline stages by it; quantize() re-prefixes so
        # f32 and int8 programs stay distinguishable in one trace)
        self._program_prefix = "pose"
        # jit caches keyed by static geometry.
        self._fast_fns: Dict[tuple, object] = {}
        self._scale_fns: Dict[tuple, object] = {}
        self._avg_fns: Dict[tuple, object] = {}
        self._warned_saturation = False

    def quantize(self, calib_images, size: Optional[int] = None,
                 min_side: Optional[int] = None,
                 conv7_impl: Optional[str] = None) -> None:
        """Switch this detector to post-training w8a8 int8 inference.

        ``calib_images``: a few serving-representative HWC uint8 frames
        (the activation ranges are taken over them — see
        ``tpupose/quant.py``).  All compiled programs are dropped and
        re-trace to the quantized forward; postprocess, geometry, and
        APIs are unchanged.  New capability beyond the reference (no
        quantization support in ``/root/reference``).

        ``conv7_impl``: implementation for the 7x7 s8 convs at small
        (<=32 px) stage grids, where XLA's conv emitter runs at 2.5% of
        int8 peak (BASELINE.md round 5 "conv7 kernel"; all three are
        bit-identical): ``"pallas"`` — the fused Mosaic kernel, 19.5x at
        23x23; ``"im2col"`` — pure-XLA patch matmul, 7.8x, export-safe;
        ``"xla"`` — plain convs.  Default ``None`` picks ``"pallas"`` on
        a mesh-less TPU backend and ``"xla"`` otherwise (GSPMD keeps
        spatial sharding only through plain convs; off-TPU the
        interpreter-mode kernel is correct but slow).  Exports
        (``serving.py``) always trace the portable twin — ``"im2col"``
        when live is ``"pallas"`` — via ``portable_programs``.

        ``min_side``: mixed-precision threshold — programs whose network
        input's short side is below it keep the bit-exact f32 forward
        (the f32 tree stays resident next to the int8 one; jit prunes
        whichever subtree a program doesn't read, so per-program dispatch
        cost is unchanged).  Default: 0 (quantize everything, no f32
        tree kept) whenever the small-grid 7x7 routing is accelerated —
        with the conv7 kernel the 184px scale runs 1.09 ms quantized vs
        2.20 f32 vs 5.80 plain-XLA-int8, trace row in BASELINE.md
        round 5 — and for fast-path detectors, whose ~368px geometry
        has no pathological grids; ``cfg.quant_min_side`` only for
        precise detectors stuck on plain-XLA convs (meshes / CPU,
        where the round-4 crossover still holds: the 184px scale is
        2.6x slower quantized there)."""
        import cv2

        from tpupose.quant import (calibrate_ranges, make_quant_apply,
                                   quantize)

        if self.quantized:
            raise ValueError("detector is already quantized")
        if conv7_impl is None:
            conv7_impl = ("pallas" if (jax.default_backend() == "tpu"
                                       and self.mesh is None) else "xla")
        if conv7_impl not in ("xla", "im2col", "pallas"):
            raise ValueError(f"unknown conv7_impl {conv7_impl!r}")
        if self.mesh is not None and conv7_impl != "xla":
            raise ValueError(
                "conv7_impl must be 'xla' on a meshed detector: GSPMD "
                "keeps spatial sharding only through plain convs")
        if min_side is None:
            min_side = (self.cfg.quant_min_side
                        if self.precise and conv7_impl == "xla" else 0)
        size = size or self.cfg.img_size
        frames = np.stack([
            cv2.resize(np.asarray(img), (size, size))
            for img in calib_images])
        ranges = calibrate_ranges(self.model, self.variables,
                                  preprocess_u8(jnp.asarray(frames)))
        qtree, static = quantize(self.arch, self.variables, ranges)
        quant_apply = make_quant_apply(static, conv7_impl)
        portable_impl = "im2col" if conv7_impl == "pallas" else conv7_impl
        quant_apply_portable = (quant_apply if portable_impl == conv7_impl
                                else make_quant_apply(static, portable_impl))
        if min_side:
            # Mixed tree: the int8 layers plus the full f32 params under
            # "f32".  One pytree keeps every call site / serving-bundle
            # path oblivious; programs read exactly one subtree and jit
            # drops the other from their signatures.  The f32 leaves are
            # already committed device arrays — re-commit is a no-op, NOT
            # a tunnel round-trip.
            qtree["f32"] = self.variables
            model = self.model

            def make_mixed(qapply):
                def mixed_apply(variables, x):
                    # x's shape is static at trace time: each program
                    # picks its forward once, at trace — no device-side
                    # branch.
                    if min(x.shape[1], x.shape[2]) >= min_side:
                        return qapply(variables, x)
                    return model.apply(variables["f32"], x)

                return mixed_apply

            self._apply = make_mixed(quant_apply)
            self._apply_portable = (
                self._apply if quant_apply_portable is quant_apply
                else make_mixed(quant_apply_portable))
        else:
            self._apply = quant_apply
            self._apply_portable = quant_apply_portable
        self.variables = commit_variables(qtree, mesh=self.mesh)
        self.quantized = True
        self._quant_min_side = min_side
        self._program_prefix = "poseq"
        self._clear_program_caches()

    def portable_programs(self):
        """Context manager: temporarily route every traced body through
        the export-portable forward (no Pallas custom calls), so
        ``jax.export`` bundles stay multi-platform even when the live
        detector runs the fused Mosaic conv kernel
        (``detectors/portable.py``)."""
        from tpupose.detectors.portable import portable_programs

        return portable_programs(self)

    def _clear_program_caches(self) -> None:
        self._fast_fns.clear()
        self._scale_fns.clear()
        self._avg_fns.clear()

    def _prefix_for(self, forward_hw: Tuple[int, int]) -> str:
        """Trace-name prefix for a program whose network forward runs at
        ``forward_hw``: mixed-quantized detectors keep sub-``min_side``
        geometries on the f32 forward, and the self-describing XLA module
        names must say which compute actually runs."""
        if (self.quantized and self._quant_min_side
                and min(forward_hw) < self._quant_min_side):
            return "pose"
        return self._program_prefix

    # ------------------------------------------------------------------
    # fast single-scale path (ref ``pose_detector.py:484-517``)
    # ------------------------------------------------------------------

    def _fast_maps_traced(self, variables, img_u8, map_hw):
        """Traced body shared by the fast postprocess program and
        ``compute_maps``: forward + Chainer-parity resize of the last
        stage's maps (ref ``pose_detector.py:494-502``).  Returns
        channel-first (38, h, w) pafs and (19, h, w) heatmaps."""
        x = preprocess_u8(img_u8)[None]
        pafs, heatmaps = self._apply(variables, x)
        paf = resize_chainer(pafs[-1, 0], map_hw)       # (h, w, 38)
        hm = resize_chainer(heatmaps[-1, 0], map_hw)    # (h, w, 19)
        return (jnp.transpose(paf, (2, 0, 1)),
                jnp.transpose(hm, (2, 0, 1)))

    def _fast_traced(self, variables, img_u8, map_hw):
        """Full fast-path body (forward + map resize + postprocess) —
        shared by the jitted program and the bench's chained device
        timer."""
        paf, hm = self._fast_maps_traced(variables, img_u8, map_hw)
        return postprocess_pose(paf, hm, jnp.float32(map_hw[1]), self.cfg)

    def _fast_fn(self, in_hw: Tuple[int, int], map_hw: Tuple[int, int]):
        key = (in_hw, map_hw)
        if key not in self._fast_fns:

            def fn(variables, img_u8):
                return self._fast_traced(variables, img_u8, map_hw)

            # self-describing XLA module name in profiler traces
            fn.__name__ = (f"{self._prefix_for(in_hw)}_fast_"
                           f"{in_hw[0]}x{in_hw[1]}")
            self._fast_fns[key] = jax.jit(fn)
        return self._fast_fns[key]

    def compute_maps(self, orig_img: np.ndarray):
        """The exact (pafs, heatmaps) tensors the device postprocess
        consumes for this frame — channel-first, at postprocess
        resolution — plus the postprocess->original scale factors.

        The map computation is the same traced code the detection
        programs run (``_fast_maps_traced`` / ``_device_scale_fn``), so
        there is no drift between what this returns and what ``__call__``
        postprocesses.  Used by the golden-parity harness to feed the
        NumPy oracle pipeline, and handy for map-level debugging."""
        import cv2

        orig_h, orig_w = orig_img.shape[:2]
        if self.precise:
            paf_list, hm_list, post_hw = self._precise_scale_maps(orig_img)
            n = len(self.cfg.scales)
            key = ("avg_maps", post_hw, n)
            if key not in self._avg_fns:
                self._avg_fns[key] = jax.jit(
                    lambda pl, hl: (sum(pl) / n, sum(hl) / n))
            paf, hm = self._avg_fns[key](paf_list, hm_list)
            return ((jnp.transpose(paf, (2, 0, 1)),
                     jnp.transpose(hm, (2, 0, 1))),
                    (orig_w / post_hw[1], orig_h / post_hw[0]))
        input_w, input_h = compute_optimal_size(
            orig_h, orig_w, self.cfg.img_size, self.cfg.downscale)
        map_w, map_h = compute_optimal_size(
            orig_h, orig_w, self.cfg.heatmap_size, self.cfg.downscale)
        key = ("maps", (input_h, input_w), (map_h, map_w))
        if key not in self._fast_fns:
            self._fast_fns[key] = jax.jit(
                lambda v, i: self._fast_maps_traced(v, i, (map_h, map_w)))
        resized = cv2.resize(orig_img, (input_w, input_h))
        maps = self._fast_fns[key](self.variables, jnp.asarray(resized))
        return maps, (orig_w / map_w, orig_h / map_h)

    def submit(self, orig_img: np.ndarray):
        """Dispatch the device computation for one frame WITHOUT blocking
        on the result — returns an opaque pending handle for ``collect``.

        This is the streaming-pipeline API (SURVEY.md section 7 step 6): a
        capture loop can overlap host capture/draw of frame N with device
        compute of frame N+1 (JAX dispatch is asynchronous; only
        ``collect`` forces the device->host transfer).  Routes to the
        precise multi-scale pipeline when the detector was built with
        ``precise=True`` — the reference's precise mode is strictly serial
        (``pose_detector.py:433-482``); here its per-scale dispatches for
        frame N+1 queue behind frame N's, hiding dispatch latency.
        """
        if self.precise:
            return self._submit_precise(orig_img)
        return self._submit_fast(orig_img)

    def _submit_fast(self, orig_img: np.ndarray):
        import cv2

        orig_h, orig_w = orig_img.shape[:2]
        input_w, input_h = compute_optimal_size(
            orig_h, orig_w, self.cfg.img_size, self.cfg.downscale)
        map_w, map_h = compute_optimal_size(
            orig_h, orig_w, self.cfg.heatmap_size, self.cfg.downscale)

        resized = cv2.resize(orig_img, (input_w, input_h))
        fn = self._fast_fn((input_h, input_w), (map_h, map_w))
        result = fn(self.variables, jnp.asarray(resized))
        return (result, orig_w / map_w, orig_h / map_h)

    def collect(self, pending):
        """Block on a ``submit`` handle and return (poses, scores)."""
        result, scale_x, scale_y = pending
        return self._emit(result, scale_x=scale_x, scale_y=scale_y)

    def _detect_fast(self, orig_img: np.ndarray):
        return self.collect(self.submit(orig_img))

    # ------------------------------------------------------------------
    # batched fast path (new capability: the reference processes frames
    # strictly one at a time, ``camera_pose_demo.py:20-31``)
    # ------------------------------------------------------------------

    def _batch_fn(self, batch: int, in_hw: Tuple[int, int],
                  map_hw: Tuple[int, int]):
        key = ("batch", batch, in_hw, map_hw)
        if key not in self._fast_fns:
            cfg = self.cfg
            apply_fn = self._apply
            use_mesh = self.mesh is not None

            def fn(variables, imgs_u8):
                x = preprocess_u8(imgs_u8)            # (B, H, W, 3)
                pafs, heatmaps = apply_fn(variables, x)
                paf = resize_chainer(pafs[-1], map_hw)      # (B, h, w, 38)
                hm = resize_chainer(heatmaps[-1], map_hw)   # (B, h, w, 19)

                def per_frame(p, h):
                    # Under mesh shardings GSPMD cannot auto-partition a
                    # Pallas custom call — pin the XLA peak path there.
                    return postprocess_pose(
                        jnp.transpose(p, (2, 0, 1)),
                        jnp.transpose(h, (2, 0, 1)),
                        jnp.float32(map_hw[1]), cfg,
                        use_pallas=False if use_mesh else None)

                return jax.vmap(per_frame)(paf, hm)

            if use_mesh:
                from tpupose.parallel import batch_sharding, replicated

                # (B, H, W, 3) frames shard batch over 'data' AND height
                # over 'spatial' — XLA inserts the conv halo exchanges, so
                # a single huge frame can ride multiple chips.
                self._fast_fns[key] = jax.jit(
                    fn,
                    in_shardings=(replicated(self.mesh),
                                  batch_sharding(self.mesh)),
                    out_shardings=replicated(self.mesh))
            else:
                self._fast_fns[key] = jax.jit(fn)
        return self._fast_fns[key]

    def detect_batch(self, imgs: np.ndarray):
        """Batched inference over same-sized frames (fast or precise).

        imgs: (B, H, W, 3) uint8 -> list of (poses, scores) per frame.
        One upload / few fused programs / one download for the whole batch
        — the batch dimension rides the MXU, so per-frame cost drops well
        below the single-frame path for streaming/offline workloads.
        Precise detectors run the full multi-scale pyramid batched (a
        capability the reference lacks entirely — its precise mode is a
        serial per-frame per-scale loop, ``pose_detector.py:433-482``).
        """
        import cv2

        imgs = np.asarray(imgs)
        if self.precise:
            return self._detect_batch_precise(imgs)
        b, orig_h, orig_w = imgs.shape[:3]
        input_w, input_h = compute_optimal_size(
            orig_h, orig_w, self.cfg.img_size, self.cfg.downscale)
        map_w, map_h = compute_optimal_size(
            orig_h, orig_w, self.cfg.heatmap_size, self.cfg.downscale)
        resized = np.stack(
            [cv2.resize(img, (input_w, input_h)) for img in imgs])
        fn = self._batch_fn(b, (input_h, input_w), (map_h, map_w))
        # fetch the whole batch result in ONE transfer, then slice on host
        results = jax.device_get(fn(self.variables, jnp.asarray(resized)))
        out = []
        for i in range(b):
            frame_result = jax.tree_util.tree_map(lambda a: a[i], results)
            out.append(self._emit(frame_result, scale_x=orig_w / map_w,
                                  scale_y=orig_h / map_h))
        return out

    # ------------------------------------------------------------------
    # precise multi-scale path (ref ``pose_detector.py:433-482``)
    # ------------------------------------------------------------------

    def _postprocess_hw(self, orig_h: int, orig_w: int) -> Tuple[int, int]:
        """Precise-mode postprocess resolution: original (reference
        parity) or capped by ``cfg.max_postprocess_len`` (serving knob);
        poses rescale back at emit.  The single shared definition for the
        single-frame, batched, and bench paths."""
        cap = self.cfg.max_postprocess_len
        if cap and max(orig_h, orig_w) > cap:
            s = cap / max(orig_h, orig_w)
            return (max(1, round(orig_h * s)), max(1, round(orig_w * s)))
        return (orig_h, orig_w)

    # --- shared traced bodies (batch-first; the single-frame programs
    # wrap them with [None]/[0], so single and batched results cannot
    # drift) ------------------------------------------------------------

    def _scale_tail_traced(self, paf, hm, padded_hw, crop_hw, post_hw):
        """Last-stage maps -> postprocess-resolution maps: cubic to the
        padded input size, crop the stride pad, cubic to the postprocess
        size (ref ``pose_detector.py:461-467``).  Channel-last, batched."""
        paf = resize_cv2_cubic(paf, padded_hw)
        paf = paf[:, :crop_hw[0], :crop_hw[1]]
        paf = resize_cv2_cubic(paf, post_hw)
        hm = resize_cv2_cubic(hm, padded_hw)
        hm = hm[:, :crop_hw[0], :crop_hw[1]]
        hm = resize_cv2_cubic(hm, post_hw)
        return paf, hm

    def _pyramid_scale_maps_traced(self, variables, imgs_u8, scaled_hw,
                                   padded_hw, post_hw):
        """Device pyramid: (B, H, W, 3) ORIGINAL u8 frames -> one scale's
        maps at postprocess resolution.

        Bandwidth-first variant of the reference's host pyramid
        (``pose_detector.py:441-445``): the original frame is uploaded
        once for all scales (the remote-chip link here moves ~26 MB/s, so
        shipping each scaled copy dominated precise-mode latency)."""
        x = self._scaled_on_canvas_traced(
            imgs_u8, scaled_hw, padded_hw) / 255.0 - 0.5
        pafs, heatmaps = self._apply(variables, x)
        return self._scale_tail_traced(
            pafs[-1], heatmaps[-1], padded_hw, scaled_hw, post_hw)

    def _scaled_on_canvas_traced(self, imgs_u8, scaled_hw, canvas_hw):
        """(B, H, W, 3) original u8 frames -> (B, c_h, c_w, 3) float
        frames: cubic-resized to ``scaled_hw`` (cv2 uint8 quantization
        emulated), placed top-left on a ``canvas_hw`` canvas filled with
        ``cfg.pad_value`` — the shared canvas builder for the per-scale
        and fused pyramid programs."""
        s_h, s_w = scaled_hw
        c_h, c_w = canvas_hw
        pad_val = jnp.asarray(self.cfg.pad_value, jnp.float32)
        img = resize_cv2_cubic(imgs_u8.astype(jnp.float32), (s_h, s_w))
        img = jnp.clip(jnp.round(img), 0.0, 255.0)
        img = jnp.pad(
            img, ((0, 0), (0, c_h - s_h), (0, c_w - s_w), (0, 0)),
            constant_values=0.0)
        pad_mask = jnp.zeros((c_h, c_w, 1), jnp.float32)
        pad_mask = pad_mask.at[:s_h, :s_w].set(1.0)
        return img * pad_mask + pad_val * (1.0 - pad_mask)

    def _fused_pyramid_maps_traced(self, variables, imgs_u8, geom_small,
                                   geom_large, post_hw):
        """Two pyramid scales through ONE forward (``cfg.fuse_small_scales``):
        both scaled frames ride the larger scale's padded canvas as a
        2B-batch, keeping the MXU busy where two separate small dispatches
        are launch/bandwidth-bound.  Returns
        ((paf_small, hm_small), (paf_large, hm_large)) at postprocess
        resolution.

        The smaller scale sees pad_value canvas beyond its own stride pad,
        so its maps within a receptive field of the image border differ
        slightly from the separate-dispatch (reference) pyramid — a
        documented serving trade-off, off by default."""
        (s_small, _), (s_large, p_large) = geom_small, geom_large
        b = imgs_u8.shape[0]
        x = jnp.concatenate(
            [self._scaled_on_canvas_traced(imgs_u8, s_small, p_large),
             self._scaled_on_canvas_traced(imgs_u8, s_large, p_large)],
            axis=0) / 255.0 - 0.5
        pafs, heatmaps = self._apply(variables, x)
        paf, hm = pafs[-1], heatmaps[-1]
        small = self._scale_tail_traced(
            paf[:b], hm[:b], p_large, s_small, post_hw)
        large = self._scale_tail_traced(
            paf[b:], hm[b:], p_large, s_large, post_hw)
        return small, large

    def _padded_scale_maps_traced(self, variables, imgs_u8, pad, post_hw):
        """Host pyramid: (B, p_h, p_w, 3) frames already cv2-resized and
        stride-padded on host (bit-exact cv2 uint8 semantics,
        ``cfg.device_pyramid=False``) -> one scale's maps."""
        p_h, p_w = imgs_u8.shape[1], imgs_u8.shape[2]
        x = preprocess_u8(imgs_u8)
        pafs, heatmaps = self._apply(variables, x)
        return self._scale_tail_traced(
            pafs[-1], heatmaps[-1], (p_h, p_w),
            (p_h - pad[0], p_w - pad[1]), post_hw)

    def _scale_fn(self, padded_hw: Tuple[int, int],
                  pad: Tuple[int, int], orig_hw: Tuple[int, int]):
        key = (padded_hw, pad, orig_hw)
        if key not in self._scale_fns:

            def fn(variables, img_u8):
                paf, hm = self._padded_scale_maps_traced(
                    variables, img_u8[None], pad, orig_hw)
                return paf[0], hm[0]

            self._scale_fns[key] = jax.jit(fn)
        return self._scale_fns[key]

    def _avg_postprocess_traced(self, paf_list, hm_list, o_w, n_scales):
        """Cross-scale average + full postprocess body — shared by the
        jitted program and the bench's chained device timer."""
        paf = sum(paf_list) / n_scales
        hm = sum(hm_list) / n_scales
        return postprocess_pose(
            jnp.transpose(paf, (2, 0, 1)),
            jnp.transpose(hm, (2, 0, 1)),
            jnp.float32(o_w), self.cfg)

    def _avg_postprocess_fn(self, orig_hw: Tuple[int, int], n_scales: int):
        key = (orig_hw, n_scales)
        if key not in self._avg_fns:
            o_w = orig_hw[1]

            def fn(paf_list, hm_list):
                return self._avg_postprocess_traced(
                    paf_list, hm_list, o_w, n_scales)

            fn.__name__ = (f"{self._program_prefix}_avg_postprocess_"
                           f"{orig_hw[0]}x{orig_hw[1]}")
            self._avg_fns[key] = jax.jit(fn)
        return self._avg_fns[key]

    def _device_scale_fn(self, orig_hw: Tuple[int, int],
                         scaled_hw: Tuple[int, int],
                         padded_hw: Tuple[int, int]):
        """Single-frame device-pyramid program: the ORIGINAL u8 image in,
        one scale's postprocess-resolution maps out (shared traced body
        ``_pyramid_scale_maps_traced``)."""
        key = ("dev", orig_hw, scaled_hw, padded_hw)
        if key not in self._scale_fns:

            def fn(variables, orig_u8):
                paf, hm = self._pyramid_scale_maps_traced(
                    variables, orig_u8[None], scaled_hw, padded_hw,
                    orig_hw)
                return paf[0], hm[0]

            fn.__name__ = (f"{self._prefix_for(padded_hw)}_scale_"
                           f"{scaled_hw[0]}x{scaled_hw[1]}")
            self._scale_fns[key] = jax.jit(fn)
        return self._scale_fns[key]

    def _batch_scale_fn(self, batch: int, post_hw: Tuple[int, int],
                        scaled_hw: Tuple[int, int],
                        padded_hw: Tuple[int, int]):
        """Batched variant of ``_device_scale_fn``: one program runs one
        pyramid scale for ALL frames — the batch dimension keeps the MXU
        full where the single-frame path underutilizes it at small
        scales."""
        key = ("bdev", batch, post_hw, scaled_hw, padded_hw)
        if key not in self._scale_fns:

            def fn(variables, orig_u8):      # (B, H, W, 3)
                return self._pyramid_scale_maps_traced(
                    variables, orig_u8, scaled_hw, padded_hw, post_hw)

            self._scale_fns[key] = self._jit_batched(fn)
        return self._scale_fns[key]

    def _fused_small_pair(self, geoms, force: bool = False):
        """Indices (small, large) of the two smallest pyramid scales when
        ``cfg.fuse_small_scales`` applies to this geometry, else None.
        The ONE place the fusing decision lives, shared by the
        single-frame and batched precise paths (``force`` lets the bench
        measure the knob while it is off, still under the containment
        check)."""
        if not ((force or self.cfg.fuse_small_scales)
                and self.cfg.device_pyramid and len(geoms) >= 2):
            return None
        order = sorted(range(len(geoms)),
                       key=lambda k: geoms[k][2][0] * geoms[k][2][1])
        i, j = order[0], order[1]
        # the larger canvas must contain the smaller scaled frame
        if (geoms[i][1][0] <= geoms[j][2][0]
                and geoms[i][1][1] <= geoms[j][2][1]):
            return i, j
        return None

    def _fused_scale_fn(self, post_hw, geom_small, geom_large):
        """Single-frame fused program for the two smallest scales
        (``cfg.fuse_small_scales``); geoms are (scaled_hw, padded_hw)."""
        key = ("fused", post_hw, geom_small, geom_large)
        if key not in self._scale_fns:

            def fn(variables, orig_u8):
                small, large = self._fused_pyramid_maps_traced(
                    variables, orig_u8[None], geom_small, geom_large,
                    post_hw)
                return ((small[0][0], small[1][0]),
                        (large[0][0], large[1][0]))

            self._scale_fns[key] = jax.jit(fn)
        return self._scale_fns[key]

    def _batch_fused_scale_fn(self, batch, post_hw, geom_small, geom_large):
        key = ("bfused", batch, post_hw, geom_small, geom_large)
        if key not in self._scale_fns:

            def fn(variables, orig_u8):      # (B, H, W, 3)
                return self._fused_pyramid_maps_traced(
                    variables, orig_u8, geom_small, geom_large, post_hw)

            self._scale_fns[key] = self._jit_batched(fn)
        return self._scale_fns[key]

    def _batch_scale_fn_host(self, batch: int, padded_hw: Tuple[int, int],
                             pad: Tuple[int, int],
                             post_hw: Tuple[int, int]):
        """Batched host-pyramid program (``cfg.device_pyramid=False``):
        frames arrive cv2-resized + padded on host, bit-exact reference
        uint8 semantics."""
        key = ("bhost", batch, padded_hw, pad, post_hw)
        if key not in self._scale_fns:

            def fn(variables, imgs_u8):      # (B, p_h, p_w, 3)
                return self._padded_scale_maps_traced(
                    variables, imgs_u8, pad, post_hw)

            self._scale_fns[key] = self._jit_batched(fn)
        return self._scale_fns[key]

    def _jit_batched(self, fn):
        """jit with (replicated params, (B, H, ...) frames) shardings when
        a mesh is attached — batch over 'data', frame height over
        'spatial' (XLA inserts the conv halo exchanges)."""
        if self.mesh is not None:
            from tpupose.parallel import batch_sharding, replicated

            return jax.jit(fn,
                           in_shardings=(replicated(self.mesh),
                                         batch_sharding(self.mesh)),
                           out_shardings=replicated(self.mesh))
        return jax.jit(fn)

    def _batch_avg_postprocess_fn(self, post_hw: Tuple[int, int],
                                  n_scales: int, batch: int):
        key = ("bavg", post_hw, n_scales, batch)
        if key not in self._avg_fns:
            cfg = self.cfg
            o_w = post_hw[1]
            use_mesh = self.mesh is not None

            def fn(paf_list, hm_list):       # lists of (B, o_h, o_w, C)
                paf = sum(paf_list) / n_scales
                hm = sum(hm_list) / n_scales

                def per_frame(p, h):
                    # Inputs are mesh-committed when a mesh is attached:
                    # GSPMD cannot auto-partition a Pallas custom call,
                    # so pin the XLA peak path there (same rule as the
                    # batched fast path above).
                    return postprocess_pose(
                        jnp.transpose(p, (2, 0, 1)),
                        jnp.transpose(h, (2, 0, 1)),
                        jnp.float32(o_w), cfg,
                        use_pallas=False if use_mesh else None)

                return jax.vmap(per_frame)(paf, hm)

            self._avg_fns[key] = jax.jit(fn)
        return self._avg_fns[key]

    def _pyramid_geometries(self, orig_h: int, orig_w: int):
        """Per-scale (scale, scaled_hw, padded_hw) of the precise pyramid
        (ref ``pose_detector.py:441-445``) — the ONE place this
        arithmetic lives, shared by the single-frame and batched loops so
        they cannot drift."""
        import math

        out = []
        for scale in self.cfg.scales:
            multiplier = scale * self.cfg.img_size / min(orig_h, orig_w)
            scaled_hw = (math.ceil(orig_h * multiplier),
                         math.ceil(orig_w * multiplier))
            padded_hw = (
                scaled_hw[0] + (-scaled_hw[0]) % self.cfg.downscale,
                scaled_hw[1] + (-scaled_hw[1]) % self.cfg.downscale)
            out.append((scale, scaled_hw, padded_hw))
        return out

    def _detect_batch_precise(self, imgs: np.ndarray):
        import cv2

        b, orig_h, orig_w = imgs.shape[:3]
        post_hw = self._postprocess_hw(orig_h, orig_w)

        orig_dev = jnp.asarray(imgs) if self.cfg.device_pyramid else None
        paf_list, hm_list = [], []
        geoms = self._pyramid_geometries(orig_h, orig_w)
        fused = {}
        pair = self._fused_small_pair(geoms)
        if pair is not None:
            i, j = pair
            fn = self._batch_fused_scale_fn(
                b, post_hw, (geoms[i][1], geoms[i][2]),
                (geoms[j][1], geoms[j][2]))
            fused[i], fused[j] = fn(self.variables, orig_dev)
        for k, (scale, scaled_hw, padded_hw) in enumerate(geoms):
            if k in fused:
                paf, hm = fused[k]
            elif self.cfg.device_pyramid:
                fn = self._batch_scale_fn(b, post_hw, scaled_hw, padded_hw)
                paf, hm = fn(self.variables, orig_dev)
            else:
                padded = []
                for img in imgs:
                    scaled = cv2.resize(img, (scaled_hw[1], scaled_hw[0]),
                                        interpolation=cv2.INTER_CUBIC)
                    pimg, pad = pad_image_np(
                        scaled, self.cfg.downscale, self.cfg.pad_value)
                    padded.append(pimg)
                padded = np.stack(padded)
                fn = self._batch_scale_fn_host(
                    b, padded.shape[1:3], pad, post_hw)
                paf, hm = fn(self.variables, jnp.asarray(padded))
            paf_list.append(paf)
            hm_list.append(hm)
        fn = self._batch_avg_postprocess_fn(post_hw, len(self.cfg.scales), b)
        results = jax.device_get(fn(paf_list, hm_list))
        out = []
        for i in range(b):
            frame_result = jax.tree_util.tree_map(lambda a: a[i], results)
            out.append(self._emit(frame_result,
                                  scale_x=orig_w / post_hw[1],
                                  scale_y=orig_h / post_hw[0]))
        return out

    def detect_precise(self, orig_img: np.ndarray):
        return self.collect(self._submit_precise(orig_img))

    def _submit_precise(self, orig_img: np.ndarray):
        orig_h, orig_w = orig_img.shape[:2]
        paf_list, hm_list, post_hw = self._precise_scale_maps(orig_img)
        fn = self._avg_postprocess_fn(post_hw, len(self.cfg.scales))
        result = fn(paf_list, hm_list)
        return (result, orig_w / post_hw[1], orig_h / post_hw[0])

    def _precise_scale_maps(self, orig_img: np.ndarray):
        """Dispatch the per-scale forward+resize programs; returns the
        per-scale original-resolution map lists (device arrays) and the
        postprocess resolution."""
        import cv2

        orig_h, orig_w = orig_img.shape[:2]
        post_hw = self._postprocess_hw(orig_h, orig_w)

        paf_list, hm_list = [], []
        orig_dev = (jnp.asarray(orig_img)
                    if self.cfg.device_pyramid else None)
        geoms = self._pyramid_geometries(orig_h, orig_w)
        fused = {}
        pair = self._fused_small_pair(geoms)
        if pair is not None:
            i, j = pair
            fn = self._fused_scale_fn(
                post_hw, (geoms[i][1], geoms[i][2]),
                (geoms[j][1], geoms[j][2]))
            fused[i], fused[j] = fn(self.variables, orig_dev)
        for k, (scale, scaled_hw, padded_hw) in enumerate(geoms):
            if k in fused:
                paf, hm = fused[k]
            elif self.cfg.device_pyramid:
                fn = self._device_scale_fn(post_hw, scaled_hw, padded_hw)
                paf, hm = fn(self.variables, orig_dev)
            else:
                img = cv2.resize(orig_img, (scaled_hw[1], scaled_hw[0]),
                                 interpolation=cv2.INTER_CUBIC)
                padded, pad = pad_image_np(
                    img, self.cfg.downscale, self.cfg.pad_value)
                fn = self._scale_fn(padded.shape[:2], pad, post_hw)
                paf, hm = fn(self.variables, jnp.asarray(padded))
            paf_list.append(paf)
            hm_list.append(hm)
        return paf_list, hm_list, post_hw

    # ------------------------------------------------------------------

    def _emit(self, result, scale_x: float, scale_y: float):
        poses, scores, self._warned_saturation = emit_result(
            result, scale_x, scale_y, warned=self._warned_saturation)
        return poses, scores

    def __call__(self, orig_img: np.ndarray):
        if self.precise:
            return self.detect_precise(orig_img)
        return self._detect_fast(orig_img)


def _main():
    """CLI parity with the reference's ``__main__``
    (``pose_detector.py:555-579``):
    ``python -m tpupose.detectors.pose posenet <npz> --img x.png [--precise]``
    """
    import argparse

    import cv2

    from tpupose.detectors.draw import draw_person_pose

    p = argparse.ArgumentParser(description="Pose detector")
    p.add_argument("arch", choices=("posenet",))
    p.add_argument("weights", help="weights file path (.npz)")
    p.add_argument("--img", "-i", required=True, help="image file path")
    p.add_argument("--precise", action="store_true",
                   help="multi-scale precise inference")
    p.add_argument("--out", default="result.png")
    args = p.parse_args()

    detector = PoseDetector(args.arch, weights_file=args.weights,
                            precise=args.precise)
    img = cv2.imread(args.img)
    poses, _ = detector(img)
    print(f"{len(poses)} people")
    print(f"Saving result into {args.out}...")
    cv2.imwrite(args.out, draw_person_pose(img, poses))


if __name__ == "__main__":
    _main()
