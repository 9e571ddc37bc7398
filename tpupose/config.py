"""Schema and configuration for the tpupose framework.

This module is the TPU-native re-design of the reference's ``entity.py``
(see ``/root/reference/entity.py:9-152``): the 18-joint skeleton schema, the
19-limb PAF topology, the COCO->internal joint mapping, and every training /
inference hyper-parameter, expressed as immutable dataclasses instead of a
mutable global dict so they can be closed over by ``jax.jit`` as static
configuration.

All values are kept numerically identical to the reference so that keypoint
outputs are bit-comparable.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple


class JointType(enum.IntEnum):
    """18-joint skeleton used by the pose network (ref ``entity.py:9-46``)."""

    Nose = 0
    Neck = 1
    RightShoulder = 2
    RightElbow = 3
    RightHand = 4
    LeftShoulder = 5
    LeftElbow = 6
    LeftHand = 7
    RightWaist = 8
    RightKnee = 9
    RightFoot = 10
    LeftWaist = 11
    LeftKnee = 12
    LeftFoot = 13
    RightEye = 14
    LeftEye = 15
    RightEar = 16
    LeftEar = 17


NUM_JOINTS = len(JointType)  # 18

# 19 limbs connecting joint pairs; PAF channel 2*i / 2*i+1 encodes limb i.
# Ref ``entity.py:85-105``.
LIMBS: Tuple[Tuple[int, int], ...] = (
    (JointType.Neck, JointType.RightWaist),
    (JointType.RightWaist, JointType.RightKnee),
    (JointType.RightKnee, JointType.RightFoot),
    (JointType.Neck, JointType.LeftWaist),
    (JointType.LeftWaist, JointType.LeftKnee),
    (JointType.LeftKnee, JointType.LeftFoot),
    (JointType.Neck, JointType.RightShoulder),
    (JointType.RightShoulder, JointType.RightElbow),
    (JointType.RightElbow, JointType.RightHand),
    (JointType.RightShoulder, JointType.RightEar),
    (JointType.Neck, JointType.LeftShoulder),
    (JointType.LeftShoulder, JointType.LeftElbow),
    (JointType.LeftElbow, JointType.LeftHand),
    (JointType.LeftShoulder, JointType.LeftEar),
    (JointType.Neck, JointType.Nose),
    (JointType.Nose, JointType.RightEye),
    (JointType.Nose, JointType.LeftEye),
    (JointType.RightEye, JointType.RightEar),
    (JointType.LeftEye, JointType.LeftEar),
)

NUM_LIMBS = len(LIMBS)  # 19

# Limb endpoints as arrays, shared by the GT renderer and postprocess
# kernels.  Kept as numpy (not jnp) so importing the library never
# initializes a JAX backend; jitted code converts them at trace time.
import numpy as _np  # noqa: E402

LIMBS_FROM = _np.asarray([a for a, _ in LIMBS], _np.int32)
LIMBS_TO = _np.asarray([b for _, b in LIMBS], _np.int32)

# Limbs that never spawn a new person subset during grouping
# (shoulder->ear links; ref ``pose_detector.py:237``).
NON_SPAWNING_LIMBS: Tuple[int, ...] = (9, 13)

# COCO's 17-keypoint order -> internal JointType (ref ``entity.py:106-124``).
COCO_JOINT_ORDER: Tuple[int, ...] = (
    JointType.Nose,
    JointType.LeftEye,
    JointType.RightEye,
    JointType.LeftEar,
    JointType.RightEar,
    JointType.LeftShoulder,
    JointType.RightShoulder,
    JointType.LeftElbow,
    JointType.RightElbow,
    JointType.LeftHand,
    JointType.RightHand,
    JointType.LeftWaist,
    JointType.RightWaist,
    JointType.LeftKnee,
    JointType.RightKnee,
    JointType.LeftFoot,
    JointType.RightFoot,
)

# Left/right joint pairs swapped on horizontal flip (ref
# ``coco_data_loader.py:185-192``).
FLIP_PAIRS: Tuple[Tuple[int, int], ...] = (
    (JointType.LeftEye, JointType.RightEye),
    (JointType.LeftEar, JointType.RightEar),
    (JointType.LeftShoulder, JointType.RightShoulder),
    (JointType.LeftElbow, JointType.RightElbow),
    (JointType.LeftHand, JointType.RightHand),
    (JointType.LeftWaist, JointType.RightWaist),
    (JointType.LeftKnee, JointType.RightKnee),
    (JointType.LeftFoot, JointType.RightFoot),
)

# Face: 70 keypoints; polyline segment indices for drawing
# (ref ``entity.py:130-140``).
FACE_LINES: Tuple[Tuple[int, int], ...] = tuple(
    [(i, i + 1) for i in range(0, 16)]        # face outline
    + [(i, i + 1) for i in range(17, 21)]     # right eyebrow
    + [(i, i + 1) for i in range(22, 26)]     # left eyebrow
    + [(i, i + 1) for i in range(27, 30)]     # nose bridge
    + [(i, i + 1) for i in range(31, 35)]     # under-nose line
    + [(36, 37), (37, 38), (38, 39), (39, 40), (40, 41), (41, 36)]  # right eye
    + [(42, 43), (43, 44), (44, 45), (45, 46), (46, 47), (47, 42)]  # left eye
    + [(i, i + 1) for i in range(48, 59)] + [(59, 48)]  # outer lips
    + [(i, i + 1) for i in range(60, 67)] + [(67, 60)]  # inner lips
)

# Hand: 21 keypoints, 5 fingers x 4 segments (ref ``entity.py:145-151``).
FINGER_LINES: Tuple[Tuple[Tuple[int, int], ...], ...] = (
    ((0, 1), (1, 2), (2, 3), (3, 4)),
    ((0, 5), (5, 6), (6, 7), (7, 8)),
    ((0, 9), (9, 10), (10, 11), (11, 12)),
    ((0, 13), (13, 14), (14, 15), (15, 16)),
    ((0, 17), (17, 18), (18, 19), (19, 20)),
)


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Pose inference parameters (ref ``entity.py:71-84``)."""

    img_size: int = 368          # network input long/short side target
    scales: Tuple[float, ...] = (0.5, 1.0, 1.5, 2.0)  # precise-mode pyramid
    heatmap_size: int = 320      # postprocess map target size (fast path)
    downscale: int = 8           # network output stride
    gaussian_sigma: float = 2.5  # heatmap smoothing before peak NMS
    # Which of the reference's two (mutually disagreeing) peak-NMS paths to
    # reproduce: "scipy" = the CPU path (reflect-boundary Gaussian, strict
    # ``>`` rule, ``pose_detector.py:82-110``) — the parity target that
    # produced the golden images (SURVEY.md section 7(c)); "conv" = the GPU
    # path (``ksize`` zero-pad unnormalized Gaussian conv, ``>=`` rule,
    # ``:112-126``).
    nms_mode: str = "scipy"
    ksize: int = 17              # conv-mode smoothing kernel size
    n_integ_points: int = 10     # samples along each candidate limb
    n_integ_points_thresh: int = 8
    heatmap_peak_thresh: float = 0.05
    inner_product_thresh: float = 0.05
    limb_length_ratio: float = 1.0
    length_penalty_value: float = 1.0
    n_subset_limbs_thresh: int = 3
    subset_score_thresh: float = 0.2
    # Static capacity limits for the fixed-shape TPU kernels.  These do not
    # exist in the reference (it uses dynamic Python lists); they bound the
    # number of peaks per joint and person subsets a single image can hold.
    max_peaks_per_joint: int = 32
    max_subsets: int = 64
    # Precise mode: build the scale pyramid on device from ONE upload of
    # the original image (cubic resize + u8 quantization emulated in
    # float, within +-1 u8 LSB of cv2's fixed-point path).  False = exact
    # host cv2.INTER_CUBIC pyramid as the reference (``pose_detector.py:
    # 441-445``), uploading every scale.
    device_pyramid: bool = True
    # Serving knob (False = exact reference pyramid semantics): run the
    # two smallest precise-mode scales as ONE batch-2 dispatch at the
    # larger one's padded geometry (device pyramid only).  The small
    # scales are launch/bandwidth-bound at 184-368px and contribute
    # several ms at single-digit MFU when dispatched separately
    # (BASELINE.md round-2 per-scale table); batching them rides the MXU
    # once.  The smaller scale's network inputs gain pad_value context
    # beyond its stride pad, so map values within a receptive field of
    # its right/bottom border can shift slightly vs the reference.
    fuse_small_scales: bool = False
    # Serving knob (0 = off = exact reference semantics): cap the
    # precise-mode postprocess resolution so cross-scale averaging and
    # peak finding run at <= this long-side length instead of the
    # original image resolution (``pose_detector.py:461-478`` averages
    # and finds peaks at FULL original resolution — expensive for large
    # frames, with marginal accuracy benefit past ~1x network scale).
    max_postprocess_len: int = 0
    # Mean RGB padding value used by precise-mode ``pad_image``
    # (ref ``pose_detector.py:445``).
    pad_value: Tuple[int, int, int] = (104, 117, 123)
    # w8a8 mixed-precision threshold (no reference counterpart — the
    # reference has no quantization): after ``PoseDetector.quantize()``,
    # programs whose network input's short side is below this stay on the
    # f32 forward.  v5e-measured (BASELINE.md round 4): the int8 path wins
    # 1.08-1.25x at >=368px but XLA's requantize lowering is pathological
    # at 184px (5.8 ms vs 2.2 f32 — 3.7 ms in clamp/convert fusions), so
    # the default keeps the precise pyramid's 0.5 scale f32.  0 = quantize
    # every geometry.
    quant_min_side: int = 256


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyper-parameters (ref ``entity.py:56-68`` and
    ``train_coco_pose_estimation.py:162-225``)."""

    insize: int = 368
    downscale: int = 8
    paf_sigma: float = 8.0       # half-width of the constant PAF band
    heatmap_sigma: float = 7.0   # GT heatmap gaussian sigma

    min_keypoints: int = 5
    min_area: float = 32 * 32

    min_box_size: float = 64.0
    max_box_size: float = 512.0
    min_scale: float = 0.5
    max_scale: float = 2.0
    max_rotate_degree: float = 40.0
    center_perturb_max: float = 40.0

    batch_size: int = 10
    lr: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8
    # LR schedule: 1e-4 -> 1e-5 @100k -> 1e-6 @200k (ref ``:102-105``).
    lr_drop_steps: Tuple[int, ...] = (100_000, 200_000)
    lr_drop_factor: float = 0.1
    iterations: int = 300_000
    # VGG stem frozen for the first N steps (ref ``:94-100, 219-225``).
    stem_freeze_steps: int = 2000
    # Gradient scale applied to the 12 stem layers (ref ``:213-217``).
    stem_grad_scale: float = 0.25
    # Mask dilation kernel for the ignore mask (ref ``coco_data_loader.py:340``).
    mask_dilate_ksize: int = 16
    # Max persons rendered into GT maps per image (static bound, new).
    max_persons: int = 16

    snapshot_interval: int = 1000
    log_interval: int = 20

    # Rematerialization: recompute forward activations during backprop
    # (``jax.checkpoint``) to trade FLOPs for HBM — enables much larger
    # batch/resolution than the reference's batch-10 @368 on one chip.
    remat: bool = False

    # Render GT maps directly at the stage output resolution instead of the
    # reference's full-input-res render + align-corners downsample in the
    # loss (``coco_data_loader.py:334-341`` + ``train_...py:56-60``).
    # Numerically equivalent (same bilinear weights applied to the analytic
    # maps; differs only in summation order, ~1e-7) and skips the
    # (B, insize², 57ch) materialization + resize each step.
    gt_at_output_res: bool = True


@dataclasses.dataclass(frozen=True)
class FaceConfig:
    """Face keypoint inference parameters (ref ``entity.py:127-129``)."""

    img_size: int = 368
    heatmap_peak_thresh: float = 0.1
    crop_scale: float = 1.5
    gaussian_sigma: float = 2.5
    num_keypoints: int = 70  # + 1 background channel in the net output


@dataclasses.dataclass(frozen=True)
class HandConfig:
    """Hand keypoint inference parameters (ref ``entity.py:143-144``)."""

    img_size: int = 368
    heatmap_peak_thresh: float = 0.1
    gaussian_sigma: float = 2.5
    num_keypoints: int = 21  # + 1 background channel in the net output


# Default singletons; pass explicitly to override.
INFERENCE = InferenceConfig()
TRAIN = TrainConfig()
FACE = FaceConfig()
HAND = HandConfig()
