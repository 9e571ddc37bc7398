"""tpupose: a TPU-native (JAX/XLA/Pallas) multi-person pose estimation
framework with the capabilities of
DeNA/Chainer_Realtime_Multi-Person_Pose_Estimation.

Layer map (mirrors SURVEY.md section 1):
  config     - joint/limb schema + hyper-parameters (ref entity.py)
  models     - CocoPoseNet / FaceNet / HandNet Flax modules (ref models/)
  weights    - Chainer-npz / Caffe weight interchange (ref convert_model.py)
  ops        - fixed-shape XLA/Pallas pre/post-processing kernels
               (ref pose_detector.py:38-265 host loops)
  detectors  - PoseDetector / FaceDetector / HandDetector facades
  data       - COCO loader, augmentation, on-device GT rendering
  train      - pjit data-parallel trainer, checkpointing, eval
  parallel   - mesh / sharding helpers (new: the reference is single-device)
  apps       - demo / camera / train / eval CLIs
"""

from tpupose.config import (
    FACE,
    HAND,
    INFERENCE,
    LIMBS,
    NUM_JOINTS,
    NUM_LIMBS,
    TRAIN,
    FaceConfig,
    HandConfig,
    InferenceConfig,
    JointType,
    TrainConfig,
)

__version__ = "0.1.0"

# Lazy top-level conveniences (the detectors pull in cv2/flax; keep bare
# ``import tpupose`` light for config-only users).
_LAZY = {
    "PoseDetector": "tpupose.detectors",
    "FaceDetector": "tpupose.detectors",
    "HandDetector": "tpupose.detectors",
    "CocoPoseNet": "tpupose.models",
    "FaceNet": "tpupose.models",
    "HandNet": "tpupose.models",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'tpupose' has no attribute {name!r}")
