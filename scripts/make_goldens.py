"""Record golden pose tables from real weights for the parity harness.

Usage:
    python scripts/make_goldens.py --weights weights/coco_posenet.npz \
        [--precise] [--out tests/goldens/reference_goldens.json]

Runs the PoseDetector on the reference's sample images
(``/root/reference/data/{person,people,dinner}.png`` — the de-facto
regression fixtures, README.md:72-119) and writes their pose tables as
goldens.  ``tests/test_golden_parity.py::test_recorded_goldens`` then
compares every future run against them (BASELINE.md target 1: bit-parity
keypoints).  Run once when pretrained weights become available.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IMAGES = ["person", "people", "dinner"]
REF_DATA = "/root/reference/data"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True, help="coco_posenet.npz")
    p.add_argument("--precise", action="store_true",
                   help="record multi-scale precise-mode goldens")
    p.add_argument("--out", default=os.path.join(
        REPO, "tests", "goldens", "reference_goldens.json"))
    args = p.parse_args(argv)

    import cv2

    from tpupose.detectors import PoseDetector

    det = PoseDetector("posenet", weights_file=args.weights,
                       precise=args.precise)
    goldens = {}
    for name in IMAGES:
        img = cv2.imread(os.path.join(REF_DATA, f"{name}.png"))
        poses, scores = det(img)
        goldens[name] = {
            "precise": args.precise,
            "poses": np.asarray(poses, np.float64).tolist(),
            "scores": np.asarray(scores, np.float64).tolist(),
        }
        print(f"{name}: {len(poses)} people")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(goldens, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
