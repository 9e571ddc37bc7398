"""COCO val keypoint-AP evaluation harness.

Runs the PoseDetector over the eval-mode dataset and scores it with the
native OKS evaluator (``tpupose.evaluation``).  The reference provides only
the eval-mode data plumbing (``coco_data_loader.py:21-22,307-308``) and no
AP script — this app completes that capability (BASELINE.md: COCO val2017
AP within 0.5 of the reference).

Usage:
  python -m tpupose.apps.evaluate --coco_dir /data/coco \
      --weights coco_posenet.npz [--precise] [--n_samples 100] [--out eval.json]

``--bucketed`` (recommended for full val2017) routes every image through
a fixed canvas palette (``detectors/bucketed.py``) so total TPU compiles
are bounded by the palette size (~9/mode) instead of one program set per
distinct image geometry — val2017 has thousands.  The per-size exact
path (default) stays available for golden parity and small sweeps; the
bucketed-vs-exact pose deltas are pinned in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import time


def evaluate_detector(detector, dataset, limit=None, verbose=True,
                      pipeline_depth: int = 2):
    """Run ``detector`` over ``dataset`` (eval mode); returns (metrics,
    results list).

    Uses the detector's async ``submit``/``collect`` API to keep
    ``pipeline_depth`` frames in flight, overlapping host-side annotation
    parsing and OKS scoring with device compute (the same software
    pipelining as the streaming camera path; set ``pipeline_depth=0`` for
    strictly serial execution).
    """
    from tpupose.evaluation import KeypointEvaluator, poses_to_results

    evaluator = KeypointEvaluator()
    results = []
    n = len(dataset) if limit is None else min(limit, len(dataset))
    t0 = time.perf_counter()

    can_pipeline = pipeline_depth > 0 and hasattr(detector, "submit")
    pending = []        # [(handle, gts, img_id)]

    def drain_one():
        handle, gts, img_id = pending.pop(0)
        poses, scores = detector.collect(handle)
        dts = poses_to_results(poses, scores, img_id)
        results.extend(dts)
        evaluator.add_image(dts, gts)

    done = 0
    for i in range(n):
        img, gts, img_id = dataset.eval_sample(i)
        if can_pipeline:
            pending.append((detector.submit(img), gts, img_id))
            if len(pending) > pipeline_depth:
                drain_one()
                done += 1
        else:
            poses, scores = detector(img)
            dts = poses_to_results(poses, scores, img_id)
            results.extend(dts)
            evaluator.add_image(dts, gts)
            done += 1
        if verbose and done and done % 20 == 0:
            dt = time.perf_counter() - t0
            print(f"  [{done}/{n}] {dt / done:.2f}s/img")
    while pending:
        drain_one()
    metrics = evaluator.summarize()
    metrics["images"] = n
    metrics["seconds_per_image"] = (time.perf_counter() - t0) / max(n, 1)
    return metrics, results


def main(argv=None):
    import os

    from tpupose.data import CocoPoseDataset
    from tpupose.detectors import PoseDetector

    p = argparse.ArgumentParser(description="COCO keypoint AP evaluation")
    p.add_argument("--coco_dir", required=True)
    p.add_argument("--split", default="val2017")
    p.add_argument("--weights", help="coco_posenet.npz")
    p.add_argument("--precise", action="store_true")
    p.add_argument("--n_samples", type=int, default=None)
    p.add_argument("--bucketed", action="store_true",
                   help="bound TPU compiles: run every image on a fixed "
                        "canvas palette (required in practice for full "
                        "val2017 — thousands of distinct geometries)")
    p.add_argument("--canvas_long", type=int, default=640,
                   help="bucketed canvas long side (COCO max side)")
    p.add_argument("--out", help="write metrics + results JSON here")
    args = p.parse_args(argv)

    ann = os.path.join(
        args.coco_dir, "annotations",
        f"person_keypoints_{args.split}.json")
    dataset = CocoPoseDataset(
        ann, os.path.join(args.coco_dir, args.split), mode="eval",
        n_samples=args.n_samples)
    detector = PoseDetector("posenet", weights_file=args.weights,
                            precise=args.precise)
    if args.bucketed:
        from tpupose.detectors import BucketedPoseDetector, canvas_palette

        detector = BucketedPoseDetector(
            detector, canvases=canvas_palette(args.canvas_long))

    metrics, results = evaluate_detector(detector, dataset)
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"metrics": metrics, "results": results}, f)


if __name__ == "__main__":
    main()
