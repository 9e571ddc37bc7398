"""Export an AOT serving bundle for the pose detector fast path.

Usage::

    python -m tpupose.apps.export_serving coco_posenet.npz bundle/ \
        --sizes 480x640,584x584 [--arch posenet] [--platforms cpu,tpu]

The bundle (StableHLO programs + weights + config) is then served by
``tpupose.serving.ServingPoseDetector`` with no model code on the load
path — see ``tpupose/serving.py``.
"""

from __future__ import annotations

import argparse


def parse_sizes(text: str):
    out = []
    for part in text.split(","):
        h, w = part.lower().split("x")
        out.append((int(h), int(w)))
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("weights", help="npz weights (Chainer-npz interchange)")
    p.add_argument("out", help="bundle directory to create")
    p.add_argument("--arch", default="posenet")
    p.add_argument("--sizes", required=True,
                   help="comma-separated HxW original image sizes to "
                        "export programs for, e.g. 480x640,584x584")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="lowering targets baked into the bundle")
    p.add_argument("--img-size", type=int, default=None,
                   help="network input target (InferenceConfig.img_size)")
    p.add_argument("--heatmap-size", type=int, default=None,
                   help="postprocess map target "
                        "(InferenceConfig.heatmap_size)")
    p.add_argument("--precise", action="store_true",
                   help="export the multi-scale precise pipeline instead "
                        "of the fast path")
    args = p.parse_args(argv)

    import dataclasses

    from tpupose.config import INFERENCE
    from tpupose.detectors import PoseDetector
    from tpupose.serving import save_bundle

    cfg = INFERENCE
    overrides = {k: v for k, v in (("img_size", args.img_size),
                                   ("heatmap_size", args.heatmap_size))
                 if v is not None}
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    det = PoseDetector(args.arch, weights_file=args.weights, cfg=cfg,
                       precise=args.precise)
    sizes = parse_sizes(args.sizes)
    save_bundle(det, args.out, sizes,
                platforms=tuple(args.platforms.split(",")))
    print(f"wrote bundle: {args.out} ({len(sizes)} geometries, "
          f"{'precise' if args.precise else 'fast'} mode, "
          f"platforms {args.platforms})")


if __name__ == "__main__":
    main()
