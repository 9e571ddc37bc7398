"""Export an AOT serving bundle (pose fast/precise path, or a crop net).

Usage::

    # pose net: one program per original image size
    python -m tpupose.apps.export_serving coco_posenet.npz bundle/ \
        --sizes 480x640,584x584 [--precise] [--platforms cpu,tpu]

    # face/hand crop nets: batched forward + per-crop-geometry tails
    python -m tpupose.apps.export_serving facenet.npz face_bundle/ \
        --arch facenet --sizes 368x368,184x184 --batches 1,4,8

Bundles (StableHLO programs + weights + config) are served by
``tpupose.serving.ServingPoseDetector`` / ``ServingCropDetector`` with no
model code on the load path — see ``tpupose/serving.py``.
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
    p.add_argument("--arch", default="posenet",
                   choices=["posenet", "facenet", "handnet"])
    p.add_argument("--sizes", required=True,
                   help="comma-separated HxW sizes to export programs "
                        "for: original image sizes (posenet), crop sizes "
                        "(facenet/handnet)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="lowering targets baked into the bundle")
    p.add_argument("--img-size", type=int, default=None,
                   help="network input target (config img_size)")
    p.add_argument("--heatmap-size", type=int, default=None,
                   help="postprocess map target "
                        "(InferenceConfig.heatmap_size; posenet only)")
    p.add_argument("--precise", action="store_true",
                   help="posenet: export the multi-scale precise pipeline "
                        "instead of the fast path")
    p.add_argument("--batches", default="1,4,8",
                   help="crop nets: batched-forward sizes to export")
    p.add_argument("--pose-batches", default="",
                   help="posenet: comma list of batch sizes to ALSO "
                        "export batched programs for, enabling "
                        "ServingPoseDetector.detect_batch (empty = "
                        "single-frame programs only)")
    p.add_argument("--tail-stride", type=int, default=8,
                   help="crop nets: tail-geometry rounding (see "
                        "CropKeypointDetector)")
    p.add_argument("--quant", action="store_true",
                   help="export a w8a8 int8 bundle (tpupose/quant.py): "
                        "the detector is quantized before export, "
                        "calibrated on the --calib images (pose net: "
                        "serving frames; crop nets: face/hand crops). "
                        "v5e trace-measured (BASELINE.md round 4): int8 "
                        "wins 1.08-1.25x at >=368px forwards; halves "
                        "weight HBM/upload")
    p.add_argument("--quant-min-side", type=int, default=None,
                   help="--quant posenet: mixed-precision threshold — "
                        "programs with network inputs below this stay "
                        "f32 (the bundle then carries BOTH trees). "
                        "Default: 0 (pure int8, lean bundle) whenever "
                        "the small-grid 7x7 routing is accelerated — "
                        "bundles embed the pure-XLA im2col twin, which "
                        "beats the f32 184px scale (BASELINE.md round "
                        "5 conv7) — else the detector's "
                        "cfg.quant_min_side crossover for --precise")
    p.add_argument("--conv7-impl", choices=("im2col", "xla"),
                   default="im2col",
                   help="--quant posenet: implementation for small-grid "
                        "7x7 s8 convs in the exported programs. Default "
                        "im2col (pure-XLA patch matmul, 7.8x over XLA's "
                        "conv at the 23px pathology grids) so bundle "
                        "content is deterministic regardless of the "
                        "build box's backend; the live-only Mosaic "
                        "kernel never reaches bundles either way")
    p.add_argument("--calib",
                   help="--quant: comma-separated image paths for "
                        "activation-range calibration (required with "
                        "--quant)")
    args = p.parse_args(argv)

    import dataclasses

    platforms = tuple(args.platforms.split(","))
    sizes = parse_sizes(args.sizes)

    calib_imgs = None
    if args.quant:
        import cv2

        if not args.calib:
            raise SystemExit("--quant requires --calib img1,img2,... "
                             "(serving-representative calibration images)")
        calib_imgs = []
        for path in args.calib.split(","):
            img = cv2.imread(path)
            if img is None:
                raise SystemExit(f"--calib: cannot read {path!r}")
            calib_imgs += [img, img[:, ::-1]]

    if args.arch == "posenet":
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
        if calib_imgs is not None:
            det.quantize(calib_imgs, min_side=args.quant_min_side,
                         conv7_impl=args.conv7_impl)
        pose_batches = tuple(int(b) for b in args.pose_batches.split(",")
                             if b.strip())
        save_bundle(det, args.out, sizes, platforms=platforms,
                    batch_sizes=pose_batches)
        mode = "precise" if args.precise else "fast"
        if calib_imgs is not None:
            mode += "+w8a8"
    else:
        from tpupose.config import FACE, HAND
        from tpupose.detectors.crop_keypoints import CropKeypointDetector
        from tpupose.serving import save_crop_bundle

        cfg = FACE if args.arch == "facenet" else HAND
        if args.img_size is not None:
            cfg = dataclasses.replace(cfg, img_size=args.img_size)
        det = CropKeypointDetector(args.arch, weights_file=args.weights,
                                   cfg=cfg, tail_stride=args.tail_stride)
        if calib_imgs is not None:
            det.quantize(calib_imgs)
        batches = tuple(int(b) for b in args.batches.split(","))
        flips = (False, True) if args.arch == "handnet" else (False,)
        save_crop_bundle(det, args.out, sizes, batch_sizes=batches,
                         flips=flips, platforms=platforms)
        mode = "crop"
        if calib_imgs is not None:
            mode += "+w8a8"
    print(f"wrote bundle: {args.out} ({len(sizes)} geometries, "
          f"{mode} mode, platforms {args.platforms})")


if __name__ == "__main__":
    main()
