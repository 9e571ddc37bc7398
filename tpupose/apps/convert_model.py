"""Weight-conversion CLI: Caffe ``.caffemodel`` -> ``.npz``.

Same interface as the reference's converter
(``/root/reference/models/convert_model.py:265-282``):

  python -m tpupose.apps.convert_model {posenet,facenet,handnet} \
      pose_iter_440000.caffemodel coco_posenet.npz

but with a native protobuf reader (no caffe/Chainer) and the reference's
omitted ``conv5_5_CPM_L1`` layer included (pass ``--reference-quirk`` to
reproduce the reference's output byte-for-byte behavior).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from tpupose.weights.caffe import convert_caffemodel

    p = argparse.ArgumentParser(
        description="Convert caffemodel into npz weights")
    p.add_argument("arch", choices=("posenet", "facenet", "handnet"))
    p.add_argument("caffe_file", help="caffe weights file path")
    p.add_argument("npz_file", help="output npz path")
    p.add_argument("--reference-quirk", action="store_true",
                   help="skip conv5_5_CPM_L1 exactly like the reference")
    args = p.parse_args(argv)

    print("Loading caffemodel file...")
    convert_caffemodel(args.caffe_file, args.npz_file, args.arch,
                       replicate_reference_quirk=args.reference_quirk)
    print("Done.")


if __name__ == "__main__":
    main()
