#!/bin/bash
# Fetch COCO 2017 keypoint data (equivalent of the reference's getData.sh).
# Usage: scripts/get_data.sh [target_dir]   (default: ./coco)
set -euo pipefail

COCO_DIR="${1:-coco}"
mkdir -p "$COCO_DIR"
cd "$COCO_DIR"

for archive in \
    http://images.cocodataset.org/zips/train2017.zip \
    http://images.cocodataset.org/zips/val2017.zip \
    http://images.cocodataset.org/annotations/annotations_trainval2017.zip
do
    name=$(basename "$archive")
    if [ ! -f "$name" ]; then
        echo "Downloading $name ..."
        wget -q --show-progress "$archive"
    fi
    echo "Extracting $name ..."
    unzip -qn "$name"
done

echo "COCO 2017 ready under $COCO_DIR/"
echo "Next: python -m tpupose.apps.gen_masks --coco_dir $COCO_DIR"
