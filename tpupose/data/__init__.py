"""Data pipeline: COCO annotations, augmentation, GT rendering, loaders."""

from tpupose.data.augment import augment, resize_triple
from tpupose.data.coco_json import CocoAnnotations, ann_to_mask
from tpupose.data.dataset import (
    CocoPoseDataset,
    generate_ignore_masks,
    parse_annotations,
)
from tpupose.data.gt import (render_heatmaps, render_heatmaps_at,
                             render_labels, render_labels_at, render_pafs,
                             render_pafs_at)
from tpupose.data.loader import BatchLoader
from tpupose.data.synthetic import SyntheticCropDataset
