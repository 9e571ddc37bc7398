"""FaceNet: 70-keypoint face network (TPU-native Flax re-design of
``/root/reference/models/FaceNet.py:5-161``).

Deep VGG stem to conv5_3_CPM (128ch @ /8) + 6 single-branch CPM stages
emitting 71 channels (70 face keypoints + background).  Stages 2..6 take
concat(prev_heatmap, feature) = 199 channels.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from tpupose.models.cpm import (
    RefineBranch,
    Stage1SingleBranch,
    VGGFaceStem,
    stack_stages,
)

NUM_FACE_CHANNELS = 71  # 70 keypoints + background


class FaceNet(nn.Module):
    """Face keypoint network; returns stacked per-stage heatmaps."""

    insize: int = 368
    num_stages: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) -> heatmaps (num_stages, B, H/8, W/8, 71) f32."""
        x = x.astype(self.dtype)
        feature = VGGFaceStem(dtype=self.dtype, name="stem")(x)

        heatmaps = []
        h = Stage1SingleBranch(NUM_FACE_CHANNELS, dtype=self.dtype,
                               name="stage1")(feature)
        heatmaps.append(h)

        for stage in range(2, self.num_stages + 1):
            h = jnp.concatenate([h, feature], axis=-1)  # 199 channels
            h = RefineBranch(NUM_FACE_CHANNELS, stage, dtype=self.dtype,
                             name=f"stage{stage}")(h)
            heatmaps.append(h)

        return stack_stages(heatmaps)
