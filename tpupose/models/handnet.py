"""HandNet: 21-keypoint hand network (TPU-native Flax re-design of
``/root/reference/models/HandNet.py:5-161``).

Identical topology to FaceNet but with 22 output channels (21 hand keypoints
+ background); stages 2..6 take concat(prev, feature) = 150 channels.
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

NUM_HAND_CHANNELS = 22  # 21 keypoints + background


class HandNet(nn.Module):
    """Hand keypoint network; returns stacked per-stage heatmaps."""

    insize: int = 368
    num_stages: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) -> heatmaps (num_stages, B, H/8, W/8, 22) f32."""
        x = x.astype(self.dtype)
        feature = VGGFaceStem(dtype=self.dtype, name="stem")(x)

        heatmaps = []
        h = Stage1SingleBranch(NUM_HAND_CHANNELS, dtype=self.dtype,
                               name="stage1")(feature)
        heatmaps.append(h)

        for stage in range(2, self.num_stages + 1):
            h = jnp.concatenate([h, feature], axis=-1)  # 150 channels
            h = RefineBranch(NUM_HAND_CHANNELS, stage, dtype=self.dtype,
                             name=f"stage{stage}")(h)
            heatmaps.append(h)

        return stack_stages(heatmaps)
