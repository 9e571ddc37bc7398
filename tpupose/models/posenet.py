"""CocoPoseNet: VGG-19 stem + 6 stages x 2 branches (PAF / heatmap).

TPU-native Flax re-design of the reference Chainer chain
(``/root/reference/models/CocoPoseNet.py:20-262``): NHWC layout, bf16-capable
compute, per-stage outputs stacked into dense ``(6, B, h, w, C)`` arrays so
the multi-stage loss and cross-stage concat stay fully fused under XLA.

Topology (all stride 1):
  stem:    conv1_1..conv4_2 (VGG-19) + conv4_3_CPM/conv4_4_CPM -> 128ch @ /8
  stage 1: two branches of 3x(3x3)+1x1x512+1x1 -> 38ch PAF / 19ch heatmap
  stage k (k=2..6): input concat(paf, heatmap, feature) = 185ch,
           two branches of 5x(7x7)+1x1x128+1x1 -> 38 / 19 ch
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from tpupose.models.cpm import (
    RefineBranch,
    Stage1Branch,
    VGG19Stem,
    stack_stages,
)

NUM_PAF_CHANNELS = 38      # 19 limbs x (x, y)
NUM_HEATMAP_CHANNELS = 19  # 18 joints + background


class CocoPoseNet(nn.Module):
    """Multi-person pose network; returns stacked per-stage PAFs/heatmaps."""

    insize: int = 368
    num_stages: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, H, W, 3) normalized image -> (pafs, heatmaps) where
        pafs: (num_stages, B, H/8, W/8, 38), heatmaps: (..., 19), float32."""
        x = x.astype(self.dtype)
        feature = VGG19Stem(dtype=self.dtype, name="stem")(x)

        pafs = []
        heatmaps = []

        h1 = Stage1Branch(NUM_PAF_CHANNELS, "_L1", dtype=self.dtype,
                          name="stage1_L1")(feature)
        h2 = Stage1Branch(NUM_HEATMAP_CHANNELS, "_L2", dtype=self.dtype,
                          name="stage1_L2")(feature)
        pafs.append(h1)
        heatmaps.append(h2)

        for stage in range(2, self.num_stages + 1):
            h = jnp.concatenate([h1, h2, feature], axis=-1)  # 185 channels
            h1 = RefineBranch(NUM_PAF_CHANNELS, stage, "_L1", dtype=self.dtype,
                              name=f"stage{stage}_L1")(h)
            h2 = RefineBranch(NUM_HEATMAP_CHANNELS, stage, "_L2",
                              dtype=self.dtype, name=f"stage{stage}_L2")(h)
            pafs.append(h1)
            heatmaps.append(h2)

        return stack_stages(pafs), stack_stages(heatmaps)
