"""Shared Convolutional-Pose-Machine building blocks.

The reference implements three near-identical networks as three flat Chainer
chains (``/root/reference/models/CocoPoseNet.py``, ``FaceNet.py``,
``HandNet.py`` — ~80% duplicated stage code).  Here the common structure is
factored into reusable Flax modules, laid out NHWC (the TPU-native layout so
XLA tiles convolutions directly onto the MXU) with a configurable compute
dtype (float32 default; pass ``dtype=jnp.bfloat16`` for bf16-native
inference) and float32 parameters.

Module/parameter names intentionally mirror the Chainer layer names
(``conv1_1`` ... ``Mconv7_stage6_L2``) so converted ``.npz`` weights map 1:1
(see ``tpupose/weights/chainer_npz.py``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvReLU(nn.Module):
    """3x3/7x7/1x1 conv + optional ReLU, named to match the Chainer layer."""

    features: int
    kernel: int = 3
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


def max_pool_2x2(x):
    """2x2/stride-2 max pooling (ref ``models/CocoPoseNet.py:138,141,146``).

    Plain ``nn.max_pool``: its backward lowers to ``select_and_scatter``,
    which looks like the classic slow-on-TPU op (2.61 ms of the 93 ms
    reference-config train step) but trace-measurements show XLA's
    lowering BEATS both hand-written replacements for the non-overlapping
    2x2 window — argmax-over-flattened-window routing cost +7.4 ms (the
    window transposes materialize) and a transpose-free first-max
    comparison-mask stack cost +5.2 ms (the stacks lower to pads+copies).
    See BASELINE.md round-4 train section; don't re-litigate without a
    Pallas kernel that provably hits the ~0.8 ms bandwidth floor.
    """
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class VGG19Stem(nn.Module):
    """VGG-19 stem through conv4_2 plus the two CPM adapter convs.

    Produces the 128-channel shared feature map at stride 8
    (ref ``models/CocoPoseNet.py:26-37,136-151``).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = ConvReLU(64, 3, dtype=d, name="conv1_1")(x)
        x = ConvReLU(64, 3, dtype=d, name="conv1_2")(x)
        x = max_pool_2x2(x)
        x = ConvReLU(128, 3, dtype=d, name="conv2_1")(x)
        x = ConvReLU(128, 3, dtype=d, name="conv2_2")(x)
        x = max_pool_2x2(x)
        x = ConvReLU(256, 3, dtype=d, name="conv3_1")(x)
        x = ConvReLU(256, 3, dtype=d, name="conv3_2")(x)
        x = ConvReLU(256, 3, dtype=d, name="conv3_3")(x)
        x = ConvReLU(256, 3, dtype=d, name="conv3_4")(x)
        x = max_pool_2x2(x)
        x = ConvReLU(512, 3, dtype=d, name="conv4_1")(x)
        x = ConvReLU(512, 3, dtype=d, name="conv4_2")(x)
        x = ConvReLU(256, 3, dtype=d, name="conv4_3_CPM")(x)
        x = ConvReLU(128, 3, dtype=d, name="conv4_4_CPM")(x)
        return x


class VGGFaceStem(nn.Module):
    """Deeper VGG stem used by FaceNet/HandNet through conv5_3_CPM
    (ref ``models/FaceNet.py:12-26, 81-99``)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = ConvReLU(64, 3, dtype=d, name="conv1_1")(x)
        x = ConvReLU(64, 3, dtype=d, name="conv1_2")(x)
        x = max_pool_2x2(x)
        x = ConvReLU(128, 3, dtype=d, name="conv2_1")(x)
        x = ConvReLU(128, 3, dtype=d, name="conv2_2")(x)
        x = max_pool_2x2(x)
        x = ConvReLU(256, 3, dtype=d, name="conv3_1")(x)
        x = ConvReLU(256, 3, dtype=d, name="conv3_2")(x)
        x = ConvReLU(256, 3, dtype=d, name="conv3_3")(x)
        x = ConvReLU(256, 3, dtype=d, name="conv3_4")(x)
        x = max_pool_2x2(x)
        x = ConvReLU(512, 3, dtype=d, name="conv4_1")(x)
        x = ConvReLU(512, 3, dtype=d, name="conv4_2")(x)
        x = ConvReLU(512, 3, dtype=d, name="conv4_3")(x)
        x = ConvReLU(512, 3, dtype=d, name="conv4_4")(x)
        x = ConvReLU(512, 3, dtype=d, name="conv5_1")(x)
        x = ConvReLU(512, 3, dtype=d, name="conv5_2")(x)
        x = ConvReLU(128, 3, dtype=d, name="conv5_3_CPM")(x)
        return x


class Stage1Branch(nn.Module):
    """Stage-1 branch of CocoPoseNet: 3x(3x3 conv) + 1x1x512 + 1x1 out
    (ref ``models/CocoPoseNet.py:40-49,154-163``).

    ``suffix`` is ``"_L1"`` (PAF, 38ch) or ``"_L2"`` (heatmap, 19ch).
    """

    out_features: int
    suffix: str
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        s = self.suffix
        x = ConvReLU(128, 3, dtype=d, name=f"conv5_1_CPM{s}")(x)
        x = ConvReLU(128, 3, dtype=d, name=f"conv5_2_CPM{s}")(x)
        x = ConvReLU(128, 3, dtype=d, name=f"conv5_3_CPM{s}")(x)
        x = ConvReLU(512, 1, dtype=d, name=f"conv5_4_CPM{s}")(x)
        x = ConvReLU(self.out_features, 1, relu=False, dtype=d,
                     name=f"conv5_5_CPM{s}")(x)
        return x


class RefineBranch(nn.Module):
    """Refinement-stage branch: 5x(7x7 conv) + 1x1x128 + 1x1 out
    (ref ``models/CocoPoseNet.py:52-65,167-182``; same shape in
    FaceNet/HandNet ``models/FaceNet.py:33-39``).

    ``stage`` >= 2.  ``suffix`` is ``"_L1"``/``"_L2"`` for the two-branch
    pose net and ``""`` for the single-branch face/hand nets.
    """

    out_features: int
    stage: int
    suffix: str = ""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        t = f"_stage{self.stage}{self.suffix}"
        x = ConvReLU(128, 7, dtype=d, name=f"Mconv1{t}")(x)
        x = ConvReLU(128, 7, dtype=d, name=f"Mconv2{t}")(x)
        x = ConvReLU(128, 7, dtype=d, name=f"Mconv3{t}")(x)
        x = ConvReLU(128, 7, dtype=d, name=f"Mconv4{t}")(x)
        x = ConvReLU(128, 7, dtype=d, name=f"Mconv5{t}")(x)
        x = ConvReLU(128, 1, dtype=d, name=f"Mconv6{t}")(x)
        x = ConvReLU(self.out_features, 1, relu=False, dtype=d,
                     name=f"Mconv7{t}")(x)
        return x


class Stage1SingleBranch(nn.Module):
    """FaceNet/HandNet stage-1 head: 1x1x512 + 1x1 out
    (ref ``models/FaceNet.py:29-30,102-104``)."""

    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = ConvReLU(512, 1, dtype=d, name="conv6_1_CPM")(x)
        x = ConvReLU(self.out_features, 1, relu=False, dtype=d,
                     name="conv6_2_CPM")(x)
        return x


def stack_stages(stage_outputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Stack per-stage outputs into one (S, B, H, W, C) float32 array."""
    return jnp.stack([o.astype(jnp.float32) for o in stage_outputs], axis=0)
