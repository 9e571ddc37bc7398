"""Post-training w8a8 quantized inference (TPU int8 MXU path).

New capability beyond the reference (no quantization support anywhere in
``/root/reference``): the v5e MXU executes s8 x s8 -> s32 at 2x its bf16
FLOP rate, and the pose pyramid is conv-compute-bound at ~55% bf16 MFU
(``BENCH_DETAILS.json:trace_device_times``), so an int8 forward is the
one large remaining device-latency lever.  Opt-in via
``PoseDetector.quantize(calibration_images)``.

Scheme (chosen so every step fuses into the conv epilogue under XLA):

- **Weights**: symmetric per-output-channel int8
  (``ws_o = max|W[..., o]| / 127``).
- **Activations**: symmetric int8, ``v = a * X`` with ``a = range/127``.
  Post-ReLU tensors occupy [0, 127] (one sign bit unused — numerically
  the SAME quantum the round-3 shifted scheme used, which also set
  ``a = range/127``); stage-head outputs (mixed signs) span the full
  signed range.  Zero zero-point everywhere means the conv's native
  SAME zero padding represents ``v = 0`` EXACTLY — no explicit pad, no
  border corrections.  (The round-3 shifted-zero-point scheme needed an
  explicit ``X = -128`` pad + VALID conv, which ``scripts/int8_probe.py``
  measured 1.5-2.4x slower than the SAME zero-pad chain at the dominant
  shapes — it single-handedly erased int8's 2x MXU rate.  Border strip
  corrections were also measured and rejected: ``.at[].add`` slice
  epilogues materialize full-tensor copies, ``scripts/strip_probe.py``.)
- **Input layer is near-lossless**: the preprocess is ``u8/255 - 0.5``
  (``detectors/pose.py:44``), i.e. ``v = (u8 - 127.5)/255`` —
  represented as ``X = u8 - 128`` with ``a = 1/255, z = 0.5``; the
  ``z * S_o`` correction folds into the bias, and the conv's zero pad
  is off by ``a*z`` (half an input LSB) on border taps — the identical
  acceptance the round-3 explicit pad made (``round(-0.5) = 0``).  The
  crop nets' ``u8/256 - 0.5`` is the exactly-symmetric ``(1/256, 0)``.
- **Heads stay f32**: the per-stage output convs (``conv5_5_CPM*`` /
  ``Mconv7*``, no ReLU) dequantize their s32 accumulator to f32, so the
  maps the postprocess consumes carry weight-quantization error only.

Calibration runs the f32 model with ``capture_intermediates`` over a few
representative frames and takes per-tensor max-abs ranges.

Measured on the v5e (``scripts/int8_probe.py``/``u8_probe.py``, xplane
trace): SAME zero-pad s8 conv chains run 1.3-1.9x FASTER than bf16 at
the pipeline's dominant shapes (7x7 128ch refine, 3x3 stem) — the int8
MXU path is real once the pad is native.

Accuracy is validated against the f32 pipeline on calibrated synthetic
scenes (``tests/test_quant.py``); with no COCO data or released weights
on this box a real-AP delta cannot be measured — re-verify with
``apps/evaluate.py`` when they exist (same gate as BASELINE targets 1-2).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# Architecture graphs (mirrors tpupose/models/{cpm,posenet,facenet,handnet}.py
# — layer names are the Chainer-parity module names, so specs index straight
# into the params tree)
# ---------------------------------------------------------------------------

# (layer_name, pool_after) for the two stems
VGG19_STEM = [
    ("conv1_1", False), ("conv1_2", True),
    ("conv2_1", False), ("conv2_2", True),
    ("conv3_1", False), ("conv3_2", False), ("conv3_3", False),
    ("conv3_4", True),
    ("conv4_1", False), ("conv4_2", False),
    ("conv4_3_CPM", False), ("conv4_4_CPM", False),
]
VGGFACE_STEM = [
    ("conv1_1", False), ("conv1_2", True),
    ("conv2_1", False), ("conv2_2", True),
    ("conv3_1", False), ("conv3_2", False), ("conv3_3", False),
    ("conv3_4", True),
    ("conv4_1", False), ("conv4_2", False), ("conv4_3", False),
    ("conv4_4", False),
    ("conv5_1", False), ("conv5_2", False), ("conv5_3_CPM", False),
]


def _stage1_branch(suffix: str) -> List[str]:
    return [f"conv5_{i}_CPM{suffix}" for i in range(1, 6)]


def _refine_branch(stage: int, suffix: str) -> List[str]:
    return [f"Mconv{i}_stage{stage}{suffix}" for i in range(1, 8)]


@dataclasses.dataclass(frozen=True)
class ArchGraph:
    """Quantizer's view of one CPM architecture."""

    stem: List[Tuple[str, bool]]
    two_branch: bool
    num_stages: int = 6

    def stage_modules(self, stage: int) -> List[str]:
        if self.two_branch:
            return [f"stage{stage}_L1", f"stage{stage}_L2"]
        return [f"stage{stage}"]

    def branch_layers(self, stage: int, module: str) -> List[str]:
        if stage == 1:
            if self.two_branch:
                return _stage1_branch("_L" + module[-1])
            return ["conv6_1_CPM", "conv6_2_CPM"]
        suffix = "_L" + module[-1] if self.two_branch else ""
        return _refine_branch(stage, suffix)


ARCH_GRAPHS: Dict[str, ArchGraph] = {
    "posenet": ArchGraph(stem=VGG19_STEM, two_branch=True),
    "facenet": ArchGraph(stem=VGGFACE_STEM, two_branch=False),
    "handnet": ArchGraph(stem=VGGFACE_STEM, two_branch=False),
}


# ---------------------------------------------------------------------------
# Calibration: per-tensor max-abs ranges from the f32 model
# ---------------------------------------------------------------------------


def calibrate_ranges(model, variables, frames_normalized) -> Dict[str, float]:
    """Run the f32 model over normalized (B, H, W, 3) frames capturing
    every ConvReLU / branch output; returns ``path -> max|value|`` with
    paths like ``"stem/conv1_1"`` and ``"stage2_L1"`` (branch outputs).

    Plain max (not a percentile): the activation scale then covers every
    calibration value, which keeps the quantized pipeline's synthetic
    parity tests deterministic.  Feed frames representative of serving
    data — the reference sample images work well.

    The capture forward runs under ``jax.jit`` reducing ON DEVICE to the
    per-tensor scalars: eager per-op dispatch through the remote-TPU
    tunnel takes minutes for one 6-stage frame, and shipping every
    intermediate map to host costs hundreds of MB at ~4-26 MB/s.
    """

    @jax.jit
    def capture_maxabs(x):
        _, inter = model.apply(variables, x, capture_intermediates=True,
                               mutable=["intermediates"])
        flat = _flatten_intermediates(inter["intermediates"])
        return {path: jnp.max(jnp.abs(arr)) for path, arr in flat.items()}

    ranges: Dict[str, float] = {}
    for frame in frames_normalized:
        x = jnp.asarray(frame)[None] if frame.ndim == 3 else jnp.asarray(frame)
        for path, m in jax.device_get(capture_maxabs(x)).items():
            ranges[path] = max(ranges.get(path, 0.0), float(m))
    return ranges


def _flatten_intermediates(tree, prefix: str = "") -> Dict[str, jnp.ndarray]:
    out: Dict[str, jnp.ndarray] = {}
    for key, val in tree.items():
        if key == "__call__":
            arr = val[0]
            if isinstance(arr, tuple):  # model root returns a tuple
                continue
            out[prefix.rstrip("/")] = arr
        elif isinstance(val, dict):
            out.update(_flatten_intermediates(val, prefix + key + "/"))
    return out


# ---------------------------------------------------------------------------
# Quantization: f32 params + ranges -> int8 spec tree
# ---------------------------------------------------------------------------

_EPS = 1e-12


def _quantize_kernel(kernel: np.ndarray):
    """Per-output-channel symmetric int8: returns (kq, ws) with
    ws shape (O,)."""
    ws = np.maximum(np.abs(kernel).reshape(-1, kernel.shape[-1]).max(axis=0),
                    _EPS) / 127.0
    kq = np.clip(np.round(kernel / ws), -127, 127).astype(np.int8)
    return kq, ws.astype(np.float32)


def _layer_spec(params, module: str, layer: str,
                groups: List[Tuple[float, float]],
                relu: bool, a_out: Optional[float]):
    """Build one quantized conv layer's arrays.

    ``groups``: per input-channel-group ``(a_in, z_in, n_channels)`` —
    the concat entering each refinement stage keeps SEPARATE scales per
    member (stage heads span ~1.0 while the stem feature spans ~0.05; a
    shared concat scale would starve the small member to a few levels),
    so the first refine conv runs one s32 accumulation per group and
    combines them in f32.  Single-input layers are the 1-group case.
    (The alternative — folding per-group scales into the weights and
    running ONE 185-channel s8 conv — was trace-measured NO faster on
    the v5e, the 552px scale even 0.2 ms slower, and coarsens the weight
    scales:
    BASELINE.md "int8 concat formulation".  Keep per-group.)

    ``a_out=None`` -> f32 output (head).  Folded epilogue:
    ``y = sum_g acc_g * mult_g + bias_eff`` in output-scale units (real
    units for heads).
    """
    conv = params[module][layer]["conv"]
    kernel = np.asarray(conv["kernel"], np.float32)
    bias = np.asarray(conv["bias"], np.float32)
    assert sum(n for _, _, n in groups) == kernel.shape[2], (
        module, layer, groups, kernel.shape)
    kqs, mults, splits = [], [], []
    bias_eff = (bias if a_out is None else bias / a_out).astype(np.float64)
    start = 0
    for a_in, z_in, n in groups:
        part = kernel[:, :, start:start + n, :]
        start += n
        kq, ws = _quantize_kernel(part)
        s_o = kq.astype(np.int64).sum(axis=(0, 1, 2)).astype(np.float64)
        mult = a_in * ws if a_out is None else a_in * ws / a_out
        # z_in is 0 everywhere except the image layer's 0.5 (see module
        # docstring); the constant z*S_o correction folds into the bias
        # (the conv's SAME zero pad leaves border taps short by a*z per
        # padded tap — half an input LSB, only ever on the image layer).
        bias_eff = bias_eff + z_in * s_o * mult
        kqs.append(kq)
        mults.append(mult.astype(np.float32))
        splits.append(int(n))
    return {
        "kernel_q": tuple(kqs),
        "mult": tuple(mults),
        "bias_eff": bias_eff.astype(np.float32),
        "meta": {
            "ksize": int(kernel.shape[0]),
            "relu": bool(relu),
            "splits": tuple(splits),
            "f32_out": a_out is None,
        },
    }


def quantize(arch: str, variables, ranges: Dict[str, float],
             input_quant: Optional[Tuple[float, float]] = None):
    """f32 ``variables`` + calibration ``ranges`` -> quantized tree.

    ``input_quant``: the lossless ``(a, z)`` of the preprocess, i.e.
    normalized pixels satisfy ``v = a * (X + z)`` with ``X = u8 - 128``.
    Default by arch: posenet preprocesses ``u8/255 - 0.5``
    (``detectors/pose.py:44``) -> ``(1/255, 0.5)``; the crop nets use
    ``u8/256 - 0.5`` (``detectors/crop_keypoints.py:130``, reference
    ``face_detector.py:29``) -> ``(1/256, 0)``, exactly symmetric.

    The tree is a plain dict pytree: ``{"qlayers": {path: {kernel_q,
    mult, bias_eff}}, "part_scales": {stage: (a_head, ...)}}`` plus
    static per-layer meta (plain Python values) returned separately so
    jitted programs close over it.  Returns ``(qtree, static)``.
    """
    if input_quant is None:
        input_quant = (1.0 / 255.0, 0.5) if arch == "posenet" \
            else (1.0 / 256.0, 0.0)
    graph = ARCH_GRAPHS[arch]
    params = jax.device_get(variables)["params"]
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), params)

    def a_of(path: str) -> float:
        return max(ranges[path], _EPS) / 127.0

    def out_channels(module: str, layer: str) -> int:
        return int(params[module][layer]["conv"]["kernel"].shape[-1])

    qlayers: Dict[str, dict] = {}
    meta: Dict[str, dict] = {}
    part_scales: Dict[str, tuple] = {}

    def add(module: str, layer: str, groups, relu: bool,
            a_out: Optional[float]) -> None:
        spec = _layer_spec(params, module, layer, groups, relu, a_out)
        path = f"{module}/{layer}"
        meta[path] = spec.pop("meta")
        qlayers[path] = spec

    # stem: input layer is the near-lossless image quant — X = u8 - 128
    # (see ``input_quant`` above); every later tensor is symmetric (z=0)
    a_in, z_in = input_quant
    for name, _pool in graph.stem:
        a_out = a_of(f"stem/{name}")
        n_in = int(params["stem"][name]["conv"]["kernel"].shape[2])
        add("stem", name, [(a_in, z_in, n_in)], relu=True, a_out=a_out)
        a_in, z_in = a_out, 0.0
    a_feat = a_in  # symmetric scale of the stem feature map
    feat_ch = out_channels("stem", graph.stem[-1][0])

    num_stages = graph.num_stages
    for stage in range(1, num_stages + 1):
        modules = graph.stage_modules(stage)
        if stage == 1:
            in_groups = [(a_feat, 0.0, feat_ch)]
        else:
            # concat(head_outputs..., feature): heads quantize
            # symmetric at their own scales, the feature arrives
            # already-quantized — no requantization loss
            prev = graph.stage_modules(stage - 1)
            head_as = tuple(a_of(p) for p in prev)
            part_scales[f"stage{stage}"] = tuple(
                np.float32(a) for a in head_as)
            in_groups = [
                (a, 0.0, out_channels(p, graph.branch_layers(stage - 1,
                                                             p)[-1]))
                for a, p in zip(head_as, prev)
            ] + [(a_feat, 0.0, feat_ch)]
        for module in modules:
            layers = graph.branch_layers(stage, module)
            groups = in_groups
            for layer in layers[:-1]:
                a_out = a_of(f"{module}/{layer}")
                add(module, layer, groups, relu=True, a_out=a_out)
                groups = [(a_out, 0.0, out_channels(module, layer))]
            add(module, layers[-1], groups, relu=False, a_out=None)

    qtree = {
        "qlayers": qlayers,
        "part_scales": part_scales,
    }
    static = QuantStatic(arch=arch, layer_meta=meta,
                         stem=tuple(graph.stem),
                         two_branch=graph.two_branch,
                         num_stages=num_stages,
                         input_a=float(input_quant[0]),
                         input_z=float(input_quant[1]))
    return qtree, static


@dataclasses.dataclass(frozen=True)
class QuantStatic:
    """Per-layer static info the traced forward closes over."""

    arch: str
    layer_meta: Dict[str, dict]
    stem: Tuple[Tuple[str, bool], ...]
    two_branch: bool
    num_stages: int
    input_a: float
    input_z: float


# ---------------------------------------------------------------------------
# Quantized forward (pure function; mirrors the Flax models' wiring)
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _im2col_acc_s8(xq, kq):
    """s8 7x7 SAME conv as ONE patch matmul: 49 shifted slices of the
    zero-padded input concatenated on channels (pure data movement),
    then a single (B*H*W, 49C) @ (49C, O) s8 x s8 -> s32 dot.  Integer
    accumulation — bit-identical to ``lax.conv_general_dilated``; pure
    XLA, so it exports portably and shards under GSPMD.  Measured 7.8x
    faster than XLA's s8 conv at the 23x23 pathology grid (and SLOWER
    >=46x46 — route via ``use_for_layer`` only): BASELINE.md round 5
    "conv7 kernel"."""
    bsz, h, w, c = xq.shape
    o = kq.shape[-1]
    xp = jnp.pad(xq, ((0, 0), (3, 3), (3, 3), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + w, :]
            for dy in range(7) for dx in range(7)]
    patches = jnp.concatenate(cols, axis=-1).reshape(bsz * h * w, 49 * c)
    acc = lax.dot_general(patches, kq.reshape(49 * c, o),
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return acc.reshape(bsz, h, w, o)


def _route_conv7(parts, spec, meta, conv7_impl: str) -> bool:
    """True when this layer's s8 conv should leave XLA's conv emitter:
    7x7 window at a measured-pathological small grid
    (``ops/pallas/conv7.py::use_for_layer`` — the crossover is
    max(h, w) <= 32; at >=46 XLA already runs ~65% of int8 peak)."""
    if conv7_impl == "xla" or meta["ksize"] != 7 or meta["f32_out"]:
        return False
    from tpupose.ops.pallas.conv7 import use_for_layer

    _, h, w, _ = parts[0].shape
    return use_for_layer(7, h, w, int(spec["kernel_q"][0].shape[-1]))


def _qconv(parts, spec, meta, conv7_impl: str = "xla"):
    """One quantized conv layer: tuple of s8 NHWC input groups (the
    refine-stage concat members; 1-tuple everywhere else) -> s8 (or f32
    head) out.  Each group runs its own s8xs8->s32 accumulation (same
    total MACs as the concatenated conv) with the conv's NATIVE SAME
    zero padding (exact: zero-points are 0 — see module docstring), and
    the XLA-fused epilogue combines them with the folded scales/bias.

    ``conv7_impl`` selects the implementation for 7x7 layers at
    small (<=32 px) grids ONLY — XLA's s8 conv emitter runs them at
    2.5% of int8 peak (BASELINE.md round 5 "conv7 kernel"):

    * ``"xla"``    — plain conv everywhere (portable, GSPMD-safe;
      keeps spatial sharding intact on meshes).
    * ``"im2col"`` — patch-matmul reformulation, still pure XLA
      (7.8x at 23x23; exports portably) — the serving-bundle twin.
    * ``"pallas"`` — the fused Mosaic kernel ``ops/pallas/conv7.py``
      (19.5x at 23x23), bit-identical, live TPU detectors only
      (Mosaic custom calls pin ``jax.export`` to one platform).

    All three are BIT-IDENTICAL (integer accumulation + the same f32
    epilogue expression in the same order; asserted on the TPU by
    ``scripts/conv7_probe.py`` and in tests).  A fused Pallas
    requantize-only epilogue was separately built, measured, and
    REJECTED (parity-at-best; ``ops/pallas/requant.py``)."""
    if _route_conv7(parts, spec, meta, conv7_impl):
        if conv7_impl == "pallas":
            from tpupose.ops.pallas.conv7 import conv7_s8

            return conv7_s8(parts, spec["kernel_q"], spec["mult"],
                            spec["bias_eff"], relu=meta["relu"])
        accs = [_im2col_acc_s8(xq, kq)
                for xq, kq in zip(parts, spec["kernel_q"])]
    else:
        accs = [
            lax.conv_general_dilated(
                xq, kq, window_strides=(1, 1), padding="SAME",
                dimension_numbers=_DN, preferred_element_type=jnp.int32)
            for xq, kq in zip(parts, spec["kernel_q"])
        ]
    y = None
    for acc, mult in zip(accs, spec["mult"]):
        part = acc.astype(jnp.float32) * mult
        y = part if y is None else y + part
    y = y + spec["bias_eff"]
    if meta["f32_out"]:
        return y
    if meta["relu"]:
        y = jnp.maximum(y, 0.0)
    # symmetric store in output-scale units (a_out = range/127): ReLU
    # outputs occupy [0, 127] — the same quantum the shifted scheme had
    return jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)


def _max_pool_s8(x):
    return lax.reduce_window(x, np.int8(-128), lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _quant_sym(x_f32, a_to):
    return jnp.clip(jnp.round(x_f32 / a_to), -128.0, 127.0).astype(jnp.int8)


def quant_apply(static: QuantStatic, qtree, x, conv7_impl: str = "xla"):
    """Quantized forward matching ``model.apply(variables, x)``:
    normalized f32 (B, H, W, 3) in, stacked per-stage f32 maps out —
    ``(pafs, heatmaps)`` for two-branch, stacked heatmaps otherwise.
    With the default ``conv7_impl="xla"`` (and also ``"im2col"``) the
    program is pure XLA (no custom calls), so it ``jax.export``s
    portably and GSPMD can auto-partition it over a mesh;
    ``"pallas"`` routes small-grid 7x7 layers through the Mosaic
    kernel — live TPU detectors only (see ``_qconv``)."""
    ql = qtree["qlayers"]
    meta = static.layer_meta

    def run(module, layer, parts):
        path = f"{module}/{layer}"
        return _qconv(parts, ql[path], meta[path], conv7_impl)

    # lossless input quantization: X = u8 - 128 (see ``quantize``)
    xq = jnp.clip(jnp.round(x / static.input_a - static.input_z),
                  -128.0, 127.0).astype(jnp.int8)
    for name, pool in static.stem:
        xq = run("stem", name, (xq,))
        if pool:
            xq = _max_pool_s8(xq)
    feat_q = xq  # symmetric; scale folded into every consumer's mult

    graph = ARCH_GRAPHS[static.arch]
    heads: List[List[jnp.ndarray]] = []  # per stage: [h1(, h2)]
    for stage in range(1, static.num_stages + 1):
        modules = graph.stage_modules(stage)
        if stage == 1:
            parts_in = (feat_q,)
        else:
            scales = qtree["part_scales"][f"stage{stage}"]
            parts_in = tuple(
                _quant_sym(h, a) for h, a in zip(heads[-1], scales)
            ) + (feat_q,)
        outs = []
        for module in modules:
            layers = graph.branch_layers(stage, module)
            parts = parts_in
            for layer in layers:
                parts = (run(module, layer, parts),)
            outs.append(parts[0])
        heads.append(outs)

    if static.two_branch:
        pafs = jnp.stack([h[0] for h in heads], axis=0)
        hms = jnp.stack([h[1] for h in heads], axis=0)
        return pafs, hms
    return jnp.stack([h[0] for h in heads], axis=0)


def make_quant_apply(static: QuantStatic, conv7_impl: str = "xla"):
    """``(qtree, x) -> maps`` closure matching the ``model.apply``
    signature detectors dispatch through."""

    def apply_fn(variables, x):
        return quant_apply(static, variables, x, conv7_impl)

    return apply_fn


# ---------------------------------------------------------------------------
# Flat (npz-compatible) round trip for serving bundles
# ---------------------------------------------------------------------------

_FLAT_SEP = "|"  # layer paths contain "/" (module/layer), never "|"


def qtree_to_flat(qtree) -> Dict[str, np.ndarray]:
    """Quantized tree -> {key: array} for ``np.savez`` (tuple positions
    become integer path components)."""
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + [str(k)])
        elif isinstance(node, (tuple, list)):
            for i, v in enumerate(node):
                walk(v, prefix + [str(i)])
        else:
            flat[_FLAT_SEP.join(prefix)] = np.asarray(node)

    walk(qtree, [])
    return flat


def qtree_from_flat(flat: Dict[str, np.ndarray]):
    """Inverse of ``qtree_to_flat``: all-digit dict levels fold back into
    tuples, so the pytree structure matches what ``jax.export`` recorded
    at save time."""
    root: dict = {}
    for key, arr in flat.items():
        parts = key.split(_FLAT_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def fold(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                return tuple(fold(node[str(i)]) for i in range(len(node)))
            return {k: fold(v) for k, v in node.items()}
        return node

    return fold(root)
