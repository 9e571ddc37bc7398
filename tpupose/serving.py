"""AOT serving bundles: ``jax.export``'ed detector programs + weights.

Production-deployment capability with no reference counterpart (the
reference rebuilds its Chainer graph from Python source in every process,
``pose_detector.py:16-35``): the detector programs for each serving image
geometry — the fast-path program, or precise mode's device-pyramid
per-scale programs + cross-scale average/postprocess program — are
AOT-lowered to StableHLO and serialized next to the weights, so a serving
process loads and runs the detector

* without the model/Flax code executing at all (no tracing, no Python
  forward definition on the serving path),
* with jax.export's cross-version compatibility guarantees for the
  serialized artifact,
* by default lowered for BOTH cpu and tpu, so one bundle serves either
  backend (a bundle exported on a CPU build box runs on the TPU fleet).

Layout of a bundle directory::

    meta.json                    arch, mode, InferenceConfig, geometry table
    params.npz                   flax param tree, '/'-joined flat keys
    fast_<H>x<W>.jexp            fast-path program per image size, or
    precise_<H>x<W>_scale<k>.jexp + precise_<H>x<W>_avg.jexp  (precise mode)

Note on Pallas: the fast-path peak finder auto-selects a Pallas kernel only
on a TPU backend above ~256² map area (`ops.peaks.find_peaks`); a
multi-platform export traces on the host backend, so bundles exported from a
CPU box embed the (numerically identical) XLA peak path.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.config import INFERENCE, InferenceConfig
from tpupose.detectors.pose import PoseDetector, emit_result
from tpupose.ops.postprocess import PoseResult
from tpupose.ops.resize import compute_optimal_size
from tpupose.weights.chainer_npz import commit_variables

# The exported programs return a PoseResult; its pytree type must be
# registered for serialization in BOTH the exporting and serving process
# (this module is imported by both sides).
jax.export.register_namedtuple_serialization(
    PoseResult, serialized_name="tpupose.ops.postprocess.PoseResult")

_META = "meta.json"
_PARAMS = "params.npz"


def _geometry(cfg: InferenceConfig, orig_h: int, orig_w: int):
    """The fast path's (input_hw, map_hw) for an original image size —
    the same arithmetic as ``PoseDetector._submit_fast`` (ref
    ``pose_detector.py:490-491``)."""
    input_w, input_h = compute_optimal_size(
        orig_h, orig_w, cfg.img_size, cfg.downscale)
    map_w, map_h = compute_optimal_size(
        orig_h, orig_w, cfg.heatmap_size, cfg.downscale)
    return (input_h, input_w), (map_h, map_w)


def save_bundle(det: PoseDetector, path: str,
                image_sizes: List[Tuple[int, int]],
                platforms: Tuple[str, ...] = ("cpu", "tpu")) -> None:
    """AOT-export ``det``'s serving programs for each (orig_h, orig_w)
    image size and write a self-contained bundle to ``path``.

    Fast detectors export one program per geometry; precise detectors
    export the device-pyramid per-scale programs plus the cross-scale
    average+postprocess program (one original-image upload per frame at
    serve time, like the live detector)."""
    from flax.traverse_util import flatten_dict

    if det.precise and not det.cfg.device_pyramid:
        raise ValueError(
            "precise serving bundles require cfg.device_pyramid=True (the "
            "host-cv2 pyramid resizes on host, outside the exported "
            "programs)")
    if det.precise and det.cfg.fuse_small_scales:
        raise ValueError(
            "export with cfg.fuse_small_scales=False — the fused pair "
            "changes small-scale border values, and bundles pin exact "
            "serving semantics")
    os.makedirs(path, exist_ok=True)
    host_vars = jax.device_get(det.variables)
    flat = flatten_dict(host_vars["params"], sep="/")
    # npz cannot round-trip bf16 (numpy loads it back as void); floats are
    # stored f32 (lossless upcast) and re-cast to params_dtype at load.
    float_dtypes = {str(v.dtype) for v in flat.values()
                    if jnp.issubdtype(v.dtype, jnp.floating)}
    params_dtype = float_dtypes.pop() if len(float_dtypes) == 1 else "float32"
    np.savez(os.path.join(path, _PARAMS),
             **{k: v.astype(np.float32)
                if jnp.issubdtype(v.dtype, jnp.floating) else v
                for k, v in flat.items()})
    var_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), host_vars)

    def write(exported, name: str) -> str:
        with open(os.path.join(path, name), "wb") as f:
            f.write(exported.serialize())
        return name

    geoms: Dict[str, dict] = {}
    for orig_h, orig_w in image_sizes:
        key = f"{orig_h}x{orig_w}"
        if det.precise:
            post_hw = det._postprocess_hw(orig_h, orig_w)
            img_spec = jax.ShapeDtypeStruct((orig_h, orig_w, 3), jnp.uint8)
            scale_files = []
            for k, (scale, scaled_hw, padded_hw) in enumerate(
                    det._pyramid_geometries(orig_h, orig_w)):
                fn = det._device_scale_fn(post_hw, scaled_hw, padded_hw)
                exported = jax.export.export(fn, platforms=list(platforms))(
                    var_specs, img_spec)
                scale_files.append(write(
                    exported, f"precise_{key}_scale{k}.jexp"))
            n = len(det.cfg.scales)
            paf_spec = [jax.ShapeDtypeStruct(
                (post_hw[0], post_hw[1], 38), jnp.float32)] * n
            hm_spec = [jax.ShapeDtypeStruct(
                (post_hw[0], post_hw[1], 19), jnp.float32)] * n
            avg = jax.export.export(
                det._avg_postprocess_fn(post_hw, n),
                platforms=list(platforms))(paf_spec, hm_spec)
            geoms[key] = {
                "scale_programs": scale_files,
                "avg_program": write(avg, f"precise_{key}_avg.jexp"),
                "post_hw": list(post_hw),
            }
        else:
            in_hw, map_hw = _geometry(det.cfg, orig_h, orig_w)
            fn = det._fast_fn(in_hw, map_hw)
            img_spec = jax.ShapeDtypeStruct(
                (in_hw[0], in_hw[1], 3), jnp.uint8)
            exported = jax.export.export(fn, platforms=list(platforms))(
                var_specs, img_spec)
            geoms[key] = {
                "program": write(exported, f"fast_{key}.jexp"),
                "in_hw": list(in_hw), "map_hw": list(map_hw)}

    meta = {
        "arch": det.arch,
        "mode": "precise" if det.precise else "fast",
        "params_dtype": params_dtype,
        "cfg": dataclasses.asdict(det.cfg),
        "platforms": list(platforms),
        "geometries": geoms,
    }
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)


def _cfg_from_meta(d: dict) -> InferenceConfig:
    fields = {f.name: f for f in dataclasses.fields(InferenceConfig)}
    kw = {}
    for k, v in d.items():
        if k in fields:
            kw[k] = tuple(v) if isinstance(v, list) else v
    return InferenceConfig(**kw)


class ServingPoseDetector:
    """Runs a saved bundle: deserialized AOT programs + committed params.

    API-compatible with ``PoseDetector`` for the fast path
    (``__call__(img) -> (poses, scores)``) but never touches the model
    definition — only the geometries exported into the bundle are
    servable."""

    def __init__(self, path: str):
        from flax.traverse_util import unflatten_dict

        with open(os.path.join(path, _META)) as f:
            meta = json.load(f)
        self.arch = meta["arch"]
        self.mode = meta.get("mode", "fast")
        self.cfg = _cfg_from_meta(meta["cfg"])
        with np.load(os.path.join(path, _PARAMS)) as z:
            params = unflatten_dict({k: z[k] for k in z.files}, sep="/")
        pd = meta.get("params_dtype", "float32")
        self.variables = commit_variables(
            {"params": params},
            dtype=None if pd == "float32" else getattr(jnp, pd))

        def load(name):
            with open(os.path.join(path, name), "rb") as f:
                return jax.export.deserialize(bytearray(f.read()))

        self._by_size: Dict[Tuple[int, int], tuple] = {}
        for key, g in meta["geometries"].items():
            h, w = (int(t) for t in key.split("x"))
            if self.mode == "precise":
                self._by_size[(h, w)] = (
                    [load(n) for n in g["scale_programs"]],
                    load(g["avg_program"]), tuple(g["post_hw"]))
            else:
                self._by_size[(h, w)] = (
                    load(g["program"]), tuple(g["in_hw"]),
                    tuple(g["map_hw"]))
        self._warned_saturation = False

    @property
    def image_sizes(self) -> List[Tuple[int, int]]:
        return sorted(self._by_size)

    def __call__(self, orig_img: np.ndarray):
        import cv2

        orig_h, orig_w = orig_img.shape[:2]
        entry = self._by_size.get((orig_h, orig_w))
        if entry is None:
            raise ValueError(
                f"no program exported for image size {(orig_h, orig_w)}; "
                f"bundle serves {self.image_sizes}")
        if self.mode == "precise":
            scale_programs, avg_program, post_hw = entry
            orig_dev = jnp.asarray(orig_img)
            maps = [p.call(self.variables, orig_dev)
                    for p in scale_programs]
            result = avg_program.call([m[0] for m in maps],
                                      [m[1] for m in maps])
            map_hw = post_hw
        else:
            exported, in_hw, map_hw = entry
            resized = cv2.resize(orig_img, (in_hw[1], in_hw[0]))
            result = exported.call(self.variables, jnp.asarray(resized))
        poses, scores, self._warned_saturation = emit_result(
            result, orig_w / map_hw[1], orig_h / map_hw[0],
            warned=self._warned_saturation)
        return poses, scores
