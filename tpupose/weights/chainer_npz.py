"""Weight interchange with the reference's Chainer ``.npz`` format.

The reference distributes converted Caffe weights as Chainer model snapshots
(``coco_posenet.npz``/``facenet.npz``/``handnet.npz``; loaded at
``/root/reference/pose_detector.py:26``, saved by
``/root/reference/models/convert_model.py:265-282``).  A Chainer model npz
maps ``"<layer>/W"`` -> OIHW conv kernels and ``"<layer>/b"`` -> biases.

This module converts between that flat layout and the nested Flax parameter
tree of ``tpupose.models`` (HWIO kernels, NHWC activations) in both
directions, so users of the reference can bring their existing weight files
unchanged — including the reference's own quirk that
``models/convert_model.py:24-34`` never copies ``conv5_5_CPM_L1`` (we simply
map whatever keys exist and report what was missed).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

FlaxParams = Dict[str, dict]

_POSE_STAGE1_RE = re.compile(r"^conv5_[1-5]_CPM(_L[12])$")
_POSE_MSTAGE_RE = re.compile(r"^Mconv[1-7]_stage([2-9])(_L[12])$")
_SINGLE_MSTAGE_RE = re.compile(r"^Mconv[1-7]_stage([2-9])$")


def layer_to_path(layer: str) -> Tuple[str, str]:
    """Map a Chainer layer name to the (module, submodule) Flax path.

    Returns ``(block_name, layer_name)``; the conv itself lives at
    ``params[block_name][layer_name]['conv']``.
    """
    m = _POSE_STAGE1_RE.match(layer)
    if m:
        return f"stage1{m.group(1)}", layer
    m = _POSE_MSTAGE_RE.match(layer)
    if m:
        return f"stage{m.group(1)}{m.group(2)}", layer
    m = _SINGLE_MSTAGE_RE.match(layer)
    if m:
        return f"stage{m.group(1)}", layer
    if layer in ("conv6_1_CPM", "conv6_2_CPM"):
        return "stage1", layer
    # Everything else (conv1_1 .. conv5_3_CPM and the *_CPM adapters) is stem.
    return "stem", layer


def load_npz_params(path: str, params: FlaxParams, strict: bool = False):
    """Load a Chainer model ``.npz`` into a copy of a Flax param tree.

    ``params`` provides the expected tree structure/shapes (e.g. from
    ``model.init``).  Returns ``(new_params, report)`` where ``report`` lists
    loaded / missing-in-npz / unused-npz keys.
    """
    import jax

    archive = np.load(path)
    flat: Dict[str, np.ndarray] = {k: archive[k] for k in archive.files}

    new_params = jax.tree_util.tree_map(np.asarray, params)
    loaded, missing = [], []

    for block_name, block in new_params.items():
        for layer_name, layer in block.items():
            conv = layer["conv"]
            w_key, b_key = f"{layer_name}/W", f"{layer_name}/b"
            if w_key in flat:
                w = flat.pop(w_key)  # OIHW
                kernel = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
                if kernel.shape != conv["kernel"].shape:
                    raise ValueError(
                        f"{layer_name}: npz kernel {kernel.shape} != "
                        f"model {conv['kernel'].shape}")
                conv["kernel"] = kernel
                loaded.append(w_key)
            else:
                missing.append(w_key)
            if b_key in flat:
                bias = flat.pop(b_key).astype(np.float32)
                if bias.shape != conv["bias"].shape:
                    raise ValueError(
                        f"{layer_name}: npz bias {bias.shape} != "
                        f"model {conv['bias'].shape}")
                conv["bias"] = bias
                loaded.append(b_key)
            else:
                missing.append(b_key)

    report = {"loaded": loaded, "missing": missing, "unused": sorted(flat)}
    if strict and (missing or flat):
        raise ValueError(f"npz/model mismatch: {report}")
    return new_params, report


def save_npz_params(path: str, params: FlaxParams) -> None:
    """Save a Flax param tree as a Chainer-compatible model ``.npz``."""
    flat: Dict[str, np.ndarray] = {}
    for block in params.values():
        for layer_name, layer in block.items():
            conv = layer["conv"]
            kernel = np.asarray(conv["kernel"], dtype=np.float32)  # HWIO
            flat[f"{layer_name}/W"] = np.transpose(kernel, (3, 2, 0, 1))
            flat[f"{layer_name}/b"] = np.asarray(conv["bias"], np.float32)
    np.savez(path, **flat)


# Keys the reference's own converter never copies: its posenet layer list
# omits ``conv5_5_CPM_L1`` (``models/convert_model.py:24-34``), so official
# ``coco_posenet.npz`` files legitimately lack these two entries (the layer
# keeps its random init there too).  Everything else missing or left over
# means a wrong/truncated file.
EXPECTED_MISSING = {
    "posenet": frozenset({"conv5_5_CPM_L1/W", "conv5_5_CPM_L1/b"}),
}


def warn_on_load_report(report, path: str, arch: str = "posenet") -> None:
    """Warn loudly when an npz load left layers at their random init
    (missing keys beyond the documented reference quirk) or carried keys
    the model has no layer for (wrong-arch file that happened to be
    shape-compatible elsewhere)."""
    import warnings

    expected = EXPECTED_MISSING.get(arch, frozenset())
    missing = [k for k in report["missing"] if k not in expected]
    unused = list(report["unused"])
    if missing or unused:
        parts = []
        if missing:
            parts.append(
                f"{len(missing)} model layers not in the file (left at "
                f"RANDOM init): {sorted(missing)[:6]}"
                + (" ..." if len(missing) > 6 else ""))
        if unused:
            parts.append(
                f"{len(unused)} file keys matched no model layer: "
                f"{unused[:6]}" + (" ..." if len(unused) > 6 else ""))
        warnings.warn(
            f"weight file {path!r} does not fully match the {arch} model — "
            + "; ".join(parts)
            + " (only the reference's documented conv5_5_CPM_L1 omission "
              "is expected for posenet)",
            RuntimeWarning, stacklevel=3)


def commit_variables(variables, mesh=None, dtype=None):
    """Place a (possibly host/numpy) variable tree on device ONCE.
    Detectors must hold committed device arrays: host arrays passed to
    ``jit`` are re-transferred on EVERY call, and over a remote PJRT
    tunnel that re-ships the full ~200 MB CocoPoseNet tree per frame
    (measured: 27 s/frame streaming vs 66 ms with committed params).

    With a ``mesh``, commits replicated over it (a tree committed to one
    device would conflict with the meshed programs' device assignment).

    With ``dtype``, floating-point leaves are stored at rest in that dtype.
    For a detector built with the same ``compute_dtype`` this has zero
    numeric change — Flax casts the params to the compute dtype at every
    dispatch anyway — and halves the tree's HBM footprint and (over the
    remote tunnel) its one-time upload.  Trace-measured: per-program device
    times are UNCHANGED (<0.05 ms), so this is a memory/upload win, not a
    speed win."""
    import jax
    import jax.numpy as jnp

    if dtype is not None:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            variables)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.device_put(
            variables, NamedSharding(mesh, PartitionSpec()))
    return jax.device_put(variables)


def params_from_npz_auto(path: str, model, insize: int = 32):
    """Convenience: init ``model`` then load ``path`` over it.

    The init only supplies the parameter tree (conv shapes are input-size
    independent) and the random fallback values for layers absent from the
    npz — matching the reference conversion flow, where uncopied layers
    keep their init (e.g. the ``conv5_5_CPM_L1`` quirk).  A small dummy
    keeps this cheap: a 368px eager init is seconds of wasted compute per
    detector (worse over a remote device link)."""
    import jax
    import jax.numpy as jnp

    dummy = jnp.zeros((1, insize, insize, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy)
    params, report = load_npz_params(path, variables["params"])
    return {"params": params}, report
