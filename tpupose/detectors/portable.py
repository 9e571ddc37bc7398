"""Export-portability seam shared by the detector classes.

A live detector's forward seam (``det._apply``) may contain Pallas
custom calls (the fused s8 7x7 conv kernel ``ops/pallas/conv7.py``
routed by ``quantize(conv7_impl="pallas")``); Mosaic custom calls pin a
``jax.export`` program to the lowering platform, so serving bundles
must trace the XLA-only twin (``det._apply_portable`` — same
small-grid layers routed through the pure-XLA im2col formulation, still
7.8x over XLA's conv at the 23x23 pathology grid and bit-identical).
``serving.py`` wraps every export in this swap.
"""

from __future__ import annotations

import contextlib


def portable_programs(det):
    """Context manager: temporarily route ``det``'s traced bodies through
    the export-portable forward (no Pallas custom calls).  Program caches
    are cleared on entry AND exit — callers re-trace after an export,
    which only matters offline (export is not a serving-path op)."""
    if det._apply is det._apply_portable:
        return contextlib.nullcontext()

    @contextlib.contextmanager
    def swap():
        live = det._apply
        det._apply = det._apply_portable
        det._clear_program_caches()
        try:
            yield
        finally:
            det._apply = live
            det._clear_program_caches()

    return swap()
