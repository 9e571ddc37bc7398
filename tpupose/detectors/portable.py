"""Export-portability seam shared by the detector classes.

A live detector's forward seam (``det._apply``) may contain Pallas
custom calls (the fused w8a8 requant epilogue,
``ops/pallas/requant.py``); Mosaic custom calls pin a ``jax.export``
program to the lowering platform, so serving bundles must trace the
XLA-only twin (``det._apply_portable``) instead.  ``serving.py`` wraps
every export in this swap.
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
