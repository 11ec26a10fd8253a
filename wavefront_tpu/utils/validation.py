"""Validation-layer analog.

The reference keeps the Khronos validation layer always on as its de facto
correctness/race checker (reference main.rs:216-219; SURVEY.md section 5).
In XLA the dataflow graph supplies ordering for free; the remaining failure
modes are numeric (NaN/Inf propagation) and out-of-bounds gathers (which
XLA clamps silently).  This module is the debug switch for both.
"""

from __future__ import annotations

import contextlib

import numpy as np


@contextlib.contextmanager
def validation_layer(nan_checks: bool = True, interpret: bool = False):
    """Enable heavy runtime checks for the enclosed code.

    nan_checks: jax raises on any NaN produced inside jitted code.
    interpret:  disable jit so python-level debugging (breakpoints, prints)
                works inside the render path.
    """
    import jax

    undo = []
    if nan_checks:
        prev = jax.config.jax_debug_nans
        jax.config.update("jax_debug_nans", True)
        undo.append(lambda: jax.config.update("jax_debug_nans", prev))
    ctx = jax.disable_jit() if interpret else contextlib.nullcontext()
    try:
        with ctx:
            yield
    finally:
        for u in undo:
            u()


def check_image(img, what: str = "image") -> None:
    """Assert a rendered image is finite and plausibly sized."""
    a = np.asarray(img)
    if not np.all(np.isfinite(a)):
        bad = int(np.size(a) - np.isfinite(a).sum())
        raise FloatingPointError(f"{what}: {bad} non-finite values")
    if a.ndim != 3 or a.shape[-1] != 3:
        raise ValueError(f"{what}: unexpected shape {a.shape}")
