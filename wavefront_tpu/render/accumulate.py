"""Temporal accumulation (BASELINE config 5).

The reference renders one sample per pixel per frame with a frame-indexed
RNG seed (interactive_rendering.rs:1259) and no accumulation; the seed
machinery makes Monte-Carlo averaging across frames correct, so this module
adds the running-mean buffer: while the camera holds still, successive
frames (different seeds) average toward the converged image; any camera/
scene change resets the history.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _accumulate(accum, img, n):
    nf = n.astype(jnp.float32)
    return accum + (img - accum) / (nf + 1.0)


class TemporalAccumulator:
    def __init__(self):
        self._accum: Optional[jax.Array] = None
        self._samples = 0
        self._key = None

    @property
    def samples(self) -> int:
        return self._samples

    def add(self, img: jax.Array, key=None) -> jax.Array:
        """Fold a new frame in; `key` is any hashable state fingerprint
        (camera pose, prefs) — a change resets history."""
        if key is not None and key != self._key:
            self._key = key
            self._accum = None
            self._samples = 0
        img = jnp.asarray(img)
        if self._accum is None or self._accum.shape != img.shape:
            self._accum = img
            self._samples = 1
        else:
            self._accum = _accumulate(
                self._accum, img, jnp.uint32(self._samples)
            )
            self._samples += 1
        return self._accum

    def image(self) -> Optional[np.ndarray]:
        if self._accum is None:
            return None
        return np.asarray(jax.device_get(self._accum))
