"""Component-of-arrays 3-vectors for the shading hot path.

TPU lane economics: an (N, 3) array puts the 3-channel axis on the 128-lane
minor dimension — measured 2.5x worse than three (N,) component arrays for
elementwise math (docs/PERF.md).  V3 keeps per-ray vector state as three
flat arrays; (N, 3) materializes only at kernel boundaries that want the
packed layout (stack()/from_array).

Math matches the (N, 3) formulations bit-for-bit: dot/norm reduce in
component order ((x+y)+z), exactly like an XLA reduce over a minor axis of
3, so the SoA refactor of the shade path leaves golden images unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class V3(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array

    # -- construction ----------------------------------------------------
    @staticmethod
    def from_array(a):
        """(N, 3) -> V3 of (N,) components."""
        return V3(a[..., 0], a[..., 1], a[..., 2])

    @staticmethod
    def full_like(ref: "V3", value):
        f = jnp.full_like(ref.x, value)
        return V3(f, jnp.full_like(ref.y, value), jnp.full_like(ref.z, value))

    def stack(self):
        """V3 -> (N, 3)."""
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    # -- arithmetic (componentwise; scalars/(N,) arrays broadcast) -------
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)


def dot(a: V3, b: V3):
    return (a.x * b.x + a.y * b.y) + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def norm(a: V3):
    return jnp.sqrt(dot(a, a))


def where(mask, a: V3, b: V3) -> V3:
    """Select with a (N,) mask (the SoA form of where(mask[:, None], ...))."""
    return V3(
        jnp.where(mask, a.x, b.x),
        jnp.where(mask, a.y, b.y),
        jnp.where(mask, a.z, b.z),
    )


def any_nonzero(a: V3):
    """jnp.any(v != 0, axis=-1) in SoA form."""
    return (a.x != 0.0) | (a.y != 0.0) | (a.z != 0.0)
