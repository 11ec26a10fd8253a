"""Morton (Z-order) codes for ray-coherence sort keys.

The reference carries 2-D/3-D bit-interleaving helpers in its trace kernel
(raytrace.rs:402-457) intended as inter-bounce sort keys, but ships with the
morton path commented out (raytrace.rs:687-693; the shipped sort key is the
identity).  Here the morton machinery is implemented for real and used when
RenderingPreferences.sort_type == 1.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, dtype=_U32)


def spread_bits_2(x):
    """Spread the low 16 bits of x, inserting one zero between bits."""
    x = _u32(x) & _U32(0x0000FFFF)
    x = (x | (x << 8)) & _U32(0x00FF00FF)
    x = (x | (x << 4)) & _U32(0x0F0F0F0F)
    x = (x | (x << 2)) & _U32(0x33333333)
    x = (x | (x << 1)) & _U32(0x55555555)
    return x


def interleave_bits_2(i, j):
    """32-bit 2-D morton code from two 16-bit ints (reference raytrace.rs:406-412:
    j occupies the odd bits)."""
    return spread_bits_2(i) | (spread_bits_2(j) << 1)


def deinterleave_bits_2(z):
    """Inverse of interleave_bits_2 (reference raytrace.rs:414-421)."""
    z = _u32(z)

    def compact(x):
        x = x & _U32(0x55555555)
        x = (x | (x >> 1)) & _U32(0x33333333)
        x = (x | (x >> 2)) & _U32(0x0F0F0F0F)
        x = (x | (x >> 4)) & _U32(0x00FF00FF)
        x = (x | (x >> 8)) & _U32(0x0000FFFF)
        return x

    return compact(z), compact(z >> 1)


def spread_bits_3(x):
    """Spread the low 10 bits of x, inserting two zeros between bits
    (reference raytrace.rs:426-433)."""
    x = _u32(x) & _U32(0x000003FF)
    x = (x | (x << 16)) & _U32(0x030000FF)
    x = (x | (x << 8)) & _U32(0x0300F00F)
    x = (x | (x << 4)) & _U32(0x030C30C3)
    x = (x | (x << 2)) & _U32(0x09249249)
    return x


def interleave_bits_3(i, j, k):
    """30-bit 3-D morton code from three 10-bit ints.

    Note: the reference's interleaveBits3 (raytrace.rs:435-440) computes the
    spreads and then discards them (a bug — it returns (x<<2)|(y<<1)|z).
    This is the intended interleave.
    """
    return (spread_bits_3(i) << 2) | (spread_bits_3(j) << 1) | spread_bits_3(k)


def discretize_position(p, lo=-50.0, hi=50.0):
    """Map world positions (per-axis domain [lo, hi], reference
    raytrace.rs:447-457) to 10-bit integer lattice coordinates."""
    p = jnp.asarray(p, jnp.float32)
    mapped = jnp.clip((p - lo) / (hi - lo), 0.0, 1.0)
    return (mapped * 1023.0).astype(_U32)


def morton_key_3d(p, lo=-50.0, hi=50.0):
    """30-bit morton sort key of a world position; the inter-bounce ray sort
    key the reference intended (raytrace.rs:692)."""
    ijk = discretize_position(p, lo, hi)
    return interleave_bits_3(ijk[..., 0], ijk[..., 1], ijk[..., 2])


def morton_key_3d_soa(x, y, z, lo=-50.0, hi=50.0):
    """morton_key_3d over component arrays (the renderer's SoA hot path)."""
    return interleave_bits_3(
        discretize_position(x, lo, hi),
        discretize_position(y, lo, hi),
        discretize_position(z, lo, hi),
    )
