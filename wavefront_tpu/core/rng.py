"""Stateless murmur3-based RNG, vectorized over uint32 arrays.

The reference embeds the identical helper block in every GLSL kernel
(raygen.rs:41-82, raytrace.rs:117-161, nee_pdf/outgoing_radiance likewise):
a murmur3 combine/finalize pair plus an IEEE-mantissa trick that turns 32
random bits into a float in [0, 1).  Frames are reproducible because every
random number is a pure function of (invocation_seed, ray id, draw index).

This module is the single JAX implementation used by every device kernel;
tests/test_rng.py checks it against an independent pure-Python oracle.
"""

from __future__ import annotations

import jax.lax
import jax.numpy as jnp

_U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, dtype=_U32)


def murmur3_combine(h, k):
    """One murmur3 block-mix round (reference raytrace.rs:134-142)."""
    h = _u32(h)
    k = _u32(k) * _U32(0x1B873593)
    h = h ^ k
    h = (h << 13) | (h >> 19)
    h = h * _U32(5) + _U32(0xE6546B64)
    return h


def murmur3_finalize(h):
    """Murmur3 finalizer (reference raytrace.rs:146-153)."""
    h = _u32(h)
    h = h ^ (h >> 16)
    h = h * _U32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _U32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def float_construct(m):
    """Map 32 random bits to a float32 in [0, 1) via mantissa bit-stuffing
    (reference raytrace.rs:120-129)."""
    m = _u32(m)
    m = (m & _U32(0x007FFFFF)) | _U32(0x3F800000)
    f = jax.lax.bitcast_convert_type(m, jnp.float32)
    return f - jnp.float32(1.0)


def murmur3_finalizef(h):
    """finalize + float_construct (reference raytrace.rs:159-161)."""
    return float_construct(murmur3_finalize(h))


def murmur3_combinef(h, k_float):
    """Combine a float's bit pattern (reference raytrace.rs:155-157)."""
    k = jax.lax.bitcast_convert_type(jnp.asarray(k_float, jnp.float32), _U32)
    return murmur3_combine(h, k)
