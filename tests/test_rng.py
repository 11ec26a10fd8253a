"""Murmur3 RNG parity vs an independent pure-Python oracle.

The GLSL source of truth is the helper block embedded in every reference
kernel (reference raytrace.rs:117-161).
"""

import numpy as np
import pytest

from wavefront_tpu.core import rng

M = 0xFFFFFFFF


def py_combine(h, k):
    k = (k * 0x1B873593) & M
    h ^= k
    h = ((h << 13) | (h >> 19)) & M
    h = (h * 5 + 0xE6546B64) & M
    return h


def py_finalize(h):
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & M
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & M
    h ^= h >> 16
    return h


def py_float_construct(m):
    m = (m & 0x007FFFFF) | 0x3F800000
    return float(np.uint32(m).view(np.float32)) - 1.0


@pytest.mark.parametrize("seed", [0, 1, 0xDEADBEEF, 0xFFFFFFFF, 12345])
def test_combine_matches_oracle(seed):
    ks = np.array([0, 1, 2, 77, 0xFFFFFFFF, 0x80000000], dtype=np.uint32)
    got = np.asarray(rng.murmur3_combine(np.uint32(seed), ks))
    want = np.array([py_combine(seed, int(k)) for k in ks], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("h", [0, 1, 0xCAFEBABE, 0x7FFFFFFF, 999999937])
def test_finalize_matches_oracle(h):
    got = int(np.asarray(rng.murmur3_finalize(np.uint32(h))))
    assert got == py_finalize(h)


def test_float_construct_range_and_values():
    hs = np.arange(0, 2**32, 2**24, dtype=np.uint32)
    fs = np.asarray(rng.float_construct(hs))
    assert np.all(fs >= 0.0) and np.all(fs < 1.0)
    for h in [0, 0x007FFFFF, 0x12345678, 0xFFFFFFFF]:
        got = float(np.asarray(rng.float_construct(np.uint32(h))))
        assert got == pytest.approx(py_float_construct(h), abs=0)


def test_finalizef_deterministic_chain():
    # The canonical draw pattern used by the trace kernel: seed chained with
    # combine(seed, i) then finalized to a float (reference raytrace.rs:589-664).
    seed = rng.murmur3_combine(np.uint32(42), np.uint32(7))
    a = np.asarray(rng.murmur3_finalizef(rng.murmur3_combine(seed, np.uint32(4))))
    b = np.asarray(rng.murmur3_finalizef(rng.murmur3_combine(seed, np.uint32(4))))
    assert a == b
    want = py_float_construct(py_finalize(py_combine(py_combine(42, 7), 4)))
    assert float(a) == pytest.approx(want, abs=0)
