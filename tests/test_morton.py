"""Morton code unit tests, mirroring the commented-out self-tests the
reference carries inside its trace kernel (reference raytrace.rs:506-513)."""

import numpy as np

from wavefront_tpu.core import morton


def test_interleave2_known_values():
    # the reference's inline test vectors (raytrace.rs:506-513)
    assert int(morton.interleave_bits_2(0, 0)) == 0
    assert int(morton.interleave_bits_2(0xFFFF, 0xFFFF)) == 0xFFFFFFFF
    assert int(morton.interleave_bits_2(1, 0)) == 1
    assert int(morton.interleave_bits_2(0, 1)) == 2
    assert int(morton.interleave_bits_2(1, 1)) == 3


def test_interleave2_roundtrip():
    rs = np.random.RandomState(0)
    i = rs.randint(0, 2**16, size=256).astype(np.uint32)
    j = rs.randint(0, 2**16, size=256).astype(np.uint32)
    z = morton.interleave_bits_2(i, j)
    i2, j2 = morton.deinterleave_bits_2(z)
    np.testing.assert_array_equal(np.asarray(i2), i)
    np.testing.assert_array_equal(np.asarray(j2), j)


def test_interleave3_bit_pattern():
    # single set bit lands at position 3k(+offset)
    assert int(morton.interleave_bits_3(1, 0, 0)) == 0b100
    assert int(morton.interleave_bits_3(0, 1, 0)) == 0b010
    assert int(morton.interleave_bits_3(0, 0, 1)) == 0b001
    assert int(morton.interleave_bits_3(2, 0, 0)) == 0b100000
    assert int(morton.interleave_bits_3(1023, 1023, 1023)) == (1 << 30) - 1


def test_discretize_domain():
    p = np.array([[-50.0, 0.0, 50.0], [-60.0, 60.0, 0.0]], dtype=np.float32)
    ijk = np.asarray(morton.discretize_position(p))
    assert ijk[0, 0] == 0
    assert ijk[0, 1] == 511
    assert ijk[0, 2] == 1023
    # out-of-domain clamps
    assert ijk[1, 0] == 0 and ijk[1, 1] == 1023


def test_morton_locality():
    # nearby points share a longer common high-bit prefix than far points
    def prefix_len(x, y):
        d = int(x) ^ int(y)
        return 30 - d.bit_length()

    a = morton.morton_key_3d(np.array([10.0, 10.0, 10.0], np.float32))
    b = morton.morton_key_3d(np.array([10.05, 10.05, 10.05], np.float32))
    c = morton.morton_key_3d(np.array([40.0, -40.0, 40.0], np.float32))
    assert prefix_len(a, b) > prefix_len(a, c)
