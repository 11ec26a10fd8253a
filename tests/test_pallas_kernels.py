"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

from wavefront_tpu.kernels.tri_sweep_pallas import triangle_sweep_pallas
from wavefront_tpu.render.intersect import triangle_sweep


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_triangle_sweep_matches_xla(seed):
    rs = np.random.RandomState(seed)
    t, n = 32, 1536
    tris = rs.uniform(-5, 5, (t, 3, 3)).astype(np.float32)
    act = rs.rand(t) > 0.2
    o = rs.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # a few terminal rays
    d[:5] = 0.0

    a = triangle_sweep(tris, act, o, d)
    b = triangle_sweep_pallas(tris, act, o, d, interpret=True, block=512)

    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    h = np.asarray(a.hit)
    np.testing.assert_allclose(
        np.asarray(a.t)[h], np.asarray(b.t)[h], atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(a.tri)[h], np.asarray(b.tri)[h])
    # per-component vs broadcast evaluation order differs -> fp tolerance
    np.testing.assert_allclose(
        np.asarray(a.bary_u)[h], np.asarray(b.bary_u)[h], atol=1e-4
    )


def test_pallas_sweep_nonmultiple_block_padding():
    rs = np.random.RandomState(2)
    tris = rs.uniform(-3, 3, (4, 3, 3)).astype(np.float32)
    act = np.ones(4, bool)
    n = 1000  # not a multiple of the block
    o = rs.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    a = triangle_sweep(tris, act, o, d)
    b = triangle_sweep_pallas(tris, act, o, d, interpret=True, block=256)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
