"""Aux-grid (distance-field) DDA: skipping must not change any hit."""

import numpy as np
import pytest

from wavefront_tpu.render.intersect import (
    CLASS_TRANSPARENT,
    CLASS_TRANSLUCENT,
    dda_trace,
    make_aux_grid,
)

AIR = 7
GLASS = 1
STONE = 2

TRANSPARENT = np.zeros(256, bool)
TRANSPARENT[AIR] = True
TRANSLUCENT = np.zeros(256, bool)
TRANSLUCENT[AIR] = True
TRANSLUCENT[GLASS] = True


def test_aux_grid_distances():
    grid = np.full((9, 9, 9), AIR, np.uint8)
    grid[4, 4, 4] = STONE
    aux = make_aux_grid(grid, TRANSPARENT, TRANSLUCENT)
    dist = aux >> 2
    cls = aux & 3
    assert dist[4, 4, 4] == 0
    assert dist[4, 4, 5] == 1
    assert dist[5, 5, 5] == 1  # chebyshev
    assert dist[4, 4, 6] == 2
    assert dist[0, 0, 0] == 4
    assert cls[4, 4, 4] == 0  # solid: neither transparent nor translucent
    assert cls[0, 0, 0] == (CLASS_TRANSPARENT | CLASS_TRANSLUCENT)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_skipping_matches_plain_dda(seed):
    rs = np.random.RandomState(seed)
    grid = np.full((16, 16, 16), AIR, np.uint8)
    mask = rs.rand(16, 16, 16) < 0.03
    grid[mask] = rs.choice([GLASS, STONE], size=mask.sum())
    aux = make_aux_grid(grid, TRANSPARENT, TRANSLUCENT)

    n = 256
    origin = rs.uniform(-8, 24, size=(n, 3)).astype(np.float32)
    direction = rs.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)

    plain = dda_trace(
        grid, np.zeros(3, np.int32), TRANSPARENT, TRANSLUCENT, AIR,
        origin, direction, max_steps=128,
    )
    skip = dda_trace(
        grid, np.zeros(3, np.int32), TRANSPARENT, TRANSLUCENT, AIR,
        origin, direction, max_steps=128, aux_grid=aux,
    )
    np.testing.assert_array_equal(np.asarray(plain.hit), np.asarray(skip.hit))
    hits = np.asarray(plain.hit)
    np.testing.assert_allclose(
        np.asarray(plain.t)[hits], np.asarray(skip.t)[hits], atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(plain.owner)[hits], np.asarray(skip.owner)[hits]
    )
    np.testing.assert_array_equal(
        np.asarray(plain.face)[hits], np.asarray(skip.face)[hits]
    )
    np.testing.assert_array_equal(
        np.asarray(plain.vx)[hits], np.asarray(skip.vx)[hits]
    )


def test_skipping_long_empty_run():
    # a ray crossing 60 empty voxels to a wall: plain DDA needs ~60 steps,
    # the distance field must reach the wall in far fewer iterations
    grid = np.full((64, 8, 8), AIR, np.uint8)
    grid[60, :, :] = STONE
    aux = make_aux_grid(grid, TRANSPARENT, TRANSLUCENT)
    o = np.array([[0.5, 4.5, 4.5]], np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    # max_steps=24 is insufficient for plain stepping but plenty with skips
    hit = dda_trace(
        grid, np.zeros(3, np.int32), TRANSPARENT, TRANSLUCENT, AIR,
        o, d, max_steps=24, aux_grid=aux,
    )
    assert bool(np.asarray(hit.hit)[0])
    assert np.asarray(hit.t)[0] == pytest.approx(59.5, abs=1e-3)
    assert int(np.asarray(hit.vx)[0]) == 60
