"""Column-bitmask acceleration tables (render/columns.py)."""

import numpy as np
import pytest

from wavefront_tpu.render.columns import (
    CELL_X,
    CELL_Y,
    CELL_Z,
    MAX_CELL_SKIP,
    build_tables,
)
from wavefront_tpu.world.blocks import BlockRegistry

ASSETS = "assets"


@pytest.fixture(scope="module")
def registry():
    return BlockRegistry.load(ASSETS)


def tables_for(grid, registry):
    nb = registry.num_blocks
    transparent = np.zeros(256, bool)
    translucent = np.zeros(256, bool)
    transparent[: nb + 1] = registry.transparent
    translucent[: nb + 1] = registry.translucent
    transparent[nb + 1:] = True
    translucent[nb + 1:] = True
    return build_tables(grid, transparent, translucent), transparent, translucent


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("shape", [(16, 16, 16), (20, 32, 12), (40, 32, 40)])
def test_tables_match_bruteforce(registry, seed, shape):
    rng = np.random.default_rng(seed)
    grid = np.where(
        rng.random(shape) < 0.15,
        rng.integers(0, registry.num_blocks, shape),
        registry.air,
    ).astype(np.uint8)
    tab, transparent, translucent = tables_for(grid, registry)

    owning = ~transparent[grid]
    cls = transparent[grid] * 1 + translucent[grid] * 2

    cw = tab.cell_words.view(np.uint32).reshape(tab.cx, tab.cy, tab.cz)
    sw = tab.slab_words.view(np.uint32).reshape(tab.cx, tab.cz, tab.gy_pad)
    gx, gy, gz = shape
    for cx in range(tab.cx):
        for cy in range(tab.cy):
            for cz in range(tab.cz):
                for b in range(CELL_Y):
                    y = cy * CELL_Y + b
                    box = owning[
                        cx * CELL_X : (cx + 1) * CELL_X,
                        y : y + 1,
                        cz * CELL_Z : (cz + 1) * CELL_Z,
                    ]
                    want = bool(box.any()) if y < gy else False
                    got = bool((int(cw[cx, cy, cz]) >> b) & 1)
                    assert got == want, (cx, cy, cz, b)
    # slab words: per-voxel class at packed bit position
    for _ in range(200):
        x = rng.integers(0, gx)
        y = rng.integers(0, gy)
        z = rng.integers(0, gz)
        word = int(sw[x // CELL_X, z // CELL_Z, y])
        got = (word >> (2 * ((x % CELL_X) * CELL_Z + (z % CELL_Z)))) & 3
        assert got == int(cls[x, y, z]), (x, y, z)
    # padding voxels read as air (class 3)
    if tab.gy_pad > gy:
        word = int(sw[0, 0, gy])
        assert word == 0xFFFFFFFF

    # distance field: chebyshev distance to nearest occupied cell
    occ = np.asarray(cw) != 0
    cd = tab.cell_dist.reshape(tab.cx, tab.cy, tab.cz)
    idx = np.argwhere(occ)
    for cx in range(tab.cx):
        for cy in range(tab.cy):
            for cz in range(tab.cz):
                if len(idx) == 0:
                    want = MAX_CELL_SKIP
                else:
                    d = np.abs(idx - np.array([cx, cy, cz])).max(axis=1).min()
                    want = min(int(d), MAX_CELL_SKIP)
                assert cd[cx, cy, cz] == want, (cx, cy, cz)
