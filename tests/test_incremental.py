"""Incremental scene updates (BASELINE config 4: per-frame block edits)."""

import numpy as np
import pytest

from wavefront_tpu.render.intersect import make_aux_grid, update_aux_region
from wavefront_tpu.render.scene import VoxelScene
from wavefront_tpu.world.blocks import BlockRegistry

ASSETS = "assets"


@pytest.fixture(scope="module")
def registry():
    return BlockRegistry.load(ASSETS)


def tables(registry):
    nb = registry.num_blocks
    transp = np.zeros(256, bool)
    transl = np.zeros(256, bool)
    transp[: nb + 1] = registry.transparent
    transl[: nb + 1] = registry.translucent
    transp[nb + 1:] = True
    transl[nb + 1:] = True
    return transp, transl


@pytest.mark.parametrize("seed", [0, 1])
def test_update_aux_region_matches_full_rebuild(registry, seed):
    transp, transl = tables(registry)
    rs = np.random.RandomState(seed)
    grid = np.full((24, 24, 24), registry.air, np.uint8)
    m = rs.rand(*grid.shape) < 0.05
    grid[m] = registry.block_idx("stone")
    aux = make_aux_grid(grid, transp, transl)

    for _ in range(4):
        p = rs.randint(0, 24, 3)
        new_block = rs.choice(
            [registry.air, registry.block_idx("stone"), registry.block_idx("glass")]
        )
        grid = grid.copy()
        grid[tuple(p)] = new_block
        aux = update_aux_region(grid, aux, transp, transl, p)
        want = make_aux_grid(grid, transp, transl)
        np.testing.assert_array_equal(aux, want)


def test_scene_set_block_keeps_device_arrays_in_sync(registry):
    grid = np.full((16, 16, 16), registry.air, np.uint8)
    grid[:, :4, :] = registry.block_idx("stone")
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=64)
    a0 = scene.get_arrays()

    # non-emissive edit: surgical update, same array objects except grid/aux
    scene.set_block((8, 8, 8), registry.block_idx("glass"))
    a1 = scene.get_arrays()
    assert a1 is not None
    assert int(np.asarray(a1.grid[8, 8, 8])) == registry.block_idx("glass")
    transp, transl = tables(registry)
    want_aux = make_aux_grid(np.asarray(a1.grid), transp, transl)
    np.testing.assert_array_equal(np.asarray(a1.aux_grid), want_aux)
    # lights untouched by a glass edit
    assert a1.lights is a0.lights

    # emissive edit: forces a light rebuild
    scene.set_block((8, 10, 8), registry.block_idx("lamp"))
    a2 = scene.get_arrays()
    assert int(a2.lights.num_prims) > int(a0.lights.num_prims)
