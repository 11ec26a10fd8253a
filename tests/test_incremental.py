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


def test_update_object_incremental_matches_scratch(registry):
    """Moving an entity with live device arrays must not rebuild the
    grid/winpack (the app's per-frame kinematic ego path) and must match a
    scratch-built scene at the new pose — including the light set when the
    entity is emissive."""
    from wavefront_tpu.world import meshes
    from wavefront_tpu.world.game_world import translation

    grid = np.full((16, 16, 16), registry.air, np.uint8)
    grid[:, :4, :] = registry.block_idx("stone")
    verts, uv, tex = meshes.unitcube()
    lamp = registry.block_idx("lamp")
    lverts, luv, ltex = meshes.cuboid((4.0, 8.0, 4.0), (1.0, 1.0, 1.0),
                                      tex_offset=lamp * 6)

    def fresh(iso):
        s = VoxelScene(registry, grid.copy(), (0, 0, 0), max_light_prims=64)
        s.add_object("cube", verts, uv, tex, transform=iso)
        s.add_object("glow", lverts, luv, ltex)
        return s.get_arrays()

    iso0 = translation(4.0, 6.0, 4.0)[:3]
    iso1 = translation(7.0, 9.0, 5.0)[:3]
    scene = VoxelScene(registry, grid.copy(), (0, 0, 0), max_light_prims=64)
    scene.add_object("cube", verts, uv, tex, transform=iso0)
    scene.add_object("glow", lverts, luv, ltex)
    a0 = scene.get_arrays()

    # non-emissive move: pool follows, grid/aux/winpack/lights untouched
    scene.update_object("cube", iso1)
    a1 = scene.get_arrays()
    assert a1.grid is a0.grid and a1.winpack is a0.winpack
    assert a1.lights is a0.lights
    want = fresh(iso1)
    np.testing.assert_allclose(np.asarray(a1.tri_verts),
                               np.asarray(want.tri_verts), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a1.tri_active),
                                  np.asarray(want.tri_active))

    # emissive move: the light set must follow the entity
    iso_g = translation(2.0, 10.0, 2.0)[:3]
    scene.update_object("glow", iso_g)
    a2 = scene.get_arrays()
    assert a2.grid is a0.grid and a2.winpack is a0.winpack

    def fresh_glow(iso):
        s = VoxelScene(registry, grid.copy(), (0, 0, 0), max_light_prims=64)
        s.add_object("cube", verts, uv, tex, transform=iso1)
        s.add_object("glow", lverts, luv, ltex, transform=iso)
        return s.get_arrays()

    want2 = fresh_glow(iso_g)
    p = int(want2.lights.num_prims)
    assert int(a2.lights.num_prims) == p
    np.testing.assert_allclose(np.asarray(a2.lights.p0[:p]),
                               np.asarray(want2.lights.p0[:p]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2.tri_verts),
                               np.asarray(want2.tri_verts), atol=1e-6)


def _fresh_window_scene(registry, world, window, center):
    """From-scratch window build at `center` (ground truth for shifts)."""
    from wavefront_tpu.world.worldgen import WorldGenerator

    gen = WorldGenerator(world, registry)
    cs = world.chunk_size
    wx, wy, wz = window
    grid = np.zeros(((2*wx+1)*cs, (2*wy+1)*cs, (2*wz+1)*cs), np.uint8)
    for dx in range(-wx, wx+1):
        for dy in range(-wy, wy+1):
            for dz in range(-wz, wz+1):
                key = (center[0]+dx, center[1]+dy, center[2]+dz)
                grid[(dx+wx)*cs:(dx+wx+1)*cs,
                     (dy+wy)*cs:(dy+wy+1)*cs,
                     (dz+wz)*cs:(dz+wz+1)*cs] = gen.generate_chunk(key)
    origin = ((center[0]-wx)*cs, (center[1]-wy)*cs, (center[2]-wz)*cs)
    return grid, origin


def test_incremental_window_shift_matches_full_rebuild(registry):
    """Recentering the streamed window must produce bit-identical grid and
    aux (host AND device) to a from-scratch build at the new center —
    including the distance field near the seams (VERDICT round 1, next #6:
    incremental _rebuild_window)."""
    from wavefront_tpu.core.config import WorldSettings
    from wavefront_tpu.world.chunk_manager import ChunkManager

    world = WorldSettings(chunk_size=8, load_radius=2, evict_radius=3)
    window = (2, 1, 2)
    scene = VoxelScene(
        registry,
        np.zeros((5*8, 3*8, 5*8), np.uint8),
        (-16, -8, -16),
        max_light_prims=256,
    )
    cm = ChunkManager(world, registry, scene, window_chunks=window,
                      synchronous=True)

    class _Data:
        pass

    def step(center):
        from wavefront_tpu.world.game_world import UpdateData

        if center != cm.center_chunk:
            cm.center_chunk = center
            cm._window_dirty = True
        for key in cm._window_keys(center):
            cm._request_chunk(key)
        cm._evict()
        if cm._window_dirty:
            cm._rebuild_window()

    step((0, 0, 0))
    arrays0 = scene.get_arrays()  # device arrays live
    # shift by (+1, 0, -1) chunks and also through a multi-step path
    for center in [(1, 0, 0), (1, 0, -1), (2, 0, -1)]:
        step(center)
        got_arrays = scene.get_arrays()
        want_grid, want_origin = _fresh_window_scene(
            registry, world, window, center
        )
        want_aux = make_aux_grid(
            want_grid, scene._transparent, scene._translucent
        )
        np.testing.assert_array_equal(scene.grid, want_grid)
        np.testing.assert_array_equal(scene._aux, want_aux)
        np.testing.assert_array_equal(np.asarray(got_arrays.grid), want_grid)
        np.testing.assert_array_equal(
            np.asarray(got_arrays.aux_grid), want_aux
        )
        assert tuple(np.asarray(got_arrays.grid_origin)) == want_origin
        # the window pack tracks the recentered window too (per-window
        # device content == scratch build; reshift path when the shift is
        # window-aligned, rebuild fallback otherwise)
        from wavefront_tpu.kernels.window_trace import build_window_pack

        want_pack = build_window_pack(
            want_grid, scene._transparent, scene._translucent
        )
        got_pack = got_arrays.winpack
        wm_g = np.asarray(got_pack.wmap)
        wm_w = np.asarray(want_pack.wmap)
        np.testing.assert_array_equal(
            np.asarray(got_pack.tw, np.float32)[wm_g],
            np.asarray(want_pack.tw, np.float32)[wm_w],
        )
        np.testing.assert_array_equal(
            np.asarray(got_pack.wdist), np.asarray(want_pack.wdist)
        )


def test_reference_scale_window_from_load_radius(registry):
    """window_chunks=None derives the device window from
    WorldSettings.load_radius (13 x 3 x 13 chunks at the reference's
    radius 6, chunk_manager.rs:29-37); the whole pipeline renders on it."""
    from wavefront_tpu.core.config import RenderSettings, WorldSettings
    from wavefront_tpu.world.game_world import GameWorld

    world = GameWorld(
        registry,
        settings=RenderSettings(width=16, height=16, num_bounces=1,
                                max_trace_steps=48),
        world_settings=WorldSettings(chunk_size=8, load_radius=6,
                                     evict_radius=8),
        window_chunks=None,
        headless=False,
    )
    world.managers[0].synchronous = True
    world.step()
    assert world.scene.grid.shape == (13 * 8, 3 * 8, 13 * 8)
    assert len(world.managers[0].chunks) == 13 * 3 * 13
    assert world.last_image is not None
    assert np.all(np.isfinite(world.last_image))
