"""Fuzz parity: random scenes, cameras and settings vs the oracle."""

import numpy as np
import pytest

from wavefront_tpu.core.camera import SphericalCamera
from wavefront_tpu.core.config import RenderingPreferences, RenderSettings
from wavefront_tpu.render import lights as lights_mod
from wavefront_tpu.render.oracle import OracleRenderer
from wavefront_tpu.render.renderer import Renderer
from wavefront_tpu.render.scene import VoxelScene
from wavefront_tpu.world.blocks import BlockRegistry

ASSETS = "assets"


@pytest.fixture(scope="module")
def registry():
    return BlockRegistry.load(ASSETS)


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_fuzz_random_scene_matches_oracle(registry, seed):
    rs = np.random.RandomState(seed)
    size = 12
    grid = np.full((size, size, size), registry.air, np.uint8)
    density = rs.uniform(0.05, 0.25)
    mask = rs.rand(size, size, size) < density
    ids = rs.choice(
        [registry.block_idx(n) for n in
         ("stone", "grass", "glass", "mirror", "lamp", "soil")],
        size=mask.sum(),
    )
    grid[mask] = ids

    cam = SphericalCamera()
    cam.set_root_position(rs.uniform(2, 10, 3))
    cam.offset = rs.uniform(6, 18)
    cam.yaw = rs.uniform(0, 6.28)
    cam.pitch = rs.uniform(-1.2, 1.2)
    basis = cam.eye_front_right_up()

    nee = int(rs.randint(0, 3))
    bounces = int(rs.randint(1, 4))
    settings = RenderSettings(
        width=20, height=20, num_bounces=bounces, max_trace_steps=64
    )
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=512)
    got = Renderer(settings).render(
        scene, basis, RenderingPreferences(nee_type=nee), frame_count=seed
    )
    assert np.all(np.isfinite(got))

    ls = lights_mod.build_from_grid(grid, np.zeros(3), registry, 512)
    want = OracleRenderer(settings, registry, grid, (0, 0, 0), ls).render(
        basis.eye, basis.front, basis.right, basis.up,
        frame_count=seed, nee_type=nee,
    )
    diff = np.abs(got - want).max(axis=-1)
    agree = diff < 1e-3
    # random scenes have many glancing silhouettes; allow a few divergent px
    assert (1.0 - agree.mean()) < 0.03, f"{(~agree).mean():.2%} divergent"
    rmse = float(np.sqrt(np.mean((got[agree] - want[agree]) ** 2)))
    assert rmse < 1e-3
