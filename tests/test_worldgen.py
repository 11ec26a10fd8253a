"""Worldgen + block registry tests (reference chunk.rs:55-110, block.rs)."""

import numpy as np
import pytest

from wavefront_tpu.core.config import WorldSettings
from wavefront_tpu.world.blocks import BlockRegistry
from wavefront_tpu.world.chunk import floor_coords, global_to_chunk_coords
from wavefront_tpu.world.worldgen import GradientNoise3, WorldGenerator

ASSETS = "assets"


@pytest.fixture(scope="module")
def registry():
    return BlockRegistry.load(ASSETS)


def test_registry_block_order(registry):
    # sorted-name (BTreeMap) order with trailing implicit air (block.rs:84,107)
    assert registry.names == sorted(registry.names)
    assert registry.air == len(registry.names)
    assert registry.block_idx("air") == registry.air


def test_registry_flags(registry):
    assert registry.transparent[registry.air]
    assert registry.translucent[registry.air]
    assert not registry.solid[registry.air]
    assert registry.translucent[registry.block_idx("glass")]
    assert registry.luminescent[registry.block_idx("lamp")]
    assert not registry.translucent[registry.block_idx("stone")]


def test_registry_luminance_only_lamp(registry):
    lum = registry.luminance.reshape(-1, 6)
    for bi, name in enumerate(registry.names):
        if name == "lamp":
            assert np.all(lum[bi] > 0)
        else:
            assert np.all(lum[bi] == 0)


def test_noise_deterministic_and_smooth():
    n1 = GradientNoise3(0)
    n2 = GradientNoise3(0)
    n3 = GradientNoise3(1)
    xs = np.linspace(-10, 10, 100)
    a = n1.sample(xs, xs * 0.5, xs * 0.25)
    b = n2.sample(xs, xs * 0.5, xs * 0.25)
    c = n3.sample(xs, xs * 0.5, xs * 0.25)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert np.max(np.abs(a)) <= 1.5
    # smooth: small steps give small deltas
    fine = n1.sample(np.linspace(0, 1, 1000), 0.3, 0.7)
    assert np.max(np.abs(np.diff(fine))) < 0.05


def test_generate_chunk_center_lamp(registry):
    gen = WorldGenerator(WorldSettings(), registry)
    blocks = gen.generate_chunk((0, 0, 0))
    assert blocks.shape == (32, 32, 32)
    lamp = registry.block_idx("lamp")
    # |w|<3 region in the (0,0,0) chunk is [0,3)^3 (reference chunk.rs:102-104)
    assert np.all(blocks[:3, :3, :3] == lamp)
    assert not np.any(blocks[3:, :, :] == lamp)
    # chunk without the lamp region has no lamps
    far = gen.generate_chunk((5, 0, 5))
    assert not np.any(far == lamp)


def test_generate_chunk_stone_under_grass(registry):
    gen = WorldGenerator(WorldSettings(central_lamp=False), registry)
    blocks = gen.generate_chunk((0, 0, 0))
    grass, stone, air = (
        registry.block_idx("grass"),
        registry.block_idx("stone"),
        registry.air,
    )
    vals = set(np.unique(blocks).tolist())
    assert vals <= {grass, stone, air}
    # grass only where the voxel above (in y) is non-solid: check internal
    # consistency on the interior
    g = blocks[:, :-1, :] == grass
    above = blocks[:, 1:, :]
    assert np.all(above[g] == air)


def test_coord_helpers():
    np.testing.assert_array_equal(floor_coords([1.9, -0.1, -32.5]), [1, -1, -33])
    c, b = global_to_chunk_coords([-1, 33, 0])
    np.testing.assert_array_equal(c, [-1, 1, 0])
    np.testing.assert_array_equal(b, [31, 1, 0])
