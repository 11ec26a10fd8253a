"""Auxiliary subsystems: persistence, temporal accumulation, profiling,
screenshots (SURVEY.md section 5)."""

import os

import numpy as np
import pytest

from wavefront_tpu.core.config import RenderSettings, WorldSettings
from wavefront_tpu.render.accumulate import TemporalAccumulator
from wavefront_tpu.render.screenshot import next_screenshot_path, save_png, to_srgb_bytes
from wavefront_tpu.utils.persistence import load_world, save_world
from wavefront_tpu.utils.profiling import FrameTimer, StageTimer
from wavefront_tpu.world.blocks import BlockRegistry
from wavefront_tpu.world.game_world import WorldSetBlock

ASSETS = "assets"


@pytest.fixture(scope="module")
def registry():
    return BlockRegistry.load(ASSETS)


def make_world(registry):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_game import make_world as mk

    return mk(registry)


def test_persistence_roundtrip(tmp_path, registry):
    world = make_world(registry)
    world.step()
    stone = registry.block_idx("stone")
    world.changes_since_last_step.append(WorldSetBlock(np.array([5, 5, 5]), stone))
    world.step()
    world.camera.yaw = 1.23
    path = str(tmp_path / "save.npz")
    save_world(world, path)

    world2 = make_world(registry)
    load_world(world2, path)
    world2.step()
    assert world2.chunk_querier.get_block(np.array([5, 5, 5])) == stone
    assert world2.scene.get_block((5, 5, 5)) == stone
    assert world2.camera.yaw == pytest.approx(1.23)
    assert 0 in world2.entities
    assert world2.entities[0].physics_data is not None


def test_edited_chunks_survive_eviction(registry):
    world = make_world(registry)
    world.step()
    cm = world.managers[0]
    stone = registry.block_idx("stone")
    cm.set_block(np.array([5, 5, 5]), stone)
    # recenter far away -> unedited chunks evicted, edited chunk kept
    cm.center_chunk = (50, 0, 0)
    cm._evict()
    assert (0, 0, 0) in cm.chunks
    assert cm.chunks[(0, 0, 0)][5, 5, 5] == stone


def test_temporal_accumulator_mean_and_reset():
    acc = TemporalAccumulator()
    a = np.full((4, 4, 3), 1.0, np.float32)
    b = np.full((4, 4, 3), 3.0, np.float32)
    acc.add(a, key="pose1")
    out = np.asarray(acc.add(b, key="pose1"))
    np.testing.assert_allclose(out, 2.0, rtol=1e-6)
    assert acc.samples == 2
    out = np.asarray(acc.add(b, key="pose2"))  # camera moved -> reset
    np.testing.assert_allclose(out, 3.0)
    assert acc.samples == 1


def test_frame_timer_metrics():
    t = FrameTimer(rays_per_frame=1000)
    for _ in range(3):
        with t.frame():
            pass
    s = t.stats
    assert s.frame_ms >= 0
    assert s.fps > 0
    assert s.mrays_per_sec > 0


def test_stage_timer():
    st = StageTimer()
    with st.stage("gen"):
        pass
    with st.stage("gen"):
        pass
    assert "gen" in st.summary()


def test_screenshot_numbering(tmp_path):
    d = str(tmp_path / "shots")
    p0 = next_screenshot_path(d)
    assert p0.endswith("0.png")
    save_png(p0, np.zeros((4, 4, 3), np.float32))
    p1 = next_screenshot_path(d)
    assert p1.endswith("1.png")
    # clamp + quantize
    img = np.array([[[2.0, -1.0, 0.5]]], np.float32)
    b = to_srgb_bytes(img)
    assert tuple(b[0, 0]) == (255, 0, 128)


def test_validation_layer_and_check_image():
    from wavefront_tpu.utils.validation import check_image, validation_layer

    check_image(np.zeros((4, 4, 3), np.float32))
    with pytest.raises(FloatingPointError):
        check_image(np.full((2, 2, 3), np.nan, np.float32))
    with pytest.raises(ValueError):
        check_image(np.zeros((2, 2), np.float32))

    import jax.numpy as jnp

    with validation_layer(nan_checks=False, interpret=True):
        # runs un-jitted inside the context
        assert float(jnp.add(1.0, 2.0)) == 3.0
