"""On-device frame batching (renderer.render_frame_batch).

k frames rendered inside one compiled program (dispatch amortization,
the TPU analog of the reference's frames-in-flight pipelining,
interactive_rendering.rs:618-648,1604-1658) must be bit-identical to k
successive single-frame renders — same seeds, same RNG draw order, same
primary-cache semantics.
"""

import numpy as np
import pytest

from wavefront_tpu.core.camera import SphericalCamera
from wavefront_tpu.core.config import RenderSettings, RenderingPreferences
from wavefront_tpu.render.renderer import Renderer
from wavefront_tpu.render.scene import VoxelScene
from wavefront_tpu.world.blocks import BlockRegistry


@pytest.fixture(scope="module")
def scene_and_cam():
    import os

    registry = BlockRegistry.load(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")
    )
    rng = np.random.default_rng(5)
    grid = np.zeros((24, 16, 24), np.uint8)
    h = (3 + 3 * rng.random((24, 24))).astype(int)
    for x in range(24):
        for z in range(24):
            grid[x, : h[x, z], z] = 3
    grid[12, 6, 12] = 4                      # lamp
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=64)
    cam = SphericalCamera(root_pos=np.array([12.0, 5.0, 12.0]))
    cam.offset = 14.0
    cam.yaw = 0.8
    cam.pitch = -0.5
    return scene, cam.eye_front_right_up()


def _settings(**kw):
    return RenderSettings(width=24, height=20, num_bounces=2,
                          max_trace_steps=64, **kw)


def test_batch_matches_singles(scene_and_cam):
    scene, basis = scene_and_cam
    prefs = RenderingPreferences(nee_type=1)
    r = Renderer(_settings())
    singles = np.stack(
        [r.render(scene, basis, prefs, frame_count=7 + i) for i in range(3)]
    )
    batch = Renderer(_settings()).render_batch(
        scene, basis, prefs, frame_count=7, k=3
    )
    np.testing.assert_array_equal(batch, singles)


def test_batch_accumulate_mean(scene_and_cam):
    scene, basis = scene_and_cam
    prefs = RenderingPreferences(nee_type=1)
    r = Renderer(_settings())
    singles = np.stack(
        [r.render(scene, basis, prefs, frame_count=i) for i in range(4)]
    )
    mean = Renderer(_settings()).render_batch(
        scene, basis, prefs, frame_count=0, k=4, accumulate=True
    )
    np.testing.assert_allclose(mean, singles.mean(axis=0), atol=2e-6)


def test_batch_with_primary_cache(scene_and_cam):
    """cache_primary: frame 0 computes the cache in-program, frames 1..k-1
    reuse it; a second batch at the same pose reuses it across batches."""
    scene, basis = scene_and_cam
    prefs = RenderingPreferences(nee_type=1)
    r_single = Renderer(_settings(cache_primary=True))
    singles = np.stack(
        [r_single.render(scene, basis, prefs, frame_count=i)
         for i in range(3)]
    )
    rb = Renderer(_settings(cache_primary=True))
    batch = rb.render_batch(scene, basis, prefs, frame_count=0, k=3)
    np.testing.assert_array_equal(batch, singles)
    assert rb._primary is not None
    # second batch reuses the host-held cache (different jit variant)
    batch2 = rb.render_batch(scene, basis, prefs, frame_count=3, k=2)
    singles2 = np.stack(
        [r_single.render(scene, basis, prefs, frame_count=3 + i)
         for i in range(2)]
    )
    np.testing.assert_array_equal(batch2, singles2)


def test_batch_sorted_compacted(scene_and_cam):
    """Batch parity holds with the sort + compaction machinery on."""
    scene, basis = scene_and_cam
    prefs = RenderingPreferences(nee_type=1, sort_type=1)
    s = _settings(compaction=True)
    singles = np.stack(
        [Renderer(s).render(scene, basis, prefs, frame_count=2 + i)
         for i in range(2)]
    )
    batch = Renderer(s).render_batch(
        scene, basis, prefs, frame_count=2, k=2
    )
    np.testing.assert_array_equal(batch, singles)


def test_bf16_shade_quality(scene_and_cam):
    """shade_bf16 runs the color pipeline in bfloat16 (2x VPU lanes) with
    f32 radiance accumulation; relative RMSE vs the f32 pipeline stays
    under 1% (golden configs keep the flag off — default-off means the
    f32 path is bit-untouched)."""
    scene, basis = scene_and_cam
    prefs = RenderingPreferences(nee_type=1)
    f32 = Renderer(_settings()).render(scene, basis, prefs, frame_count=1)
    b16 = Renderer(_settings(shade_bf16=True)).render(
        scene, basis, prefs, frame_count=1
    )
    assert np.all(np.isfinite(b16))
    rmse = float(np.sqrt(np.mean((f32 - b16) ** 2)))
    rel = rmse / max(float(np.sqrt(np.mean(f32 ** 2))), 1e-9)
    assert rel < 0.01, rel


def test_hoisted_presort_parity(scene_and_cam):
    """With compaction/sort on and the windowed tracer active, the bounce
    sort uses the tracer's coherence key and the kernel's internal
    presort + inverse restore are elided — images must be identical to
    the internal-presort path (per-ray outputs are order-independent)."""
    scene, basis = scene_and_cam
    prefs = RenderingPreferences(nee_type=1, sort_type=1)
    base = _settings(use_column_trace=True, compaction=True)
    hoisted = Renderer(base).render(scene, basis, prefs, frame_count=3)
    # forcing phases=2 keeps the internal presort (hoist disabled) but
    # traces identically (phased resume is exact)
    import dataclasses

    internal = Renderer(
        dataclasses.replace(base, trace_phases=2, trace_phase_events=512)
    ).render(scene, basis, prefs, frame_count=3)
    np.testing.assert_allclose(hoisted, internal, atol=1e-5)


def test_phase_schedule_parity(scene_and_cam):
    """trace_phases_at=(1,) runs bounce 1 phased (unrolled outside the
    bounce scan) and every other bounce single-shot; phased resume is
    exact, so the image must match the all-single-shot render."""
    scene, basis = scene_and_cam
    prefs = RenderingPreferences(nee_type=1)
    base = _settings(use_column_trace=True, compaction=True)
    import dataclasses

    plain = Renderer(base).render(scene, basis, prefs, frame_count=3)
    sched = Renderer(
        dataclasses.replace(
            base, trace_phases=2, trace_phase_events=16,
            trace_phases_at=(1,),
        )
    ).render(scene, basis, prefs, frame_count=3)
    np.testing.assert_allclose(sched, plain, atol=1e-5)


def test_windows_hot_parity(scene_and_cam):
    """trace_windows_hot widens resident-window count on the SCHEDULED
    bounces only; multi-residency is an occupancy optimization (partial
    extraction products sum exactly), so the image must match windows=1."""
    scene, basis = scene_and_cam
    prefs = RenderingPreferences(nee_type=1)
    base = _settings(use_column_trace=True, compaction=True)
    import dataclasses

    plain = Renderer(base).render(scene, basis, prefs, frame_count=3)
    hot = Renderer(
        dataclasses.replace(
            base, trace_phases=2, trace_phase_events=16,
            trace_phases_at=(1,), trace_windows_hot=3,
            trace_skip_stride=2, trace_unroll=2,
        )
    ).render(scene, basis, prefs, frame_count=3)
    np.testing.assert_allclose(hot, plain, atol=1e-5)
