"""Golden-image parity: device renderer vs the scalar NumPy oracle.

The BASELINE config-1 gate (BASELINE.md): small voxel scene, static camera,
low bounce count, device image must pixel-match the oracle.  Both paths share
the murmur3 draw order, so images agree except where f32/f64 rounding flips
a geometric branch on a handful of silhouette pixels; the gate is therefore
"RMSE over agreeing pixels < 1e-3 and divergent pixels < 0.5%".
"""

import numpy as np
import pytest

from wavefront_tpu.core.camera import SphericalCamera
from wavefront_tpu.core.config import RenderingPreferences, RenderSettings, WorldSettings
from wavefront_tpu.render import lights as lights_mod
from wavefront_tpu.render.oracle import OracleRenderer
from wavefront_tpu.render.renderer import Renderer
from wavefront_tpu.render.scene import VoxelScene
from wavefront_tpu.world.blocks import BlockRegistry
from wavefront_tpu.world.worldgen import WorldGenerator

ASSETS = "assets"


@pytest.fixture(scope="module")
def registry():
    return BlockRegistry.load(ASSETS)


def make_grid(registry, size=16):
    """Deterministic 16^3 test scene: terrain slab + lamp + glass + mirror."""
    air = registry.air
    grid = np.full((size, size, size), air, np.uint8)
    grid[:, :4, :] = registry.block_idx("stone")
    grid[:, 4, :] = registry.block_idx("grass")
    grid[6:9, 5:8, 6:9] = registry.block_idx("lamp")
    grid[2, 5:7, 3] = registry.block_idx("mirror")
    grid[12, 5:7, 12] = registry.block_idx("glass")
    return grid


def camera_pose():
    cam = SphericalCamera()
    cam.set_root_position([8.0, 8.0, 8.0])
    cam.offset = 14.0
    cam.yaw = 0.7
    cam.pitch = -0.45
    return cam.eye_front_right_up()


def compare(settings, registry, grid, nee_type, frame_count=0):
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=256)
    renderer = Renderer(settings)
    basis = camera_pose()
    prefs = RenderingPreferences(nee_type=nee_type)
    got = renderer.render(scene, basis, prefs, frame_count=frame_count)

    ls = lights_mod.build_from_grid(grid, np.zeros(3), registry, 256)
    oracle = OracleRenderer(settings, registry, grid, (0, 0, 0), ls)
    want = oracle.render(
        basis.eye, basis.front, basis.right, basis.up,
        frame_count=frame_count, nee_type=nee_type,
    )

    assert got.shape == want.shape
    assert np.all(np.isfinite(got)), "device image has NaN/Inf"
    diff = np.abs(got - want).max(axis=-1)
    agree = diff < 1e-3
    frac_divergent = 1.0 - agree.mean()
    rmse = float(np.sqrt(np.mean((got[agree] - want[agree]) ** 2))) if agree.any() else 1e9
    return frac_divergent, rmse, got, want


@pytest.mark.parametrize("nee_type", [0, 1, 2])
def test_golden_config1(registry, nee_type):
    settings = RenderSettings(
        width=48, height=48, num_bounces=2, max_trace_steps=96
    )
    grid = make_grid(registry)
    frac_divergent, rmse, got, want = compare(settings, registry, grid, nee_type)
    assert frac_divergent < 0.005, f"{frac_divergent:.2%} pixels diverge"
    assert rmse < 1e-3, f"RMSE {rmse}"
    # the image should not be trivially empty
    assert got.mean() > 1e-3


def test_golden_deterministic_across_frames(registry):
    settings = RenderSettings(width=32, height=32, num_bounces=2, max_trace_steps=96)
    grid = make_grid(registry)
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=256)
    renderer = Renderer(settings)
    basis = camera_pose()
    a = renderer.render(scene, basis, RenderingPreferences(), frame_count=5)
    b = renderer.render(scene, basis, RenderingPreferences(), frame_count=5)
    c = renderer.render(scene, basis, RenderingPreferences(), frame_count=6)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)  # seed advances with the frame counter


def test_golden_with_entity_mesh(registry):
    """Dynamic entity (unit cube) shading must match the oracle: triangle
    tangent frames, uv interpolation and closest-hit merge with the DDA."""
    from wavefront_tpu.render import lights as lights_mod
    from wavefront_tpu.world import meshes

    settings = RenderSettings(width=40, height=40, num_bounces=2, max_trace_steps=96)
    grid = make_grid(registry)
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=256)
    verts, uv, tex = meshes.unitcube()
    # place the cube above the terrain in view
    from wavefront_tpu.world.game_world import translation

    iso = translation(8.0, 6.5, 8.0)
    scene.add_object("cube", verts, uv, tex, transform=iso)

    renderer = Renderer(settings)
    basis = camera_pose()
    got = renderer.render(scene, basis, RenderingPreferences(nee_type=1))

    world_verts = verts + iso[:, 3]
    ls = lights_mod.build_from_grid(grid, np.zeros(3), registry, 256)
    oracle = OracleRenderer(
        settings, registry, grid, (0, 0, 0), ls,
        tri_verts=world_verts, tri_uv=uv, tri_tex=tex,
    )
    want = oracle.render(
        basis.eye, basis.front, basis.right, basis.up, nee_type=1
    )
    diff = np.abs(got - want).max(axis=-1)
    agree = diff < 1e-3
    assert (1.0 - agree.mean()) < 0.01, f"{(~agree).mean():.2%} divergent"
    rmse = float(np.sqrt(np.mean((got[agree] - want[agree]) ** 2)))
    assert rmse < 1e-3


def test_sorted_render_matches_unsorted(registry):
    """sort_type permutes ray processing order but must not change the image
    (the permutation is undone by the pixel-id scatter)."""
    settings = RenderSettings(width=32, height=32, num_bounces=3, max_trace_steps=96)
    grid = make_grid(registry)
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=256)
    renderer = Renderer(settings)
    basis = camera_pose()
    plain = renderer.render(scene, basis, RenderingPreferences(sort_type=0))
    sorted_ = renderer.render(scene, basis, RenderingPreferences(sort_type=1))
    np.testing.assert_allclose(plain, sorted_, atol=1e-5)


def test_supersampling_scale2(registry):
    """scale=2 renders at 2x and box-filters down (postprocess.rs:33-76);
    the oracle path shares the same convention."""
    settings = RenderSettings(
        width=24, height=24, num_bounces=1, scale=2, max_trace_steps=64
    )
    grid = make_grid(registry)
    frac_divergent, rmse, got, want = compare(settings, registry, grid, 0)
    assert got.shape == (24, 24, 3)
    assert frac_divergent < 0.01
    assert rmse < 1e-3


def test_jitter_antialiasing(registry):
    """jitter>0 perturbs rays per frame; same frame deterministic, frames
    differ, and the mean stays close to the unjittered image."""
    base = RenderSettings(width=24, height=24, num_bounces=1, max_trace_steps=64)
    jit = base.replace(jitter=1.0)
    grid = make_grid(registry)
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=64)
    basis = camera_pose()
    r0 = Renderer(base)
    r1 = Renderer(jit)
    a = r1.render(scene, basis, RenderingPreferences(), frame_count=1)
    b = r1.render(scene, basis, RenderingPreferences(), frame_count=1)
    c = r1.render(scene, basis, RenderingPreferences(), frame_count=2)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    plain = r0.render(scene, basis, RenderingPreferences(), frame_count=1)
    # jittered image stays in the same ballpark
    assert abs(float(a.mean()) - float(plain.mean())) < 0.5 * max(plain.mean(), 0.1)


def test_compaction_matches_plain(registry):
    """Bucketed terminal-ray compaction must be invisible in the image."""
    base = RenderSettings(width=32, height=32, num_bounces=4, max_trace_steps=96)
    comp = base.replace(compaction=True)
    grid = make_grid(registry)
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=256)
    basis = camera_pose()
    for nee in (0, 1):
        a = Renderer(base).render(scene, basis, RenderingPreferences(nee_type=nee))
        b = Renderer(comp).render(scene, basis, RenderingPreferences(nee_type=nee))
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_sort_schedule_matches_full_sort(registry):
    """sort_bounces skips the inter-bounce re-sort on unscheduled bounces;
    per-ray outputs are order-independent and the compaction bucket covers
    the last alive slot, so every schedule must be image-identical to the
    every-bounce sort."""
    base = RenderSettings(width=32, height=32, num_bounces=4,
                          max_trace_steps=96, compaction=True)
    grid = make_grid(registry)
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=256)
    basis = camera_pose()
    prefs = RenderingPreferences(nee_type=1)
    full = Renderer(base).render(scene, basis, prefs, frame_count=2)
    for sched in ((1,), (1, 2), ()):
        got = Renderer(base.replace(sort_bounces=sched)).render(
            scene, basis, prefs, frame_count=2
        )
        np.testing.assert_allclose(got, full, atol=1e-5, err_msg=str(sched))


def test_sort_schedule_window_tracer(registry):
    """Schedule under the production shape: windowed tracer + hoisted
    presort + compaction — a skipped bounce traces in the stale order."""
    base = RenderSettings(width=32, height=32, num_bounces=3,
                          max_trace_steps=96, compaction=True,
                          use_column_trace=True, trace_tile=1024)
    grid = make_grid(registry)
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=256)
    basis = camera_pose()
    prefs = RenderingPreferences(nee_type=1)
    full = Renderer(base).render(scene, basis, prefs, frame_count=2)
    got = Renderer(base.replace(sort_bounces=(1,))).render(
        scene, basis, prefs, frame_count=2
    )
    np.testing.assert_allclose(got, full, atol=1e-5)


def test_primary_cache_matches_plain(registry):
    """cache_primary must be invisible: frame 0 (fills the cache) and frame
    1+ (reuses it) match the plain renderer exactly; camera motion and
    scene edits invalidate correctly."""
    base = RenderSettings(width=32, height=32, num_bounces=2, max_trace_steps=96)
    cached = base.replace(cache_primary=True)
    grid = make_grid(registry)
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=256)
    basis = camera_pose()
    r0 = Renderer(base)
    r1 = Renderer(cached)

    def close(a, b):
        # the two variants compile differently (bounce 0 inside vs outside
        # the scan), so isolated boundary pixels may flip a branch on fp
        # rounding — same budget as the oracle goldens
        diff = np.abs(a - b).max(axis=-1)
        assert (diff > 1e-3).mean() < 0.005, f"{(diff > 1e-3).mean():.2%}"

    for f in (0, 1, 2):
        a = r0.render(scene, basis, RenderingPreferences(nee_type=1), frame_count=f)
        b = r1.render(scene, basis, RenderingPreferences(nee_type=1), frame_count=f)
        close(a, b)
    assert r1._primary is not None
    # the cached frames must be bit-identical to each other modulo seeds:
    # re-render frame 2 (cache warm both times)
    b_again = r1.render(scene, basis, RenderingPreferences(nee_type=1), frame_count=2)
    np.testing.assert_array_equal(
        b_again,
        r1.render(scene, basis, RenderingPreferences(nee_type=1), frame_count=2),
    )
    # camera move invalidates
    cam2 = SphericalCamera()
    cam2.set_root_position([8.0, 8.0, 8.0])
    cam2.offset = 12.0
    cam2.yaw = 1.1
    cam2.pitch = -0.3
    b2 = cam2.eye_front_right_up()
    a = r0.render(scene, b2, RenderingPreferences(nee_type=1), frame_count=3)
    b = r1.render(scene, b2, RenderingPreferences(nee_type=1), frame_count=3)
    close(a, b)
    # scene edit invalidates (arrays object changes)
    scene.set_block((3, 6, 3), registry.block_idx("stone"))
    a = r0.render(scene, b2, RenderingPreferences(nee_type=1), frame_count=4)
    b = r1.render(scene, b2, RenderingPreferences(nee_type=1), frame_count=4)
    close(a, b)


def test_golden_config1_baseline_resolution(registry):
    """BASELINE.md config-1 gate at its SPECIFIED resolution: 256x256,
    1 bounce, vs the stored scalar-oracle image (tests/golden/
    config1_256.npz, regenerate with tools/gen_golden.py whenever RNG or
    sampling semantics change).  VERDICT round 1, weak #3."""
    import os

    path = os.path.join(os.path.dirname(__file__), "golden", "config1_256.npz")
    blob = np.load(path)
    want = blob["image"]
    w, h, bounces, nee_type, frame = (int(x) for x in blob["meta"])

    settings = RenderSettings(
        width=w, height=h, num_bounces=bounces, max_trace_steps=96
    )
    grid = make_grid(registry)
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=256)
    got = Renderer(settings).render(
        scene, camera_pose(), RenderingPreferences(nee_type=nee_type),
        frame_count=frame,
    )
    assert got.shape == want.shape
    assert np.all(np.isfinite(got))
    diff = np.abs(got - want).max(axis=-1)
    agree = diff < 1e-3
    frac_divergent = 1.0 - agree.mean()
    rmse = float(np.sqrt(np.mean((got[agree] - want[agree]) ** 2)))
    assert frac_divergent < 0.005, f"{frac_divergent:.2%} pixels diverge"
    assert rmse < 1e-3, f"RMSE {rmse}"


def test_zero_pdf_sample_is_finite():
    """A grazing cosine sample can carry bsdf_pdf == 0 exactly (the RNG's
    u32->f32 mapping rounds to 1.0 about once per 2^25 draws); with NEE
    off at that vertex q == 0 and the reference's recurrence computes 0/0
    (outgoing_radiance.rs:84).  We define zero-probability samples to
    contribute nothing beyond their emission — renderer and oracle agree
    (the bench caught 2 NaN pixels per 8M-ray frame before this)."""
    import jax.numpy as jnp

    from wavefront_tpu.render.wavefront import accumulate_radiance

    B, N = 2, 3
    emis = jnp.ones((B, N, 3)) * jnp.asarray([0.5, 1.0, 2.0])[None, :, None]
    refl = jnp.full((B, N, 3), 0.8)
    mis = jnp.zeros((B, N))
    bsdf = jnp.stack([jnp.asarray([0.0, 0.2, 0.0]), jnp.asarray([0.1, 0.1, 0.1])])
    nee = jnp.zeros((B, N))
    valid = jnp.ones((B, N), bool)
    rad, = (accumulate_radiance(emis, refl, mis, bsdf, nee, valid),)
    rad = np.asarray(rad)
    assert np.all(np.isfinite(rad)), rad
    # the zero-pdf rays keep their own emission only
    np.testing.assert_allclose(rad[0], emis[0, 0], rtol=1e-6)
    np.testing.assert_allclose(rad[2], emis[0, 2], rtol=1e-6)
    # the healthy ray still accumulates the next bounce
    assert rad[1].sum() > np.asarray(emis[0, 1]).sum()
