"""Fused Pallas shade (kernels/shade.py) vs the XLA shade path.

The fused kernel re-expresses renderer._shade + dense NEE + the pdf sweep
+ the throughput fold as one Pallas program.  Everything except the NEE
descent probabilities is bit-exact by construction (same selects, same
murmur3 draws, the texel kernel's exact one-hot extraction); the NEE
path-probability contraction runs transposed relative to the XLA dot, so
its ULP-level differences are pinned by tolerance here while the golden
suite keeps pinning the XLA path against the scalar oracle.

Reference semantics under test: raytrace.rs:467-694 (shade),
nee_pdf.rs:302-334 (pdf sweep), outgoing_radiance.rs:77-87 (MIS fold).
"""

import numpy as np
import pytest

from wavefront_tpu.core.camera import SphericalCamera
from wavefront_tpu.core.config import RenderSettings, RenderingPreferences
from wavefront_tpu.render.renderer import Renderer
from wavefront_tpu.render.scene import VoxelScene
from wavefront_tpu.world.blocks import BlockRegistry


@pytest.fixture(scope="module")
def setup():
    registry = BlockRegistry.load("assets")
    air = registry.air
    grid = np.full((16, 16, 16), air, np.uint8)
    grid[:, :4, :] = registry.block_idx("stone")
    grid[:, 4, :] = registry.block_idx("grass")
    grid[6:9, 5:8, 6:9] = registry.block_idx("lamp")
    grid[2, 5:7, 3] = registry.block_idx("mirror")
    grid[12, 5:7, 12] = registry.block_idx("glass")
    cam = SphericalCamera()
    cam.set_root_position([8.0, 8.0, 8.0])
    cam.offset = 14.0
    cam.yaw = 0.7
    cam.pitch = -0.45
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=256)
    return scene, cam.eye_front_right_up()


def _pair(setup, nee, **kw):
    scene, basis = setup
    base = dict(width=48, height=48, num_bounces=2, max_trace_steps=96)
    base.update(kw)
    prefs = RenderingPreferences(nee_type=nee)
    a = Renderer(RenderSettings(**base, shade_fused=False)).render(
        scene, basis, prefs, frame_count=3
    )
    b = Renderer(RenderSettings(**base, shade_fused=True)).render(
        scene, basis, prefs, frame_count=3
    )
    return np.asarray(a), np.asarray(b)


def test_bitexact_without_nee(setup):
    # no NEE -> no matmul reassociation anywhere: bit-identical images
    a, b = _pair(setup, nee=0)
    assert np.array_equal(a, b)


def test_nee_tolerance(setup):
    a, b = _pair(setup, nee=1)
    d = np.abs(a - b)
    assert d.max() < 1e-3
    assert np.sqrt((d ** 2).mean()) < 1e-5


def test_nee2_tolerance(setup):
    a, b = _pair(setup, nee=2)
    d = np.abs(a - b)
    assert d.max() < 1e-3


def test_production_shape_window_tracer(setup):
    # windowed tracer (interpret) + compaction + hoisted presort + audit:
    # the headline program's structure at toy size
    a, b = _pair(
        setup, nee=1, width=32, height=32,
        use_column_trace=True, compaction=True, trace_audit=True,
        trace_tile=1024, trace_unroll=2,
    )
    d = np.abs(a - b)
    assert d.max() < 1e-3


def test_primary_cache_matches(setup):
    scene, basis = setup
    prefs = RenderingPreferences(nee_type=1)
    base = dict(width=32, height=32, num_bounces=2, max_trace_steps=96,
                shade_fused=True)
    plain = np.asarray(
        Renderer(RenderSettings(**base)).render(
            scene, basis, prefs, frame_count=5
        )
    )
    r = Renderer(RenderSettings(**base, cache_primary=True))
    c1 = np.asarray(r.render(scene, basis, prefs, frame_count=5))
    c2 = np.asarray(r.render(scene, basis, prefs, frame_count=5))
    assert np.array_equal(c1, plain)       # cache fill frame
    assert np.array_equal(c2, plain)       # cache hit frame


@pytest.fixture(scope="module")
def setup_entities(setup):
    """The same scene with a dynamic entity (the app's ego cube,
    main.rs:97-114) — the fused path must carry entity hits too
    (VERDICT r4 #3; reference raytrace.rs:541-566)."""
    import copy

    from wavefront_tpu.world import meshes

    scene, basis = setup
    scene = copy.copy(scene)
    scene._entities = dict(scene._entities)
    scene._arrays = None
    scene._entities_dirty = True
    verts, uv, tex = meshes.unitcube()
    verts = verts + np.array([7.0, 6.5, 4.0], np.float32)
    scene.add_object("ego", verts, uv, tex)
    return scene, basis


def _pair_e(setup_entities, nee, **kw):
    scene, basis = setup_entities
    base = dict(width=48, height=48, num_bounces=2, max_trace_steps=96)
    base.update(kw)
    prefs = RenderingPreferences(nee_type=nee)
    a = Renderer(RenderSettings(**base, shade_fused=False)).render(
        scene, basis, prefs, frame_count=3
    )
    b = Renderer(RenderSettings(**base, shade_fused=True)).render(
        scene, basis, prefs, frame_count=3
    )
    return np.asarray(a), np.asarray(b)


def test_entities_bitexact_without_nee(setup_entities):
    a, b = _pair_e(setup_entities, nee=0)
    assert np.array_equal(a, b)


def test_entities_visible(setup_entities, setup):
    # the entity actually shades (differs from the entity-less image)
    a0, _ = _pair(setup, nee=0)
    a1, _ = _pair_e(setup_entities, nee=0)
    assert not np.array_equal(a0, a1)


def test_entities_nee_tolerance(setup_entities):
    a, b = _pair_e(setup_entities, nee=1)
    d = np.abs(a - b)
    assert d.max() < 1e-3
    assert np.sqrt((d ** 2).mean()) < 1e-5


def test_entities_production_shape(setup_entities):
    # the app's interactive program shape: windowed tracer + compaction +
    # hoisted presort + entities on the fused path
    a, b = _pair_e(
        setup_entities, nee=1, width=32, height=32,
        use_column_trace=True, compaction=True, trace_audit=True,
        trace_tile=1024, trace_unroll=2,
    )
    d = np.abs(a - b)
    assert d.max() < 1e-3


def test_entities_primary_cache(setup_entities):
    scene, basis = setup_entities
    prefs = RenderingPreferences(nee_type=1)
    base = dict(width=32, height=32, num_bounces=2, max_trace_steps=96,
                shade_fused=True)
    plain = np.asarray(
        Renderer(RenderSettings(**base)).render(
            scene, basis, prefs, frame_count=5
        )
    )
    r = Renderer(RenderSettings(**base, cache_primary=True))
    c1 = np.asarray(r.render(scene, basis, prefs, frame_count=5))
    c2 = np.asarray(r.render(scene, basis, prefs, frame_count=5))
    assert np.array_equal(c1, plain)
    assert np.array_equal(c2, plain)


@pytest.fixture(scope="module")
def setup_lamp_rich():
    """A scene whose light set exceeds the OLD 64/64 kernel caps (VERDICT
    r4 #7: a player placing lamps must not silently fall off the fused
    path).  ~25 isolated lamps -> ~150 prims / ~300 nodes, inside the new
    512/256 caps.  Reference: arbitrary light counts, bvh/build.rs:249-480."""
    registry = BlockRegistry.load("assets")
    air = registry.air
    grid = np.full((32, 16, 32), air, np.uint8)
    grid[:, :3, :] = registry.block_idx("stone")
    lamp = registry.block_idx("lamp")
    rng = np.random.default_rng(7)
    for _ in range(25):
        x, z = rng.integers(1, 31, 2)
        y = int(rng.integers(4, 12))
        grid[x, y, z] = lamp
    cam = SphericalCamera()
    cam.set_root_position([16.0, 8.0, 16.0])
    cam.offset = 22.0
    cam.yaw = 0.9
    cam.pitch = -0.5
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=512)
    return scene, cam.eye_front_right_up()


def test_lamp_rich_uses_fused_path(setup_lamp_rich):
    from wavefront_tpu.render.renderer import _use_fused

    scene, _ = setup_lamp_rich
    arrays = scene.get_arrays()
    la = arrays.lights
    assert la.ancestors.shape[1] > 64, (
        f"fixture must exceed the old prim cap, got {la.ancestors.shape}"
    )
    s = RenderSettings(width=32, height=32, num_bounces=2, shade_fused=True)
    assert _use_fused(arrays, s, nee_type=1)


def test_lamp_rich_parity(setup_lamp_rich):
    scene, basis = setup_lamp_rich
    base = dict(width=32, height=32, num_bounces=2, max_trace_steps=96)
    prefs = RenderingPreferences(nee_type=1)
    a = Renderer(RenderSettings(**base, shade_fused=False)).render(
        scene, basis, prefs, frame_count=3
    )
    b = Renderer(RenderSettings(**base, shade_fused=True)).render(
        scene, basis, prefs, frame_count=3
    )
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a - b)
    assert d.max() < 1e-3
    assert np.sqrt((d ** 2).mean()) < 1e-5


def test_beyond_caps_falls_back_loudly():
    """Past the (512-node / 256-prim) caps the renderer must fall back to
    the XLA shade AND say so (the boundary is logged, not silent)."""
    import warnings

    from wavefront_tpu.render.renderer import _use_fused
    from wavefront_tpu.render.scene import SceneArrays

    class _FakeLights:
        dense = True
        ancestors = np.zeros((1024, 512), np.float32)

    class _FakeScene:
        lights = _FakeLights()

    s = RenderSettings(width=32, height=32, num_bounces=2, shade_fused=True)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert not _use_fused(_FakeScene(), s, nee_type=1)
    assert any("fused-shade caps" in str(w.message) for w in rec)


def test_bf16_color_composes(setup):
    """shade_bf16 no longer disables the fused kernel (VERDICT r4 #8):
    both paths run the same bf16 color pipeline; tolerance covers the
    per-op rounding-order differences bf16 arithmetic admits."""
    from wavefront_tpu.render.renderer import _use_fused

    scene, basis = setup
    s = RenderSettings(width=48, height=48, num_bounces=2,
                       max_trace_steps=96, shade_fused=True, shade_bf16=True)
    assert _use_fused(scene.get_arrays(), s, nee_type=1)
    a, b = _pair(setup, nee=1, shade_bf16=True)
    # RELATIVE compare (HDR lamp pixels reach 400+; docs/PERF.md round 4
    # taught the same unit lesson to the golden gate): bf16 per-op
    # rounding-order differences between XLA and the kernel are ~1%
    rel = np.abs(a - b) / (1.0 + np.abs(a))
    assert rel.max() < 3e-2
    assert np.sqrt((rel ** 2).mean()) < 2e-3


def test_pack_hits_roundtrip():
    from wavefront_tpu.kernels.shade import pack_hits
    from wavefront_tpu.kernels.window_trace import _unpack_hits
    from wavefront_tpu.render.intersect import VoxelHit
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 257
    vox = VoxelHit(
        hit=jnp.asarray(rng.integers(0, 2, n).astype(bool)),
        t=jnp.asarray(rng.uniform(0, 100, n).astype(np.float32)),
        owner=jnp.asarray(rng.integers(0, 255, n), jnp.int32),
        face=jnp.asarray(rng.integers(0, 6, n), jnp.int32),
        vx=jnp.asarray(rng.integers(-2, 1000, n), jnp.int32),
        vy=jnp.asarray(rng.integers(-2, 500, n), jnp.int32),
        vz=jnp.asarray(rng.integers(-2, 1000, n), jnp.int32),
        entered=jnp.asarray(rng.integers(0, 2, n).astype(bool)),
    )
    pa, pb, t = pack_hits(vox)
    back = _unpack_hits(pa, pb, t)
    for field in ("hit", "owner", "face", "vx", "vy", "vz", "entered"):
        np.testing.assert_array_equal(
            np.asarray(getattr(back, field)), np.asarray(getattr(vox, field)),
            err_msg=field,
        )
    np.testing.assert_array_equal(np.asarray(back.t), np.asarray(vox.t))
