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
