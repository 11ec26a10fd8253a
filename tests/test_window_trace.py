"""Windowed Pallas tracer vs the XLA DDA oracle (kernels/window_trace.py).

The windowed tracer must reproduce intersect.dda_trace's results exactly
(same face rule, epsilons, and tie-breaking) — it is the same intersector
re-expressed without gathers and with scene-size-independent events.
Reference semantics: raytrace.rs:366-400 (traversal), chunk.rs:222-287
(face rule).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wavefront_tpu.kernels.window_trace import (
    MAX_SKIP,
    PackBuilder,
    build_window_pack,
    build_window_tables,
    window_trace,
    _cheby_dist_batch,
)
from wavefront_tpu.render.intersect import dda_trace, make_aux_grid


def _tables(num_blocks=4):
    transparent = np.zeros(256, bool)
    translucent = np.zeros(256, bool)
    transparent[0] = translucent[0] = True          # air
    translucent[2] = True                           # block 2: glass
    transparent[num_blocks:] = True                 # beyond-table = air
    translucent[num_blocks:] = True
    return transparent, translucent


def _compare(grid, origins, dirs, origin_world=(0, 0, 0), atol=2e-4,
             num_blocks=4, presort=True, phases=1, phase_events=64,
             unroll=1, skips=True, wskip=True, presorted=False,
             tables_in_hbm=None, skip_stride=1, windows=4):
    transparent, translucent = _tables(num_blocks)
    aux = make_aux_grid(grid, transparent, translucent)
    ref = dda_trace(
        jnp.asarray(grid), jnp.asarray(origin_world, jnp.int32),
        jnp.asarray(transparent), jnp.asarray(translucent), 255,
        jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32),
        aux_grid=jnp.asarray(aux), max_steps=512,
    )
    pack = build_window_pack(grid, transparent, translucent)
    assert pack is not None
    got, trunc = window_trace(
        pack, jnp.asarray(origin_world, jnp.int32),
        jnp.asarray(origins, jnp.float32),
        jnp.asarray(dirs, jnp.float32),
        tile=128, interpret=True,
        # the coherence presort + inverse restore must be an exact
        # identity on the results
        presort=presort, presorted=presorted, phases=phases,
        phase_events=phase_events,
        unroll=unroll, skips=skips, wskip=wskip, with_truncated=True,
        tables_in_hbm=tables_in_hbm, skip_stride=skip_stride,
        windows=windows,
    )
    assert not np.any(np.asarray(trunc)), "rays exhausted the event budget"
    ref_hit = np.asarray(ref.hit)
    got_hit = np.asarray(got.hit)
    np.testing.assert_array_equal(got_hit, ref_hit)
    m = ref_hit
    np.testing.assert_allclose(
        np.asarray(got.t)[m], np.asarray(ref.t)[m], rtol=0, atol=atol
    )
    for f in ("owner", "face", "vx", "vy", "vz", "entered"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f))[m], np.asarray(getattr(ref, f))[m],
            err_msg=f,
        )


def _ray_fan(center, n, seed):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.asarray(center, np.float32), (n, 1))
    return o, d


def test_single_block():
    grid = np.zeros((8, 8, 8), np.uint8)
    grid[4, 3, 4] = 1
    o, d = _ray_fan((4.5, 6.5, 4.5), 64, 0)
    _compare(grid, o, d)


def test_terrain_like():
    rng = np.random.default_rng(1)
    grid = np.zeros((16, 16, 16), np.uint8)
    h = (4 + 4 * rng.random((16, 16))).astype(int)
    for x in range(16):
        for z in range(16):
            grid[x, : h[x, z], z] = 1
    o, d = _ray_fan((8.0, 12.0, 8.0), 256, 2)
    _compare(grid, o, d)


def test_glass_and_outside_origins():
    rng = np.random.default_rng(3)
    grid = np.zeros((12, 8, 12), np.uint8)
    grid[2:10, 0:3, 2:10] = 1
    grid[5, 3, 5] = 2       # glass on top
    grid[6, 3, 5] = 1
    o = (rng.random((256, 3)) * 30 - 9).astype(np.float32)
    d = rng.standard_normal((256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    _compare(grid, o, d)


def test_unroll_parity():
    # Unrolled event groups must be an exact no-op on results: fully-masked
    # trailing events in a group write nothing.  Mixed terrain + glass so
    # lanes terminate at staggered event counts within a group.
    rng = np.random.default_rng(7)
    grid = np.zeros((16, 16, 16), np.uint8)
    h = (3 + 5 * rng.random((16, 16))).astype(int)
    for x in range(16):
        for z in range(16):
            grid[x, : h[x, z], z] = 1
    grid[4:8, 8, 4:8] = 2      # glass slab above the terrain
    o, d = _ray_fan((8.0, 12.0, 8.0), 192, 11)
    for unroll in (2, 3):
        _compare(grid, o, d, unroll=unroll)
        _compare(grid, o, d, unroll=unroll, phases=2, phase_events=16)


def test_skip_stride_parity():
    # Lean/full event alternation (skip_stride): copies without the skip
    # machinery must advance exactly like the skips=False path, and full
    # copies must jump exactly like the skips=True path — results are
    # identical either way.  Scene has empty space (skips fire) AND glass
    # (entry/exit crossings) AND a tall grid (slab switches between lean
    # and full copies).
    rng = np.random.default_rng(41)
    grid = np.zeros((16, 96, 16), np.uint8)
    blobs = rng.random((16, 96, 16)) > 0.92
    grid[blobs] = 1
    grid[:, :4, :] = 1
    grid[5:9, 60, 5:9] = 2       # glass shelf in empty space
    o = (rng.random((192, 3)) * np.array([24, 110, 24]) - 4).astype(
        np.float32)
    d = rng.standard_normal((192, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    for unroll, stride in ((2, 2), (4, 2), (4, 4), (3, 3)):
        _compare(grid, o, d, unroll=unroll, skip_stride=stride)
    # with phases: stragglers resume mid-flight across lean/full copies
    _compare(grid, o, d, unroll=4, skip_stride=2, phases=2,
             phase_events=24)


def test_noskip_parity():
    # skips=False statically elides the band/window skip machinery; the
    # plain column/slab advance must still agree with the DDA everywhere,
    # including across slab boundaries (tall grid) and glass crossings.
    rng = np.random.default_rng(13)
    grid = np.zeros((16, 96, 16), np.uint8)
    blobs = rng.random((16, 96, 16)) > 0.9
    grid[blobs] = 1
    grid[3:6, 70, 3:6] = 2     # glass high up (empty space around it)
    o, d = _ray_fan((8.0, 90.0, 8.0), 192, 17)
    _compare(grid, o, d, skips=False)
    o2 = (rng.random((128, 3)) * np.array([30, 110, 30]) - 7).astype(
        np.float32)
    d2 = rng.standard_normal((128, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    _compare(grid, o2, d2, skips=False)
    _compare(grid, o2, d2, skips=False, unroll=2, phases=2,
             phase_events=32)


def test_wskip_off_parity():
    # trace_wskip=False keeps the per-band in-plane skips but statically
    # elides the whole-window skip on a scene that HAS empty windows
    # (max_wdist >= 1), so the band-skip-only advance is what's exercised.
    rng = np.random.default_rng(29)
    grid = np.zeros((96, 96, 96), np.uint8)
    grid[:, :6, :] = 1                       # solid floor slab
    blobs = rng.random((96, 8, 96)) > 0.85   # sparse mid-air clutter
    grid[:, 30:38, :][blobs] = 1
    grid[40:44, 34, 40:44] = 2               # glass patch in the clutter
    # y in [64, 96) is all air -> the top window layer is fully empty
    from wavefront_tpu.kernels.window_trace import build_window_pack
    transparent, translucent = _tables(4)
    pack = build_window_pack(grid, transparent, translucent)
    assert pack is not None and pack.max_wdist >= 1, (
        "scene must contain fully-empty windows for this test to bite"
    )
    o, d = _ray_fan((48.0, 80.0, 48.0), 192, 23)
    _compare(grid, o, d, wskip=False)
    o2 = (rng.random((128, 3)) * np.array([110, 110, 110]) - 7).astype(
        np.float32)
    d2 = rng.standard_normal((128, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    _compare(grid, o2, d2, wskip=False)
    _compare(grid, o2, d2, wskip=False, unroll=2)


def test_vertical_rays_and_grid_exit_backfaces():
    grid = np.zeros((6, 6, 6), np.uint8)
    grid[:, 0, :] = 1          # floor at the grid bottom
    grid[2, 5, 2] = 1          # solid at the very top
    o = np.array(
        [
            [2.5, 4.5, 2.5],   # down onto the floor
            [2.5, 1.5, 2.5],   # up into the top block, then out the top
            [2.5, 0.5, 2.5],   # inside floor block, down -> bottom back-face
            [2.5, 5.5, 2.5],   # inside top block, up -> top back-face
        ],
        np.float32,
    )
    d = np.array(
        [[0, -1, 0], [0, 1, 0], [0, -1, 0], [0, 1, 0]], np.float32
    )
    _compare(grid, o, d)


def test_axis_rays_and_side_exit():
    grid = np.zeros((6, 6, 6), np.uint8)
    grid[0, 2, 2] = 1          # solid at -x border
    grid[5, 2, 3] = 1          # solid at +x border
    o = np.array(
        [
            [0.5, 2.5, 2.5],   # inside border block, -x -> side back-face
            [5.5, 2.5, 3.5],   # inside border block, +x -> side back-face
            [-3.0, 2.5, 2.5],  # outside, entering through -x face
            [9.0, 2.5, 3.5],   # outside, entering through +x face
        ],
        np.float32,
    )
    d = np.array(
        [[-1, 0, 0], [1, 0, 0], [1, 0, 0], [-1, 0, 0]], np.float32
    )
    _compare(grid, o, d)


def test_fuzz_grids():
    rng = np.random.default_rng(7)
    for trial in range(3):
        gx, gy, gz = rng.integers(4, 20, 3)
        gy = min(int(gy), 32)
        grid = (rng.random((gx, gy, gz)) < 0.15).astype(np.uint8)
        glass = (rng.random((gx, gy, gz)) < 0.05) & (grid == 0)
        grid[glass] = 2
        o = (rng.random((128, 3)) * (np.array([gx, gy, gz]) + 10) - 5).astype(
            np.float32
        )
        d = rng.standard_normal((128, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d[:6] = [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
                 [0, 0, -1]]
        d[6] = 0.0
        _compare(grid, o, d, origin_world=(int(-gx // 2), 0, 3))


def test_world_origin_offset():
    grid = np.zeros((8, 8, 8), np.uint8)
    grid[3:5, 2:4, 3:5] = 1
    o, d = _ray_fan((-60.5 + 4.0, 34.0 + 6.0, 100.5 + 4.0), 64, 11)
    _compare(grid, o, d, origin_world=(-60, 32, 100))


def test_grazing_rays_over_terrain():
    """Shallow descending rays skimming rolling terrain — the straggler
    regime whose skip-landing once jumped over surface hits; the rays
    cross several x/z window boundaries per march."""
    rng = np.random.default_rng(21)
    gx, gy, gz = 48, 24, 48
    grid = np.zeros((gx, gy, gz), np.uint8)
    h = (
        8
        + 5 * np.sin(np.arange(gx)[:, None] / 5.0)
        * np.cos(np.arange(gz)[None, :] / 7.0)
        + 2 * rng.random((gx, gz))
    ).astype(int)
    for x in range(gx):
        for z in range(gz):
            grid[x, : max(h[x, z], 1), z] = 1
    n = 192
    o = np.tile(np.asarray([24.0, 18.0, 24.0], np.float32), (n, 1))
    ang = rng.random(n) * 2 * np.pi
    dy = -0.05 - 0.3 * rng.random(n)       # shallow grazers
    d = np.stack(
        [np.cos(ang), dy, np.sin(ang)], -1
    ).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    _compare(grid, o, d)


def test_slab_boundary_faces():
    """Vertical window-boundary semantics: solid spans across y=32 (no
    phantom face), faces exactly at the boundary, glass at the boundary
    rows — with slab switching fused inside the kernel."""
    grid = np.zeros((8, 70, 8), np.uint8)
    grid[2, 28:40, 2] = 1      # solid column through the boundary
    grid[4, 31, 4] = 1         # face at y=32 (air above)
    grid[5, 32, 5] = 1         # face at y=32 (air below)
    grid[3, 31, 3] = 1
    grid[3, 32, 3] = 2         # glass immediately above solid at boundary
    grid[6, 63, 6] = 1         # face at the 64 boundary
    grid[6, 64, 6] = 1         # spanning 64
    o = np.array(
        [
            [2.5, 50.0, 2.5],  # down into the spanning column
            [2.5, 10.0, 2.5],  # up into the spanning column
            [4.5, 50.0, 4.5],  # down onto the y=31 block
            [5.5, 10.0, 5.5],  # up onto the y=32 block
            [3.5, 50.0, 3.5],  # down through glass into solid
            [3.5, 10.0, 3.5],  # up into solid under glass
            [6.5, 50.0, 6.5],  # down onto the 64-spanning pair
            [2.5, 34.0, 2.5],  # inside spanning column (upper slab), up
            [2.5, 30.0, 2.5],  # inside spanning column (lower slab), down
        ],
        np.float32,
    )
    d = np.array(
        [
            [0, -1, 0], [0, 1, 0], [0, -1, 0], [0, 1, 0],
            [0, -1, 0], [0, 1, 0], [0, -1, 0], [0, 1, 0], [0, -1, 0],
        ],
        np.float32,
    )
    _compare(grid, o, d)
    # diagonal fan through the boundary region for good measure
    o2, d2 = _ray_fan((4.0, 36.0, 4.0), 96, 31)
    _compare(grid, o2, d2)


def test_xz_window_boundary_faces():
    """Horizontal window-boundary semantics: faces exactly at x=32 / z=32,
    solids spanning the boundary, glass transitions across it."""
    grid = np.zeros((48, 8, 48), np.uint8)
    grid[28:40, 2, 28:40] = 1       # plate spanning both boundaries
    grid[31, 4, 10] = 1             # face at x=32 (air at 32)
    grid[32, 4, 11] = 1             # face at x=32 (air at 31)
    grid[10, 4, 31] = 1
    grid[10, 4, 32] = 2             # glass just across z boundary
    o = np.array(
        [
            [20.0, 2.5, 34.5],   # +x into the plate across x=32? (enters at 28)
            [45.0, 2.5, 34.5],   # -x into the plate
            [20.0, 4.5, 10.5],   # +x onto the x=31 block
            [45.0, 4.5, 11.5],   # -x onto the x=32 block
            [10.5, 4.5, 20.0],   # +z through solid then glass pair
            [10.5, 4.5, 45.0],   # -z through glass then solid
            [34.5, 6.0, 34.5],   # down onto the plate center
        ],
        np.float32,
    )
    d = np.array(
        [
            [1, 0, 0], [-1, 0, 0], [1, 0, 0], [-1, 0, 0],
            [0, 0, 1], [0, 0, -1], [0, -1, 0],
        ],
        np.float32,
    )
    _compare(grid, o, d)
    o2, d2 = _ray_fan((32.0, 4.0, 32.0), 128, 41)
    _compare(grid, o2, d2)


def test_tall_volumetric_fuzz():
    """Random volumetric blobs over 3 slabs vs the DDA oracle."""
    rng = np.random.default_rng(33)
    grid = (rng.random((12, 96, 12)) < 0.12).astype(np.uint8)
    glass = (rng.random((12, 96, 12)) < 0.04) & (grid == 0)
    grid[glass] = 2
    o = (rng.random((160, 3)) * np.array([30, 120, 30]) - np.array([9, 12, 9])
         ).astype(np.float32)
    d = rng.standard_normal((160, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d[:4] = [[0, 1, 0], [0, -1, 0], [1, 0, 0], [0, 0, -1]]
    _compare(grid, o, d, origin_world=(-3, -5, 2))


def test_per_window_palettes():
    """18 distinct ids in the grid, but <= 16 per 32^3 window: the
    windowed palette handles what the round-1 global palette could not."""
    grid = np.zeros((64, 4, 4), np.uint8)
    for j in range(9):
        grid[j * 2, 1, 1] = j + 1          # ids 1..9 in window x<32
        grid[32 + j * 2, 1, 2] = j + 10    # ids 10..18 in window x>=32
    o, d = _ray_fan((32.0, 2.0, 2.0), 128, 13)
    _compare(grid, o, d, num_blocks=19)


def test_phased_resume_parity():
    """Phased tracing (tiny first-phase budgets forcing truncation +
    mid-flight resume + re-sort by current position) is bit-identical to
    the one-shot trace on a mixed terrain/glass scene."""
    rng = np.random.default_rng(7)
    grid = np.zeros((48, 40, 48), np.uint8)
    h = (6 + 5 * np.sin(np.arange(48)[:, None] / 5.0)
         * np.cos(np.arange(48)[None, :] / 7.0)
         + 3 * rng.random((48, 48))).astype(int)
    for x in range(48):
        for z in range(48):
            grid[x, : max(h[x, z], 1), z] = 1
    grid[10:14, 8:30, 10:14] = 1
    grid[20:23, 6:9, 20:23] = 2               # glass
    o = (rng.random((512, 3)) * [48, 50, 48] - [0, 2, 0]).astype(np.float32)
    d = rng.standard_normal((512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    for phases, pe in ((2, 8), (3, 5)):
        _compare(grid, o, d, phases=phases, phase_events=pe)
    # externally-presorted variant (the renderer's hoisted bounce sort):
    # phase 0 skips the kernel sort, later phases still repack stragglers
    # and the restore must be an exact identity — for ANY input order
    # ('presorted' is a perf hint, not a contract the test honors)
    for phases, pe in ((2, 8), (3, 5)):
        _compare(grid, o, d, presort=False, presorted=True,
                 phases=phases, phase_events=pe)


def test_truncation_flag():
    """A too-small event budget reports misses WITH the truncated flag."""
    transparent, translucent = _tables()
    grid = np.zeros((40, 8, 40), np.uint8)
    grid[:, 0, :] = 1
    grid[39, 1:, :] = 1                       # wall at far +x
    pack = build_window_pack(grid, transparent, translucent)
    o = np.tile(np.asarray([0.5, 4.5, 20.2], np.float32), (64, 1))
    d = np.tile(np.asarray([1.0, 0.001, 0.013], np.float32), (64, 1))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit, trunc = window_trace(
        pack, jnp.zeros(3, jnp.int32), jnp.asarray(o), jnp.asarray(d),
        tile=128, interpret=True, max_events=3, with_truncated=True,
    )
    assert np.all(np.asarray(trunc)), "expected budget exhaustion"
    assert not np.any(np.asarray(hit.hit))
    hit2, trunc2 = window_trace(
        pack, jnp.zeros(3, jnp.int32), jnp.asarray(o), jnp.asarray(d),
        tile=128, interpret=True, max_events=256, with_truncated=True,
    )
    assert not np.any(np.asarray(trunc2))
    assert np.all(np.asarray(hit2.hit))


def test_build_fallbacks():
    transparent, translucent = _tables(num_blocks=20)
    # 18 distinct ids inside ONE window -> no palette fits
    grid = np.arange(18, dtype=np.uint8).reshape(18, 1, 1) * np.ones(
        (18, 4, 4), np.uint8
    )
    assert build_window_pack(grid, transparent, translucent) is None
    # taller than the vy packing supports -> fallback (ADVICE r1: the old
    # kernel silently overflowed vy into the owner bits here)
    tall = np.zeros((4, 520, 4), np.uint8)
    assert build_window_pack(tall, transparent, translucent) is None


def test_cheby_chamfer_exact():
    """Two-pass L-inf chamfer == brute-force Chebyshev distance."""
    rng = np.random.default_rng(5)
    for _ in range(4):
        occ = rng.random((23, 37)) < 0.04
        d = _cheby_dist_batch(occ[None], MAX_SKIP)[0]
        pts = np.argwhere(occ)
        if len(pts) == 0:
            assert np.all(d == MAX_SKIP)
            continue
        ii, jj = np.meshgrid(
            np.arange(occ.shape[0]), np.arange(occ.shape[1]), indexing="ij"
        )
        brute = np.full(occ.shape, MAX_SKIP, np.int64)
        for (pi, pj) in pts:
            brute = np.minimum(
                brute, np.maximum(np.abs(ii - pi), np.abs(jj - pj))
            )
        np.testing.assert_array_equal(d, np.minimum(brute, MAX_SKIP))


def _pack_window_content(pack):
    """Per-window device content (what the kernel actually reads),
    independent of slot assignment/budget padding."""
    wmap = np.asarray(pack.wmap)
    return (
        np.asarray(pack.tw, np.float32)[wmap],
        np.asarray(pack.twid, np.float32)[wmap],
        np.asarray(pack.palv, np.float32)[wmap],
    )


def _assert_packs_equivalent(got, want, msg=""):
    for a, b, name in zip(
        _pack_window_content(got), _pack_window_content(want),
        ("tw", "twid", "palv"),
    ):
        np.testing.assert_array_equal(a, b, err_msg=f"{msg}:{name}")
    assert got.has_glass == want.has_glass
    assert int(got.ymax) == int(want.ymax)
    np.testing.assert_array_equal(
        np.asarray(got.wdist), np.asarray(want.wdist), err_msg="wdist"
    )


def test_incremental_set_block_parity():
    """PackBuilder.set_block == from-scratch rebuild after every edit in a
    mixed sequence: place/break solids (band-occupancy flips, skip-field
    updates across window boundaries), glass edits in a glass-bearing
    pack, palette growth, edits at window corners."""
    rng = np.random.default_rng(11)
    transparent, translucent = _tables(num_blocks=8)
    grid = np.zeros((70, 40, 70), np.uint8)
    h = (5 + 4 * np.sin(np.arange(70)[:, None] / 6.0)
         * np.cos(np.arange(70)[None, :] / 9.0)).astype(int)
    for x in range(70):
        for z in range(70):
            grid[x, : max(h[x, z], 1), z] = 1
    grid[8:10, 3:9, 8:10] = 2                  # glass present from the start
    tab = build_window_tables(grid, transparent, translucent)
    wb = PackBuilder(tab)

    edits = [
        ((33, 20, 33), 1),      # solid into empty band (occ flip 0->1)
        ((33, 20, 33), 0),      # and back (occ flip 1->0)
        ((31, 3, 31), 0),       # break terrain at a window corner
        ((32, 3, 32), 3),       # new palette id in the far window
        ((5, 12, 5), 2),        # glass placement
        ((5, 12, 5), 0),        # glass removal
        ((69, 1, 69), 4),       # grid edge
        ((0, 0, 0), 5),         # origin corner
    ]
    for (pos, bid) in edits:
        old = int(grid[pos])
        grid = grid.copy()
        grid[pos] = bid
        ok = wb.set_block(grid, pos, old, bid, transparent, translucent)
        assert ok, (pos, bid)
        want = build_window_pack(grid, transparent, translucent)
        _assert_packs_equivalent(wb.pack, want, msg=f"{pos}->{bid}")

    # random fuzz on top
    for i in range(24):
        pos = tuple(int(v) for v in rng.integers((0, 0, 0), grid.shape))
        bid = int(rng.integers(0, 6))
        old = int(grid[pos])
        grid = grid.copy()
        grid[pos] = bid
        ok = wb.set_block(grid, pos, old, bid, transparent, translucent)
        if not ok:
            # legal escape hatch (ymax change/budget); rebuild and go on
            tab = build_window_tables(grid, transparent, translucent)
            wb = PackBuilder(tab)
        want = build_window_pack(grid, transparent, translucent)
        _assert_packs_equivalent(wb.pack, want, msg=f"fuzz{i}")


def test_incremental_rebuild_signals():
    """Edits the incremental path cannot express signal False: first glass
    in a glass-free pack, palette overflow.  Skyline (ymax) growth is NOT
    such a case: it updates the pack's runtime scalar."""
    transparent, translucent = _tables(num_blocks=20)
    grid = np.zeros((40, 36, 40), np.uint8)
    grid[:, :4, :] = 1
    tab = build_window_tables(grid, transparent, translucent)
    assert not tab.has_glass
    wb = PackBuilder(tab)
    g2 = grid.copy()
    g2[10, 10, 10] = 2                         # glass into glass-free pack
    assert not wb.set_block(
        g2, (10, 10, 10), 0, 2, transparent, translucent
    )

    tab = build_window_tables(grid, transparent, translucent)
    wb = PackBuilder(tab)
    g3 = grid.copy()
    g3[5, 30, 5] = 1                           # raises ymax: value update
    assert wb.set_block(g3, (5, 30, 5), 0, 1, transparent, translucent)
    want = build_window_pack(g3, transparent, translucent)
    _assert_packs_equivalent(wb.pack, want, msg="ymax growth")
    assert int(wb.pack.ymax) == 31

    # palette overflow inside one window
    g4 = grid.copy()
    tab = build_window_tables(g4, transparent, translucent)
    wb = PackBuilder(tab)
    ok = True
    for j in range(17):                        # ids 3..19 (2 is glass)
        pos = (2 + j, 1, 2)
        old = int(g4[pos])
        g4 = g4.copy()
        g4[pos] = j + 3
        ok = wb.set_block(g4, pos, old, j + 3, transparent, translucent)
        if not ok:
            break
    assert not ok
    assert build_window_pack(g4, transparent, translucent) is None


def test_incremental_trace_parity():
    """Render-path check: tracing with the incrementally-updated pack
    equals tracing with a scratch pack after edits."""
    transparent, translucent = _tables()
    grid = np.zeros((40, 20, 40), np.uint8)
    grid[:, :3, :] = 1
    grid[1, 3, 1] = 2          # glass-bearing pack: glass edits stay
    tab = build_window_tables(grid, transparent, translucent)
    wb = PackBuilder(tab)
    for (pos, bid) in [((20, 10, 20), 1), ((20, 3, 21), 1),
                       ((20, 10, 20), 0), ((4, 4, 35), 2)]:
        old = int(grid[pos])
        grid = grid.copy()
        grid[pos] = bid
        assert wb.set_block(grid, pos, old, bid, transparent, translucent)
    o, d = _ray_fan((20.0, 12.0, 20.0), 256, 3)
    want_pack = build_window_pack(grid, transparent, translucent)
    kw = dict(tile=128, interpret=True, presort=True)
    got = window_trace(wb.pack, jnp.zeros(3, jnp.int32),
                       jnp.asarray(o), jnp.asarray(d), **kw)
    want = window_trace(want_pack, jnp.zeros(3, jnp.int32),
                        jnp.asarray(o), jnp.asarray(d), **kw)
    for f in ("hit", "t", "owner", "face", "vx", "vy", "vz", "entered"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(want, f)),
            err_msg=f,
        )


def test_window_skip_sky_events():
    """Whole-window empty-space skips: rays dropping through 64 rows of
    empty sky windows reach the floor exactly AND in few events (one jump
    per wdist ball, not one per 8-row band).  VoxelHit parity is covered
    by the standard matrix; this pins the event-count win."""
    transparent, translucent = _tables()
    grid = np.zeros((64, 96, 64), np.uint8)
    grid[:, 0, :] = 1                        # floor only: sky above
    pack = build_window_pack(grid, transparent, translucent)
    assert int(np.asarray(pack.wdist).max()) >= 2
    n = 128
    rng = np.random.default_rng(3)
    o = np.stack([
        16.0 + 32.0 * rng.random(n),
        np.full(n, 90.0, np.float32),
        16.0 + 32.0 * rng.random(n),
    ], -1).astype(np.float32)
    d = np.stack([
        0.1 * rng.standard_normal(n),
        -np.ones(n),
        0.1 * rng.standard_normal(n),
    ], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit, stats = window_trace(
        pack, jnp.zeros(3, jnp.int32), jnp.asarray(o), jnp.asarray(d),
        tile=128, interpret=True, with_stats=True,
    )
    h = np.asarray(hit.hit)
    assert h.sum() > 100          # a few rays exit the grid side instead
    np.testing.assert_array_equal(np.asarray(hit.vy)[h], 0)
    events = int(np.asarray(stats["events"]).max())
    # without window skips a 90-row descent costs >= 11 band landings +
    # slab switches; with them the sky clears in a few jumps
    assert events <= 10, events
    _compare(grid, o, d)                     # exact-hit parity incl. t


def test_reshift_reuses_kept_windows():
    """Streamed recenter (PackBuilder.reshift): window-aligned shifts
    adopt fresh tables while reusing kept windows' device slots; the
    result is content-equivalent to a scratch build, and unchanged
    interior windows keep their exact slot (no re-upload)."""
    from wavefront_tpu.kernels.window_trace import build_window_tables

    rng = np.random.default_rng(9)
    transparent, translucent = _tables()

    def make_world(ox, oz):
        # deterministic "infinite" terrain sampled at a window origin
        g = np.zeros((96, 64, 96), np.uint8)
        xs = np.arange(ox, ox + 96)[:, None]
        zs = np.arange(oz, oz + 96)[None, :]
        h = (6 + 5 * np.sin(xs / 9.0) * np.cos(zs / 11.0)).astype(int)
        for x in range(96):
            for z in range(96):
                g[x, : max(h[x, z], 1), z] = 1
        g[(ox + 40) % 90, 30, (oz + 50) % 90] = 3   # a floating marker
        return g

    tab0 = build_window_tables(make_world(0, 0), transparent, translucent)
    wb = PackBuilder(tab0)
    slots_before = np.asarray(wb.pack.wmap).copy()

    # recenter by (+1 window x, -1 window z)
    g2 = make_world(32, -32)
    tab1 = build_window_tables(g2, transparent, translucent)
    assert wb.reshift(tab1, (0, 1, -1))
    want = build_window_pack(g2, transparent, translucent)
    _assert_packs_equivalent(wb.pack, want, msg="reshift")

    # a kept interior window (shift source in range both times) whose
    # content did not change keeps its slot
    nwx = nwz = 3
    k, wx, wz = 1, 1, 1            # interior sky window
    w_new = (k * nwx + wx) * nwz + wz
    w_old = (k * nwx + (wx + 1)) * nwz + (wz - 1)
    assert int(np.asarray(wb.pack.wmap)[w_new]) == int(slots_before[w_old])

    # a second recenter straight back must also agree
    g3 = make_world(0, 0)
    tab2 = build_window_tables(g3, transparent, translucent)
    assert wb.reshift(tab2, (0, -1, 1))
    want3 = build_window_pack(g3, transparent, translucent)
    _assert_packs_equivalent(wb.pack, want3, msg="reshift back")

    # vertical recenter (ego climbed a window): dk = +1 shows content one
    # window BELOW at each new ordinal
    g4 = np.zeros_like(g3)
    g4[:, :32, :] = g3[:, 32:, :]          # world shifted down one window
    g4[40, 20, 40] = 3                     # plus new content
    tab3 = build_window_tables(g4, transparent, translucent)
    assert wb.reshift(tab3, (1, 0, 0))
    want4 = build_window_pack(g4, transparent, translucent)
    _assert_packs_equivalent(wb.pack, want4, msg="reshift vertical")


def test_packbuilder_stress_edits_and_recenters():
    """Random interleaving of single-voxel edits and window-aligned
    recenters; after every operation the builder's device content must
    equal a scratch build (guards the dedupe refcount/slot bookkeeping
    across the two incremental paths)."""
    from wavefront_tpu.kernels.window_trace import build_window_tables

    rng = np.random.default_rng(17)
    transparent, translucent = _tables()
    shape = (64, 64, 64)

    def sample_world(ox, oz):
        g = np.zeros(shape, np.uint8)
        xs = np.arange(ox, ox + shape[0])[:, None]
        zs = np.arange(oz, oz + shape[2])[None, :]
        h = (5 + 4 * np.sin(xs / 7.0) * np.cos(zs / 5.0)).astype(int)
        for x in range(shape[0]):
            for z in range(shape[2]):
                g[x, : max(h[x, z], 1), z] = 1
        return g

    ox = oz = 0
    grid = sample_world(ox, oz)
    wb = PackBuilder(build_window_tables(grid, transparent, translucent))
    for step in range(18):
        if rng.random() < 0.3:
            # recenter one window in a random direction
            dwx, dwz = rng.integers(-1, 2, 2)
            ox += dwx * 32
            oz += dwz * 32
            grid = sample_world(ox, oz)
            tab = build_window_tables(grid, transparent, translucent)
            if not wb.reshift(tab, (0, dwx, dwz)):
                wb = PackBuilder(tab)
        else:
            pos = tuple(int(v) for v in rng.integers((0, 0, 0), shape))
            bid = int(rng.integers(0, 4))
            if bid == 2:
                bid = 1          # keep the pack glass-free consistently
            old = int(grid[pos])
            grid = grid.copy()
            grid[pos] = bid
            if not wb.set_block(grid, pos, old, bid, transparent,
                                translucent):
                wb = PackBuilder(
                    build_window_tables(grid, transparent, translucent)
                )
        want = build_window_pack(grid, transparent, translucent)
        _assert_packs_equivalent(wb.pack, want, msg=f"step{step}")


def test_window_skip_with_glass_clusters():
    """Multi-window scene whose content is sparse clusters (incl. glass)
    separated by empty windows: window-unit skips must not jump over
    glass entry/exit crossings (glass is transparent-but-translucent —
    exactly the class the owning/occupancy fields must include)."""
    rng = np.random.default_rng(29)
    grid = np.zeros((96, 64, 96), np.uint8)
    grid[:, 0, :] = 1                        # floor
    grid[10:14, 30:34, 10:14] = 2            # glass cluster high up
    grid[70:74, 40:44, 70:74] = 1            # solid cluster
    grid[40:42, 50:52, 40:42] = 2            # small glass
    n = 256
    o = (rng.random((n, 3)) * [96, 70, 96] - [0, 3, 0]).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # aim a quarter of the fan straight at the clusters from far corners
    o[:32] = [2.0, 60.0, 2.0]
    t0 = np.array([12.0, 32.0, 12.0]) - o[:32]
    d[:32] = (t0 / np.linalg.norm(t0, axis=-1, keepdims=True)).astype(
        np.float32
    )
    o[32:64] = [90.0, 8.0, 4.0]
    t1 = np.array([41.0, 51.0, 41.0]) - o[32:64]
    d[32:64] = (t1 / np.linalg.norm(t1, axis=-1, keepdims=True)).astype(
        np.float32
    )
    _compare(grid, o, d)


def test_hbm_tables_parity():
    """tables_in_hbm=True keeps tw/twid in HBM and DMAs each resident
    window's block into VMEM scratch at visit start (the streamed-scale
    regime where the table cannot live in VMEM) — results must be
    identical to the VMEM-resident path and to the DDA."""
    rng = np.random.default_rng(13)
    grid = np.zeros((48, 40, 48), np.uint8)
    h = (4 + 8 * rng.random((48, 48))).astype(int)
    for x in range(48):
        for z in range(48):
            grid[x, : h[x, z], z] = 1
    grid[20, 20, 20] = 1      # isolated blob crossing window boundaries
    grid[10:14, 12, 10:14] = 2
    o, d = _ray_fan((24.0, 30.0, 24.0), 256, 14)
    _compare(grid, o, d, tables_in_hbm=True)


def test_hbm_prefetch_parity():
    """n_win=1 + tables_in_hbm runs the cross-visit prefetch
    double-buffer (two scratch slots, predicted-next-window DMA in
    flight during the visit) — bit-identical results to the DDA and to
    the multi-window DMA path."""
    rng = np.random.default_rng(29)
    grid = np.zeros((64, 40, 64), np.uint8)
    h = (4 + 9 * rng.random((64, 64))).astype(int)
    for x in range(64):
        for z in range(64):
            grid[x, : h[x, z], z] = 1
    grid[30:34, 14:18, 30:34] = 3
    grid[8:10, 12, 40:44] = 2
    o, d = _ray_fan((32.0, 28.0, 32.0), 384, 31)
    _compare(grid, o, d, tables_in_hbm=True, windows=1)
    # phased straggler passes re-enter the kernel with resume state; the
    # prefetch state must reinitialize cleanly per pass
    _compare(grid, o, d, tables_in_hbm=True, windows=1, phases=2,
             phase_events=24)
