"""Fused windowed Pallas voxel tracer: the scene-size-independent column DDA.

Round-2 successor to kernels/column_trace.py, same role: the TPU-native
replacement for the reference's hardware ray-query traversal loop
(raytrace.rs:366-400).  The round-1 kernel's one-hot extraction matmul read
the ENTIRE (nc*gz, gx) column table per event, so the event cost scaled
with the scene: 2.7 us/event/tile at the 160x160 benchmark window and
15.9 us at the 416x416 streamed-world window (tools/roofline.py, measured
on v5e).  This kernel makes the per-event cost scene-size INDEPENDENT:

  * WORLD -> 32^3 WINDOWS.  The grid is pre-tiled into 32x32x32-voxel
    windows (32 y-rows = one bitmask word, 32x32 columns).  Each window's
    column chunks are stored MXU-shaped: a (nc*8, 128) block whose
    contraction dim packs (z-block, x) = (4, 32) -> 128 lanes and whose
    rows pack (chunk, z-low) = (nc, 8).  One event = one
    (nc*8, 128) @ (128, n_rays) matmul + an 8-row z-masked reduce:
    0.23 us/event/tile measured, at ANY scene size (roofline `win`).

  * PER-TILE WINDOW CONSENSUS, IN-KERNEL SWITCHING.  Rays are presorted by
    (current window, direction class, position cell) so a tile marches
    coherently.  The kernel's outer loop picks k resident windows (the
    minimum ids among active rays), dynamic-slices their blocks, and an
    inner loop marches every ray currently in a resident window; rays that
    cross a window boundary stall (their full state stays in registers)
    until the outer loop re-converges.  Optional phased tracing re-sorts
    budget-truncated stragglers by their CURRENT position between phases.

  * THE SLAB STACK IS FUSED.  The vertical slab index is just the third
    window coordinate: a ray crossing a 32-row slab boundary performs a
    window switch carrying a PENDING ENTRY CROSSING whose previous-voxel
    transparency bits come from the departed slab's own boundary row (in
    registers) — so slab-boundary faces follow the exact mesher rule with
    no neighbor-context chunks, no per-slab kernel calls, no t-cap
    chaining, no closest-hit merge.  Grids of any height (<= 507 rows) are
    ONE kernel call.

  * PER-WINDOW PALETTES.  Owner block ids resolve through a per-window
    16-entry palette (one (1,16)@(16,n) matmul per hit window per tile),
    so the round-1 "at most 16 distinct ids per 32-row slab" fallback
    shrinks to "per 32^3 region" — unreachable in practice.

  * Band empty-space skipping is unchanged in spirit (4 bands of 8 rows
    per slab, per-column Chebyshev distance to the nearest face-owning
    column) but distances are now unpacked 8-bit values (radius up to 127
    columns, vs 15), computed by an exact two-pass L-inf chamfer
    transform.  Identical window blocks (all-air sky, solid interiors)
    are deduplicated through a window id map.

Hit semantics mirror render/intersect.dda_trace exactly (same face rule
from the mesher chunk.rs:222-287, same epsilons, same enter-beats-exit
coplanar tie, same x-before-z axis tie); parity is pinned by
tests/test_window_trace.py against dda_trace on the same matrix the old
kernel used.

Rays that exhaust the event budget report a miss WITH a truncated flag
(bit 22 of the packed word) so callers can assert exhaustive traversal —
the TPU analog of the reference's exact hardware traversal guarantee
(raytrace.rs:366-400); see tools/tpu_parity.py.
"""

from __future__ import annotations

import functools
import hashlib
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavefront_tpu.core.config import EPSILON_BLOCK, T_MAX
from wavefront_tpu.render.intersect import VoxelHit

_F32 = jnp.float32
_I32 = jnp.int32
_BF16 = jnp.bfloat16
_INF = 3.0e38
_NUDGE = 1e-4            # start/landing nudge, identical to dda_trace
_BIG = 0x3FFFFFFF
W = 32                   # window edge (voxels); 32 y-rows = one mask word
ZB = 4                   # z-blocks per window (lane dim = ZB * W = 128)
ZL = W // ZB             # z-low rows per block (= sublane rows per chunk)
N_BANDS = 4              # empty-space bands per slab (8 rows each)
BAND_H = W // N_BANDS
MAX_SKIP = 127           # band-distance clamp (8-bit chunks)
N_ID_CHUNKS = 16         # 4-bit palette indices, 2 voxels per chunk
MAX_PALETTE = 16
MAX_GY = 507             # vy is packed in 9 bits with a +2 offset
MAX_WDIST = 31           # window-unit skip field clamp (WindowPack.wdist)
# one-hot build form in extract(): "cmp" | "outer3d" | "concat" (see the
# extract() docstring; env override WT_OH_MODE for A/B measurement)
_OH_MODE = __import__("os").environ.get("WT_OH_MODE", "cmp")


@jax.tree_util.register_pytree_node_class
class WindowPack(NamedTuple):
    """Device tables for the windowed tracer (built by build_window_pack).

    tw:   (nu, nc*8, 128) bf16 — deduplicated window blocks.  Window
          (k, wx, wz) block row c*8+zl, lane zb*32+xl holds chunk c of
          column (wx*32+xl, wz*32 + zb*8 + zl) in slab k:
            c in 0..3      -> byte c of the 32-bit transparency mask T
                              (bit j set iff voxel y = k*32+j transparent;
                              rows above the grid read air=1)
            c in 4..7      -> byte c of the translucency mask L (elided
                              when the whole grid is glass-free: L == T)
            last 4 chunks  -> per-band Chebyshev (x,z) distance to the
                              nearest column whose band holds a
                              face-owning voxel (8-bit, clamped 127)
    twid: (nu, 128, 128) bf16 — row k4*8+zl packs the 4-bit palette
          indices of voxels y-local 2*k4 (low nibble) / 2*k4+1 (high).
    palv: (nu, 1, 16) bf16 — per-window palette slot -> block id.
    wmap: (nw,) i32 — logical window id -> deduplicated block index.
    wdist: (nw,) i32 — 3-D Chebyshev distance IN WINDOW UNITS to the
          nearest 32^3 window containing any face-owning voxel (clamped
          31; 0 = this window has faces).  Read per RESIDENT window as
          scalar metadata (no extraction cost) and used for whole-window
          empty-space skips: a ray in a window with wdist = D jumps to
          just before the first window at distance D in ONE event — the
          sky/secondary-bounce regime that per-band in-plane skips cannot
          cross (they stop at every 8-row band boundary).
    """

    tw: jax.Array
    twid: jax.Array
    palv: jax.Array
    wmap: jax.Array
    wdist: jax.Array
    # highest solid row + 1, as a DEVICE scalar: skyline edits (placing a
    # block above every existing one) update a value, not a compile-time
    # constant — no frame recompile (PackBuilder.set_block)
    ymax: jax.Array
    has_glass: bool
    gx: int
    gy: int
    gz: int
    nwx: int
    nwz: int
    nky: int
    # max(wdist) at BUILD time, as a STATIC field: when 0 (every window
    # holds faces — the worldgen regime, docs/PERF.md "volumetric"), the
    # whole-window skip can never fire and the kernel statically elides
    # its ~50 VPU ops per event.  Deliberately NOT updated by incremental
    # edits/reshifts (a flip would recompile the frame program); an edit
    # that empties a window merely loses an optimization, never
    # correctness.
    max_wdist: int = MAX_WDIST

    def tree_flatten(self):
        return (
            self.tw, self.twid, self.palv, self.wmap, self.wdist, self.ymax,
        ), (
            self.has_glass, self.gx, self.gy, self.gz,
            self.nwx, self.nwz, self.nky, self.max_wdist,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _cheby_dist_batch(occ: np.ndarray, cap: int) -> np.ndarray:
    """Batched exact Chebyshev (L-inf) distance transform to the nearest
    True, clamped to cap, via the two-pass 3x3 chamfer (exact for L-inf:
    every king move costs 1).  occ: (B, nx, nz) -> (B, nx, nz); the
    sequential row loop is shared across all B planes."""
    B, nx, nz = occ.shape
    d = np.where(occ, 0, cap).astype(np.int64)
    idx = np.arange(nz)

    def relax_row(r, nb):
        if nb is not None:
            r = np.minimum(r, nb + 1)
            r = np.minimum(
                r, np.concatenate((np.full((B, 1), cap), nb[:, :-1]), 1) + 1
            )
            r = np.minimum(
                r, np.concatenate((nb[:, 1:], np.full((B, 1), cap)), 1) + 1
            )
        # in-row propagation both ways: min_k r[k] + |j - k|  (1-D L1 DT,
        # which equals L-inf along a line)
        r = np.minimum(r, np.minimum.accumulate(r - idx, axis=1) + idx)
        rr = r[:, ::-1]
        r = np.minimum(
            r, (np.minimum.accumulate(rr - idx, axis=1) + idx)[:, ::-1]
        )
        return r

    for i in range(nx):
        d[:, i] = relax_row(d[:, i], d[:, i - 1] if i > 0 else None)
    for i in range(nx - 1, -1, -1):
        d[:, i] = relax_row(d[:, i], d[:, i + 1] if i < nx - 1 else None)
    return np.minimum(d, cap)


class WindowTables(NamedTuple):
    """Host-side full (pre-dedupe) window tables + the cached fields that
    make incremental edits cheap (PackBuilder)."""

    tw_full: np.ndarray     # (nw, nc*8, 128) f32 per-window chunk rows
    twid_full: np.ndarray   # (nw, 128, 128) f32 palette-index planes
    pal_full: np.ndarray    # (nw, 16) f32 palettes
    owning: np.ndarray      # (gxp, gyp, gzp) bool face-owning voxels
    dists: np.ndarray       # (nky, N_BANDS, gxp, gzp) u8 band skip fields
    wocc: np.ndarray        # (nky, nwx, nwz) bool per-window face occupancy
    wdist: np.ndarray       # (nky, nwx, nwz) i32 window-unit skip field
    has_glass: bool
    ymax: int
    gx: int
    gy: int
    gz: int
    nwx: int
    nwz: int
    nky: int

    @property
    def nw(self) -> int:
        return self.nky * self.nwx * self.nwz

    @property
    def nc(self) -> int:
        return (8 if self.has_glass else 4) + N_BANDS


def _win_dist(wocc: np.ndarray, cap: int = MAX_WDIST) -> np.ndarray:
    """Exact 3-D Chebyshev distance (window units) to the nearest
    face-occupied window; brute force over the occupied list (the window
    lattice is tiny — <= ~16x16x16 at streamed scale)."""
    nky, nwx, nwz = wocc.shape
    occ = np.argwhere(wocc)                       # (m, 3)
    if len(occ) == 0:
        return np.full(wocc.shape, cap, np.int32)
    kk = np.arange(nky)[:, None, None, None]
    xx = np.arange(nwx)[None, :, None, None]
    zz = np.arange(nwz)[None, None, :, None]
    dk = np.abs(kk - occ[None, None, None, :, 0])
    dx = np.abs(xx - occ[None, None, None, :, 1])
    dz = np.abs(zz - occ[None, None, None, :, 2])
    d = np.maximum(np.maximum(dk, dx), dz).min(axis=-1)
    return np.minimum(d, cap).astype(np.int32)


def _window_palette_rows(grid, gx, gy, gz, k, wx, wz):
    """Palette + id plane for one 32^3 window: (pal (16,) f32,
    twid (128,128) f32) — same layout/order as the full build."""
    x0, y0, z0 = wx * W, k * W, wz * W
    reg = np.zeros((W, W, W), grid.dtype)
    rx = min(W, max(gx - x0, 0))
    ry = min(W, max(gy - y0, 0))
    rz = min(W, max(gz - z0, 0))
    if rx and ry and rz:
        reg[:rx, :ry, :rz] = grid[x0:x0 + rx, y0:y0 + ry, z0:z0 + rz]
    real = reg[:rx, :ry, :rz]
    ids = np.unique(real) if real.size else np.zeros(1, grid.dtype)
    if len(ids) > MAX_PALETTE:
        return None
    pal = np.zeros(MAX_PALETTE, np.float32)
    pal[:len(ids)] = ids
    lut = np.zeros(256, np.uint8)
    for j, b in enumerate(ids):
        lut[b] = j
    pidx = lut[reg]                       # (32, 32, 32) [x, y, z]
    pair = pidx[:, 0::2, :] | (pidx[:, 1::2, :] << 4)   # (32, 16, 32)
    A = pair.transpose(1, 2, 0)           # [k4, z, x]
    A = A.reshape(N_ID_CHUNKS, ZB, ZL, W)  # [k4, zb, zl, xl]
    return pal, A.transpose(0, 2, 1, 3).reshape(128, 128).astype(np.float32)


def _mask_rows_for_window(t_win, l_win, has_glass):
    """Mask chunk rows for one window: t_win/l_win (W, W, W) bool [x,y,z]
    -> (base_b*8, 128) f32 rows (chunks 0..3 = T bytes, 4..7 = L bytes)."""
    rows = []
    for bits in (t_win, l_win) if has_glass else (t_win,):
        by = np.packbits(bits, axis=1, bitorder="little")  # (W, 4, W)
        for c in range(4):
            plane = by[:, c, :].astype(np.float32)         # (xl, z)
            A = plane.reshape(W, ZB, ZL).transpose(2, 1, 0)  # [zl, zb, xl]
            rows.append(A.reshape(ZL, ZB * W))
    return np.concatenate(rows, axis=0)


def _band_rows_for_window(plane, wx, wz):
    """One band-distance chunk row for one window from the full (gxp, gzp)
    distance plane -> (8, 128) f32."""
    sub = plane[wx * W:(wx + 1) * W, wz * W:(wz + 1) * W].astype(np.float32)
    return sub.reshape(W, ZB, ZL).transpose(2, 1, 0).reshape(ZL, ZB * W)


def build_window_tables(
    grid: np.ndarray,
    transparent: np.ndarray,
    translucent: np.ndarray,
) -> Optional[WindowTables]:
    """Vectorized full build of the host window tables; None only when the
    grid is taller than MAX_GY rows (vy packing) or some 32^3 window holds
    more than MAX_PALETTE distinct block ids."""
    grid = np.asarray(grid)
    gx, gy, gz = grid.shape
    # vy packs in 9 bits; vx/vz (and the kernel's prev-voxel word) in 10
    if gy > MAX_GY or gx > 1020 or gz > 1020:
        return None
    transparent = np.asarray(transparent, bool)
    translucent = np.asarray(translucent, bool)

    def up(n):
        return -(-n // W) * W

    gxp, gyp, gzp = up(gx), up(max(gy, 1)), up(gz)
    nwx, nky, nwz = gxp // W, gyp // W, gzp // W
    nw = nky * nwx * nwz

    # padded per-voxel class bits; padding (and rows >= gy) read air
    t_bits = np.ones((gxp, gyp, gzp), bool)
    l_bits = np.ones((gxp, gyp, gzp), bool)
    t_bits[:gx, :gy, :gz] = transparent[grid]
    l_bits[:gx, :gy, :gz] = translucent[grid]
    owning = ~t_bits
    has_glass = bool(np.any(t_bits != l_bits))

    any_y = owning.any(axis=(0, 2))
    ymax = int(gyp - np.argmax(any_y[::-1])) if any_y.any() else 0

    # ---- mask bytes via packbits: byte c of slab k = bits y=k*32+8c.. ----
    def mask_bytes(bits):
        b = np.packbits(bits, axis=1, bitorder="little")  # (gxp, gyp/8, gzp)
        return b.reshape(gxp, nky, 4, gzp).transpose(1, 2, 0, 3)

    Tb = mask_bytes(t_bits)
    Lb = mask_bytes(l_bits) if has_glass else None

    # ---- band skip fields: all (nky*N_BANDS) planes in one chamfer ----
    ow = owning.reshape(gxp, nky, N_BANDS, BAND_H, gzp).any(axis=3)
    occ = ow.transpose(1, 2, 0, 3).reshape(nky * N_BANDS, gxp, gzp)
    dists = _cheby_dist_batch(occ, MAX_SKIP).reshape(
        nky, N_BANDS, gxp, gzp
    ).astype(np.uint8)

    # ---- per-slab chunk planes -> window rows ----
    base_b = 8 if has_glass else 4
    nc = base_b + N_BANDS
    tw_parts = []
    for k in range(nky):
        chunks = [Tb[k, c].astype(np.float32) for c in range(4)]
        if has_glass:
            chunks += [Lb[k, c].astype(np.float32) for c in range(4)]
        chunks += [dists[k, b].astype(np.float32) for b in range(N_BANDS)]
        planes = np.stack(chunks, axis=0)        # (nc, gxp, gzp)
        A = planes.reshape(nc, nwx, W, nwz, ZB, ZL)
        A = A.transpose(1, 3, 0, 5, 4, 2)        # [wx, wz, nc, zl, zb, xl]
        tw_parts.append(A.reshape(nwx * nwz, nc * ZL, ZB * W))
    tw_full = np.ascontiguousarray(np.concatenate(tw_parts, axis=0))

    # ---- palettes + id planes, window-major vectorized ----
    # padded grid with sentinel 256 in padding: palettes cover REAL voxels
    gpad = np.full((gxp, gyp, gzp), 256, np.uint16)
    gpad[:gx, :gy, :gz] = grid
    Bwm = np.ascontiguousarray(
        gpad.reshape(nwx, W, nky, W, nwz, W)
        .transpose(2, 0, 4, 1, 3, 5)
        .reshape(nw, W * W * W)
    )                                            # per-window [xl, yl, zl]
    hist = np.zeros((nw, 257), np.int64)
    for w in range(nw):
        hist[w] = np.bincount(Bwm[w], minlength=257)
    present = hist[:, :256] > 0
    n_ids = present.sum(axis=1)
    if int(n_ids.max(initial=0)) > MAX_PALETTE:
        return None
    # ascending present ids first (stable argsort over ~present); empty
    # (all-padding) windows get the ids=[0] palette: all zeros
    order = np.argsort(~present, axis=1, kind="stable")[:, :MAX_PALETTE]
    slot_valid = np.arange(MAX_PALETTE)[None, :] < n_ids[:, None]
    pal_ids = np.where(slot_valid, order, 0)     # (nw, 16) block ids
    pal_full = pal_ids.astype(np.float32)
    # lut[w, id] -> palette slot; entry 256 = padding, maps like id 0
    lut = np.zeros((nw, 257), np.uint8)
    wrow = np.repeat(np.arange(nw)[:, None], MAX_PALETTE, 1)
    lut[wrow[slot_valid], pal_ids[slot_valid]] = (
        np.tile(np.arange(MAX_PALETTE, dtype=np.uint8), (nw, 1))[slot_valid]
    )
    lut[:, 256] = lut[:, 0]
    pidx = lut[np.arange(nw)[:, None], Bwm]      # (nw, 32^3) u8 slots
    # pair packing: y-local 2m (low nibble) | 2m+1 (high); window block
    # [xl, yl, zl] -> rows k4*8+zl, lanes zb*32+xl
    P = pidx.reshape(nw, W, N_ID_CHUNKS, 2, W)
    pair = P[:, :, :, 0, :] | (P[:, :, :, 1, :] << 4)   # (nw, xl, k4, z)
    A = pair.reshape(nw, W, N_ID_CHUNKS, ZB, ZL)
    A = A.transpose(0, 2, 4, 3, 1)               # [nw, k4, zl, zb, xl]
    twid_full = np.ascontiguousarray(A.reshape(nw, 128, 128).astype(
        np.float32
    ))

    # per-window face occupancy + window-granular skip field
    wocc = (
        owning.reshape(nwx, W, nky, W, nwz, W)
        .any(axis=(1, 3, 5))
        .transpose(1, 0, 2)                      # (nky, nwx, nwz)
    )
    wdist = _win_dist(wocc)

    return WindowTables(
        tw_full=tw_full, twid_full=twid_full, pal_full=pal_full,
        owning=owning, dists=dists, wocc=wocc, wdist=wdist,
        has_glass=has_glass, ymax=min(ymax, gy),
        gx=gx, gy=gy, gz=gz, nwx=nwx, nwz=nwz, nky=nky,
    )


def _nu_budget(nu: int) -> int:
    """Device unique-block capacity for nu uniques: headroom so incremental
    edits (and streamed rebuilds with similar content) keep the device
    array SHAPES stable — a changed nu would recompile the whole frame
    program."""
    return -(-(nu + max(8, nu // 4)) // 32) * 32


def _wkey(t: WindowTables, w: int) -> bytes:
    """16-byte content digest of one window's device-visible tables
    (raw-bytes keys cost ~114 KB of copies per window per re-key —
    measured 0.7 s per streamed recenter)."""
    h = hashlib.blake2b(digest_size=16)
    h.update(t.tw_full[w])
    h.update(t.twid_full[w])
    h.update(t.pal_full[w])
    return h.digest()


def build_window_pack(
    grid: np.ndarray,
    transparent: np.ndarray,
    translucent: np.ndarray,
    nu_budget: Optional[int] = None,
) -> Optional[WindowPack]:
    """Windowed tables for a grid of any size; None only when the grid is
    taller than MAX_GY rows (vy packing) or some 32^3 window holds more
    than MAX_PALETTE distinct block ids."""
    tab = build_window_tables(grid, transparent, translucent)
    if tab is None:
        return None
    return PackBuilder(tab, nu_budget=nu_budget).pack


class PackBuilder:
    """Owns the host tables + dedupe state and keeps a device WindowPack
    up to date incrementally.

    set_block edits touch exactly one window's masks/palette plus (when
    the edit flips a band's occupancy) one band's skip-distance plane —
    the device update is a handful of .at[] slot writes, not a rebuild
    (ADVICE round 1: full O(window) rebuild per edit).  Device array
    shapes are budget-padded so edits never change shapes (= never
    recompile the frame program)."""

    def __init__(self, tables: WindowTables, nu_budget: Optional[int] = None):
        self.tab = tables
        t = tables
        nw = t.nw
        # dedupe: content key -> slot, slot refcounts, per-window keys
        keys = [_wkey(t, w) for w in range(nw)]
        self.slot_of = {}
        self.wkey = keys
        wmap = np.zeros(nw, np.int32)
        keep = []
        for w, key in enumerate(keys):
            if key not in self.slot_of:
                self.slot_of[key] = len(keep)
                keep.append(w)
            wmap[w] = self.slot_of[key]
        nu = len(keep)
        self.refcount = np.bincount(wmap, minlength=nu).tolist()
        self.free_slots: list = []
        self.budget = max(nu_budget or 0, _nu_budget(nu))

        nc8 = t.tw_full.shape[1]
        tw_dev = np.zeros((self.budget, nc8, 128), np.float32)
        twid_dev = np.zeros((self.budget, 128, 128), np.float32)
        pal_dev = np.zeros((self.budget, 16), np.float32)
        keep_a = np.asarray(keep)
        tw_dev[:nu] = t.tw_full[keep_a]
        twid_dev[:nu] = t.twid_full[keep_a]
        pal_dev[:nu] = t.pal_full[keep_a]
        self.pack = WindowPack(
            tw=jnp.asarray(tw_dev, _BF16),
            twid=jnp.asarray(twid_dev, _BF16),
            palv=jnp.asarray(pal_dev.reshape(-1, 1, MAX_PALETTE), _BF16),
            wmap=jnp.asarray(wmap),
            wdist=jnp.asarray(t.wdist.reshape(-1)),
            has_glass=t.has_glass,
            ymax=jnp.int32(t.ymax),
            gx=t.gx, gy=t.gy, gz=t.gz,
            nwx=t.nwx, nwz=t.nwz, nky=t.nky,
            max_wdist=int(t.wdist.max()),
        )
        self._wmap_host = wmap

    def _alloc_slot(self) -> Optional[int]:
        if self.free_slots:
            return self.free_slots.pop()
        if len(self.refcount) < self.budget:
            self.refcount.append(0)
            return len(self.refcount) - 1
        return None

    def set_block(self, grid: np.ndarray, p, old_id: int,
                  new_id: int, transparent, translucent) -> bool:
        """Incremental single-voxel update; grid is the ALREADY-EDITED
        grid, p its grid-local coords.  Returns False when the edit needs
        a full rebuild (palette overflow, new glass in a glass-free pack,
        slot budget exhausted) — caller rebuilds via build_window_pack."""
        t = self.tab
        x, y, z = (int(v) for v in p)
        tr_o, tl_o = bool(transparent[old_id]), bool(translucent[old_id])
        tr_n, tl_n = bool(transparent[new_id]), bool(translucent[new_id])
        if (tr_n != tl_n) and not t.has_glass:
            return False

        k, wx, wz = y >> 5, x >> 5, z >> 5
        widx = (k * t.nwx + wx) * t.nwz + wz
        changed = {widx}

        own_o = not tr_o
        own_n = not tr_n
        if own_o != own_n:
            t.owning[x, y, z] = own_n
            # exact ymax from the owning cache (cheap column reduce);
            # ymax is a DEVICE scalar in the pack, so a skyline change is
            # a value update, not a recompile
            any_y = t.owning.any(axis=(0, 2))
            gyp = t.owning.shape[1]
            ymax = int(gyp - np.argmax(any_y[::-1])) if any_y.any() else 0
            ymax = min(ymax, t.gy)
            if ymax != t.ymax:
                self.tab = t = t._replace(ymax=ymax)
                self.pack = self.pack._replace(ymax=jnp.int32(ymax))
            # window-occupancy flip -> refresh the window-unit skip field
            wo_new = bool(
                t.owning[
                    wx * W:(wx + 1) * W, k * W:(k + 1) * W,
                    wz * W:(wz + 1) * W,
                ].any()
            )
            if wo_new != bool(t.wocc[k, wx, wz]):
                t.wocc[k, wx, wz] = wo_new
                t.wdist[:] = _win_dist(t.wocc)
            band = (y & (W - 1)) >> (BAND_H.bit_length() - 1)
            old_plane = t.dists[k, band]
            occ_plane = (
                t.owning[:, k * W + band * BAND_H:k * W + (band + 1) * BAND_H,
                         :]
                .any(axis=1)
            )
            # the skip field changes only when the column's band occupancy
            # flips (dist==0 iff the band owns a face there)
            if bool(occ_plane[x, z]) != bool(old_plane[x, z] == 0):
                new_plane = _cheby_dist_batch(
                    occ_plane[None], MAX_SKIP
                )[0].astype(np.uint8)
                if not np.array_equal(new_plane, old_plane):
                    diff_cols = np.argwhere(new_plane != old_plane)
                    t.dists[k, band] = new_plane
                    c = (8 if t.has_glass else 4) + band
                    for bwx, bwz in {
                        (cx >> 5, cz >> 5) for cx, cz in diff_cols
                    }:
                        bw = (k * t.nwx + bwx) * t.nwz + bwz
                        t.tw_full[bw, c * ZL:(c + 1) * ZL] = (
                            _band_rows_for_window(
                                new_plane.astype(np.float32), bwx, bwz
                            )
                        )
                        changed.add(bw)

        # masks + palette/id plane of the edited window
        x0, y0, z0 = wx * W, k * W, wz * W
        t_win = np.ones((W, W, W), bool)
        l_win = np.ones((W, W, W), bool)
        rx = min(W, t.gx - x0)
        ry = min(W, t.gy - y0)
        rz = min(W, t.gz - z0)
        sub = grid[x0:x0 + rx, y0:y0 + ry, z0:z0 + rz]
        t_win[:rx, :ry, :rz] = transparent[sub]
        l_win[:rx, :ry, :rz] = translucent[sub]
        base_b = 8 if t.has_glass else 4
        t.tw_full[widx, :base_b * ZL] = _mask_rows_for_window(
            t_win, l_win, t.has_glass
        )
        pt = _window_palette_rows(grid, t.gx, t.gy, t.gz, k, wx, wz)
        if pt is None:
            return False
        t.pal_full[widx], t.twid_full[widx] = pt

        return self._apply_changes(sorted(changed))

    def reshift(self, new_tab: WindowTables, dwin) -> bool:
        """Window-aligned streamed recenter: adopt freshly built host
        tables while REUSING every kept window's device slot.

        dwin: (dk, dwx, dwz) shift in window units — new window (k,wx,wz)
        shows the content old window (k+dk, wx+dwx, wz+dwz) held.  Kept
        windows whose bytes are unchanged (the overwhelming majority —
        only band skip fields near entered/departed content move) cost
        nothing; entered/changed windows re-dedupe and upload through the
        same one-dispatch flush as single edits.  False -> caller
        full-rebuilds (layout change or slot budget exhausted)."""
        t_old = self.tab
        if (
            new_tab.has_glass != t_old.has_glass
            or new_tab.nw != t_old.nw
            or new_tab.nwx != t_old.nwx
            or new_tab.nwz != t_old.nwz
            or new_tab.nky != t_old.nky
            or new_tab.tw_full.shape != t_old.tw_full.shape
        ):
            return False
        dk, dwx, dwz = (int(v) for v in dwin)
        nky, nwx, nwz = new_tab.nky, new_tab.nwx, new_tab.nwz
        nw = new_tab.nw

        old_wkey = self.wkey
        old_wmap = self._wmap_host
        wkey = [None] * nw
        wmap = np.zeros(nw, np.int32)
        for k in range(nky):
            ko = k + dk
            if not (0 <= ko < nky):
                continue
            for wx in range(nwx):
                xo = wx + dwx
                if not (0 <= xo < nwx):
                    continue
                for wz in range(nwz):
                    zo = wz + dwz
                    if not (0 <= zo < nwz):
                        continue
                    w_new = (k * nwx + wx) * nwz + wz
                    w_old = (ko * nwx + xo) * nwz + zo
                    wkey[w_new] = old_wkey[w_old]
                    wmap[w_new] = old_wmap[w_old]
        # rebuild slot bookkeeping from the kept windows
        refcount = [0] * len(self.refcount)
        slot_of = {}
        for w in range(nw):
            if wkey[w] is not None:
                slot = int(wmap[w])
                refcount[slot] += 1
                slot_of[wkey[w]] = slot
        self.wkey = wkey
        self._wmap_host = wmap
        self.refcount = refcount
        self.slot_of = slot_of
        self.free_slots = [
            s for s in range(len(refcount)) if refcount[s] == 0
        ]
        self.tab = new_tab
        if new_tab.ymax != t_old.ymax:
            self.pack = self.pack._replace(ymax=jnp.int32(new_tab.ymax))
        # key-diff every window: unchanged bytes cost a hash, nothing else
        return self._apply_changes(range(nw))

    # one jitted program applies a whole edit's slot writes + the new
    # window map: a single device dispatch per edit (eager per-slot
    # .at[].set calls each pay the ~25 ms dispatch round-trip on the
    # tunneled TPU).  K is padded; out-of-range pad slots are dropped.
    _FLUSH_K = 4

    @staticmethod
    @jax.jit
    def _flush_jit(tw, twid, palv, slots, twv, twidv, palvv, wmap, wdist):
        tw = tw.at[slots].set(twv, mode="drop")
        twid = twid.at[slots].set(twidv, mode="drop")
        palv = palv.at[slots].set(palvv, mode="drop")
        return tw, twid, palv, wmap, wdist

    def _apply_changes(self, wids) -> bool:
        """Re-dedupe the given windows and push slot/wmap updates to the
        device pack.  False = budget exhausted (caller full-rebuilds)."""
        t = self.tab
        wmap_h = self._wmap_host
        new_slots = []
        for w in wids:
            new_key = _wkey(t, w)
            old_key = self.wkey[w]
            if new_key == old_key:
                continue
            if old_key is not None:     # None: freshly entered window
                old_slot = int(wmap_h[w])
                self.refcount[old_slot] -= 1
                if self.refcount[old_slot] == 0:
                    del self.slot_of[old_key]
                    self.free_slots.append(old_slot)
            if new_key in self.slot_of:
                slot = self.slot_of[new_key]
            else:
                slot = self._alloc_slot()
                if slot is None:
                    return False
                self.slot_of[new_key] = slot
                new_slots.append((slot, w))
            self.refcount[slot] += 1
            self.wkey[w] = new_key
            wmap_h[w] = slot
        K = self._FLUSH_K
        tw, twid, palv = self.pack.tw, self.pack.twid, self.pack.palv
        wmap_d = jnp.asarray(wmap_h)
        wdist_d = jnp.asarray(t.wdist.reshape(-1))
        for c0 in range(0, max(len(new_slots), 1), K):
            chunk = new_slots[c0:c0 + K]
            slots = np.full(K, self.budget, np.int32)   # pad: dropped
            twv = np.zeros((K,) + t.tw_full.shape[1:], np.float32)
            twidv = np.zeros((K, 128, 128), np.float32)
            palvv = np.zeros((K, 1, MAX_PALETTE), np.float32)
            for j, (slot, w) in enumerate(chunk):
                slots[j] = slot
                twv[j] = t.tw_full[w]
                twidv[j] = t.twid_full[w]
                palvv[j, 0] = t.pal_full[w]
            tw, twid, palv, wmap_d, wdist_d = self._flush_jit(
                tw, twid, palv, jnp.asarray(slots),
                jnp.asarray(twv, _BF16), jnp.asarray(twidv, _BF16),
                jnp.asarray(palvv, _BF16), wmap_d, wdist_d,
            )
        self.pack = self.pack._replace(
            tw=tw, twid=twid, palv=palv, wmap=wmap_d, wdist=wdist_d
        )
        return True


def auto_events(pack: "WindowPack") -> int:
    """Default per-tile event budget for a scene: generous enough that
    even a RAGGED tile (small ray populations mix many windows, so window
    visits serialize) never truncates — measured: a 6k-ray bench frame
    needs between 1056 and 2048 events on its worst tile, while coherent
    presorted tiles need ~2-8 events per window-visit.  The trace loop
    exits early once every lane terminates, so over-budgeting costs
    nothing; the audit (tools/tpu_parity.py --bench) asserts the budget
    held.

    The multiplier is 6x the grid diameter: at 3x, production config-8
    frames on the 416x96x416 streamed window TRUNCATED 86,517 rays/frame
    (silent misses — a correctness gap vs the reference's exhaustive
    traversal, found by the round-5 in-frame audit); straggler tiles
    serialize tens of window visits, so the per-tile budget must cover
    visits x in-window march lengths, not one ray's diameter.  Scenes
    whose 3x diameter fits the 2048 floor keep exactly the floor (the
    flat-headline regime, audited truncation-free at 2048 — byte-
    identical budgets keep those programs' compile caches valid).
    6x still truncated 309-731 rays/frame on ladder configs 6-8; 10x is
    the audited-clean margin (the loop exits early, so the extra budget
    costs only the pathological tiles that genuinely need it)."""
    diam = pack.gx + pack.gy + pack.gz
    return 2048 if 3 * diam <= 2048 else 10 * diam


def _safe_inv(d):
    tiny = jnp.where(d >= 0, _F32(1e-30), _F32(-1e-30))
    return _F32(1.0) / jnp.where(jnp.abs(d) < 1e-30, tiny, d)


def _ctz(x):
    return 31 - jax.lax.clz(x & jax.lax.neg(x))


def _kernel(
    tw_ref, twid_ref, palv_ref, wmap_ref, wd_ref, ym_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
    pa_ref, pb_ref, t_ref, st_ref, *scratch,
    gx: int, gy: int, gz: int, nwx: int, nwz: int, nky: int,
    t_min: float, t_max: float, max_events: int, air_id: int,
    has_glass: bool, n_win: int = 1, use_wskip: bool = True,
    use_bskip: bool = True, unroll: int = 1, skip_stride: int = 1,
    hbm_tables: bool = False,
    force_events: bool = False, debug_stats: bool = False,
):
    # hbm_tables: tw/twid stay in HBM (pltpu.ANY) and each resident
    # window's (nc*8, 128) block is DMAed into a VMEM scratch at visit
    # start — the table no longer has to fit in the ~16 MB VMEM, so
    # streamed-scale worlds (21+ MB of deduplicated windows) trace with
    # the same kernel.  The DMA wait is paid once per WINDOW VISIT; with
    # n_win == 1 a cross-visit PREFETCH double-buffer hides it: while a
    # visit marches window A, the next-most-populated window B's block
    # streams into the other scratch slot, and the next visit (usually B)
    # starts without waiting (VERDICT r4 #1, the streamed-window DMA tax).
    if hbm_tables:
        tw_scr, tw_sem, id_scr, id_sem = scratch
    prefetch = hbm_tables and n_win == 1
    ymax = ym_ref[0]               # runtime skyline bound (SMEM scalar)
    R, T = ox_ref.shape
    n_all = R * T
    nw = nky * nwx * nwz
    base_b = 8 if has_glass else 4
    nc = base_b + N_BANDS
    f32 = functools.partial(jnp.full, (R, T), dtype=_F32)
    i32 = functools.partial(jnp.full, (R, T), dtype=_I32)

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    # per-lane minimum t: phase resume passes each truncated ray's progress
    # so the trace continues exactly where the budgeted phase stopped
    tm = jnp.maximum(tm_ref[:], _F32(t_min))

    valid = (dx != 0.0) | (dy != 0.0) | (dz != 0.0)
    ivx, ivy, ivz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    mx = jnp.abs(dx) > 1e-30
    my = jnp.abs(dy) > 1e-30
    mz = jnp.abs(dz) > 1e-30
    sx = jnp.where(dx > 0, 1, jnp.where(dx < 0, -1, 0)).astype(_I32)
    sy = jnp.where(dy > 0, 1, jnp.where(dy < 0, -1, 0)).astype(_I32)
    sz = jnp.where(dz > 0, 1, jnp.where(dz < 0, -1, 0)).astype(_I32)
    up = sy > 0
    # per-ray loop invariants hoisted out of the event
    sxp = (sx > 0).astype(_I32)
    szp = (sz > 0).astype(_I32)
    vert_face_ent = 2 + (-sy > 0).astype(_I32)

    def slab(p, inv, dim, moving):
        a = (0.0 - p) * inv
        b = (dim - p) * inv
        near = jnp.where(moving, jnp.minimum(a, b), -_INF)
        far = jnp.where(moving, jnp.maximum(a, b), _INF)
        return near, far

    nx_, fx_ = slab(ox, ivx, _F32(gx), mx)
    ny_, fy_ = slab(oy, ivy, _F32(gy), my)
    nz_, fz_ = slab(oz, ivz, _F32(gz), mz)
    t_near = jnp.maximum(nx_, jnp.maximum(ny_, nz_))
    t_far = jnp.minimum(fx_, jnp.minimum(fy_, fz_))
    t_entry = jnp.maximum(t_near, tm)
    limit = jnp.minimum(t_far, _F32(t_max))
    active0 = valid & (t_entry <= limit)

    tn = t_entry + _F32(_NUDGE)
    # sky early-out (see column_trace round-1 docstring): nothing solid at
    # y >= ymax, so a non-descending ray already above it can never hit
    sky0 = (dy >= 0.0) & ((oy + dy * tn) >= ymax.astype(_F32))
    active0 = active0 & ~sky0
    active0 = active0 & (my | ((oy >= 0.0) & (oy < _F32(gy))))
    cx0 = jnp.floor(jnp.clip(ox + dx * tn, -2.0, gx + 1.0)).astype(_I32)
    y0 = jnp.floor(jnp.clip(oy + dy * tn, -2.0, gy + 1.0)).astype(_I32)
    cz0 = jnp.floor(jnp.clip(oz + dz * tn, -2.0, gz + 1.0)).astype(_I32)

    # rays starting outside evaluate the grid-entry crossing as their first
    # event's entry check (prev voxel = outside = air; dda_trace:271-278).
    # A resumed ray (tm past the grid entry) starts "inside": its entry
    # crossing was processed in an earlier phase.
    starts_outside = t_near > tm
    entry_x = starts_outside & (nx_ >= ny_) & (nx_ >= nz_)
    entry_y = starts_outside & ~entry_x & (ny_ >= nz_)
    eaxis = jnp.where(entry_x, 0, jnp.where(entry_y, 1, 2)).astype(_I32)
    es = jnp.where(entry_x, sx, jnp.where(entry_y, sy, sz))
    # es != 0 on the chosen entry axis for any valid outside-starting ray
    # (non-moving axes contribute -INF to t_near), so the exit face is
    # face_ent0 ^ 1 and is not packed
    face_ent0 = eaxis * 2 + (-es > 0).astype(_I32)
    t_in0 = jnp.where(starts_outside, t_near, t_entry)

    # vertical GRID exit time (constant per ray; bounds band-skip landings)
    y_exit_bound = jnp.where(up, _F32(gy), _F32(0.0))
    t_vert_g = jnp.where(my, (y_exit_bound - oy) * ivy, _INF)

    # (bf16 one-hot compares would halve the build cost but Mosaic on v5e
    # rejects bf16 vector cmpf — and i8/i16 compares too; see extract()
    # for the measured one-hot build forms)
    if _OH_MODE == "cmp":
        iota_zbxl = jax.lax.broadcasted_iota(_I32, (ZB * W, n_all), 0)
    else:
        iota_zb = jax.lax.broadcasted_iota(_I32, (ZB, n_all), 0)
        iota_xl = jax.lax.broadcasted_iota(_I32, (W, n_all), 0)
    iota_row = jax.lax.broadcasted_iota(_I32, (128, n_all), 0)
    iota_pal = jax.lax.broadcasted_iota(_I32, (MAX_PALETTE, n_all), 0)

    # Carried per-lane state is PACKED into 11 vregs (the naive layout is
    # ~30): the event's ~200 single-vreg VPU ops were measured at ~4x their
    # issue-rate lower bound (docs/PERF.md roofline) — register spills from
    # the wide while_loop carry are the prime suspect, and every live vreg
    # removed is spill traffic removed.  Layouts:
    #   flags: active(0) | have_entry(1) | prev_t(2) | prev_l(3)
    #          | face_ent(4..6)  (the EXIT face is always face_ent ^ 1 —
    #          a crossing's two faces share the axis and differ in sign —
    #          so it is derived at use instead of packed/carried)
    #   ppos:  pcx+2(0..9) | pcz+2(10..19) | py+2(20..28)  (prev voxel)
    #   o_pa:  hit(0) | entered(1) | face(2..4) | vy+2(5..13)  (owner and
    #          truncated bits are appended post-loop)
    #   o_pb:  vx+2(0..9) | vz+2(10..19)
    #   mst:   slot+1(0..3) | inside(4) | march(5)  (march metadata; the
    #          window base coords derive from the position: x0 = cx & -32)
    flags0 = (
        active0.astype(_I32)
        | jax.lax.shift_left((starts_outside & active0).astype(_I32), 1)
        | (1 << 2) | (1 << 3)                      # outside = air
        | jax.lax.shift_left(face_ent0, 4)
    )
    ppos0 = (
        (cx0 + 2)
        | jax.lax.shift_left(cz0 + 2, 10)
        | jax.lax.shift_left(y0 + 2, 20)
    )
    state = dict(
        i=jnp.int32(0),
        cx=cx0, y=y0, cz=cz0,
        t_in=t_in0,
        flags=flags0,
        ppos=ppos0,
        o_pa=jnp.zeros((R, T), _I32),
        o_pb=jnp.zeros((R, T), _I32),
        o_t=f32(_INF),
        # march mask/slot: computed ONCE per event (at visit start, then at
        # the end of each event for the next one), not twice (cond + body)
        mst=jnp.zeros((R, T), _I32),
        more=jnp.int32(0),
    )
    if debug_stats:
        state["nm"] = jnp.int32(0)      # marching-lane count over all events
        state["nv"] = jnp.int32(0)      # outer-loop window visits
    if prefetch:
        state["pfid"] = jnp.int32(_BIG)   # window id in flight (or none)
        state["pfslot"] = jnp.int32(0)    # scratch slot it lands in
        if debug_stats:
            state["nph"] = jnp.int32(0)   # prefetch prediction hits

    def win_of(cx, y, cz):
        return ((y >> 5) * nwx + (cx >> 5)) * nwz + (cz >> 5)

    def in_grid(cx, y, cz):
        # unsigned trick: 0 <= v < n is one compare on the u32 bit pattern
        def inb(v, n):
            return pltpu.bitcast(v, jnp.uint32) < jnp.uint32(n)

        return inb(cx, gx) & inb(cz, gz) & inb(y, gy)

    def outer_cond(s):
        if force_events:
            return s["i"] < max_events
        return (s["i"] < max_events) & jnp.any((s["flags"] & 1) != 0)

    def outer_body(s):
        act = (s["flags"] & 1) != 0
        inside = in_grid(s["cx"], s["y"], s["cz"])
        wr = jnp.where(act & inside, win_of(s["cx"], s["y"], s["cz"]), _BIG)
        # k distinct resident windows (min, next-min, ...); empty slots stay
        # at _BIG, which no lane's window id ever equals.  Each resident
        # window keeps the proven (nc*8,128)@(128,n) extraction shape; the
        # k partial products are summed (every lane's one-hot is nonzero in
        # at most one window, so the sum is exact).  Marching lanes scale
        # ~k x on divergent tiles while the per-event VPU scan logic stays
        # shared (the whole point: occupancy, docs/PERF.md roofline).
        wl = []
        rem = wr
        for j in range(n_win):
            wj = jnp.min(rem)                      # scalar; _BIG when none
            wl.append(wj)
            if j + 1 < n_win:
                rem = jnp.where(rem == wj, _BIG, rem)
        if prefetch:
            # cross-visit DMA double-buffer (n_win == 1): retire the
            # in-flight prefetch, use its slot when it predicted this
            # visit's window (the usual case — the next visit's window is
            # the next-most-populated among currently-active lanes), else
            # fetch synchronously into the other slot; then start the
            # NEXT visit's predicted block streaming while this visit
            # marches.
            w0 = wl[0]
            pfid = s["pfid"]
            pfslot = s["pfslot"]

            @pl.when(pfid != _BIG)
            def _retire():
                # wait() only accounts the copy's byte count against the
                # semaphore; all blocks share one shape, so a canonical
                # descriptor retires whichever slot is in flight
                pltpu.make_async_copy(
                    tw_ref.at[0], tw_scr.at[0], tw_sem
                ).wait()

            pf_hit = pfid == w0
            cur = jnp.where(pf_hit, pfslot, 1 - pfslot)

            @pl.when(~pf_hit & (w0 != _BIG))
            def _fetch():
                cp = pltpu.make_async_copy(
                    tw_ref.at[wmap_ref[jnp.clip(w0, 0, nw - 1)]],
                    tw_scr.at[cur], tw_sem,
                )
                cp.start()
                cp.wait()

            # predict the NEXT visit's window: the smallest distinct
            # window id among active lanes not in w0 (the same id the
            # next outer iteration's min picks unless this visit's
            # marches overtake it — measured hit rate in debug_stats)
            w1 = jnp.min(jnp.where(wr == w0, _BIG, wr))

            @pl.when(w1 != _BIG)
            def _prefetch():
                pltpu.make_async_copy(
                    tw_ref.at[wmap_ref[jnp.clip(w1, 0, nw - 1)]],
                    tw_scr.at[1 - cur], tw_sem,
                ).start()

            s = dict(s)
            s["pfid"] = jnp.where(w1 != _BIG, w1, _BIG)
            s["pfslot"] = 1 - cur
            if debug_stats:
                s["nph"] = s["nph"] + pf_hit.astype(_I32)
            blks = [
                jax.lax.cond(
                    cur == 0, lambda: tw_scr[0], lambda: tw_scr[1]
                )
            ]
        elif hbm_tables:
            # one DMA per resident window; ALL copies start before any
            # wait so the k latencies overlap (round-5: the old serial
            # start/wait paid k round trips per visit).  Empty slots
            # (wj == _BIG: fewer live windows than n_win) skip the copy —
            # their one-hot is all-zero regardless of the scratch's stale
            # contents, so only the wasted HBM bandwidth is at stake
            # (ADVICE r2)
            for j, wj in enumerate(wl):
                @pl.when(wj != _BIG)
                def _start(j=j, wj=wj):
                    pltpu.make_async_copy(
                        tw_ref.at[wmap_ref[jnp.clip(wj, 0, nw - 1)]],
                        tw_scr.at[j], tw_sem,
                    ).start()
            blks = []
            for j, wj in enumerate(wl):
                @pl.when(wj != _BIG)
                def _wait(j=j, wj=wj):
                    pltpu.make_async_copy(
                        tw_ref.at[0], tw_scr.at[j], tw_sem
                    ).wait()
                blks.append(tw_scr[j])
        else:
            blks = [tw_ref[wmap_ref[jnp.clip(wj, 0, nw - 1)]] for wj in wl]
        # window-unit skip radius: scalar metadata per resident window
        # (SMEM read — zero extraction cost)
        dws = [wd_ref[jnp.clip(wj, 0, nw - 1)] for wj in wl]

        def march_mask(cx, y, cz, active, more=None):
            """Packed march state: slot+1 (0 = unmatched) | inside | march.
            Window base coords are NOT carried — a matched lane's window
            base is just its position rounded down (x0 = cx & -32).  Lanes
            may hop BETWEEN resident windows mid-inner-loop and keep
            marching.  `more` (the cross-lane reduction feeding
            inner_cond) is only recomputed when the caller needs it — the
            non-final copies of an unrolled event group carry the stale
            scalar instead of paying the reduction."""
            ins = in_grid(cx, y, cz)
            wv = jnp.where(ins, win_of(cx, y, cz), -1)
            slotp = i32(0)
            for j, wj in enumerate(wl):
                slotp = jnp.where(wv == wj, j + 1, slotp)
            march = active & ((slotp > 0) | ~ins)
            mst = (
                slotp
                | jax.lax.shift_left(ins.astype(_I32), 4)
                | jax.lax.shift_left(march.astype(_I32), 5)
            )
            if more is None:
                # only compared against zero: an OR-tree any() beats the
                # add-tree count
                more = jnp.any(march).astype(_I32)
            return dict(mst=mst, more=more)

        def inner_cond(s2):
            if force_events:
                return s2["i"] < max_events
            return (s2["more"] != 0) & (s2["i"] < max_events)

        def event(s2, need_more=True, with_skips=True):
            # with_skips=False statically drops the skip candidate math
            # AND the band channels' z-select from THIS event copy; the
            # group() unroll alternates full/lean copies (skip_stride) —
            # a missed skip opportunity costs one cheap event, never
            # correctness (skips are exact empty-space jumps)
            bsk = use_bskip and with_skips
            cx, y, cz = s2["cx"], s2["y"], s2["cz"]
            t_in = s2["t_in"]
            flags = s2["flags"]
            mst = s2["mst"]
            march = (mst & 32) != 0
            inside = (mst & 16) != 0
            slotp = mst & 15
            matched = slotp > 0
            # window base = position rounded to the 32-lattice; only lanes
            # whose positions genuinely sit in a window (matched/inside)
            # ever read these where correctness matters
            x0v = cx & -32
            z0v = cz & -32
            ybv = y & -32
            bound_up = jnp.minimum(ybv + W, gy)
            bound_up_f = bound_up.astype(_F32)
            ybase_f = ybv.astype(_F32)

            # ---- windowed chunk extraction: one (nc*8,128)@(128,n) MXU
            # matmul PER RESIDENT WINDOW, partial products summed (each
            # lane's one-hot lives in exactly one window's slot), + an
            # 8-row z-masked reduce (tools/roofline.py `win`)
            xl = cx - x0v
            zrel = cz - z0v

            def extract(j):
                # One-hot build (the event's largest VPU block).  Three
                # measured forms (round-5 event diet, _OH_MODE):
                #   cmp    — (128, n) i32 compare + convert (round-4 form)
                #   outer3d— factorized (ZB,1,n)*(1,W,n) outer product
                #   concat — factorized, per-zb (1,n)*(W,n) rows stacked
                # The factorized forms build ~36 compare rows + 128 bf16
                # product rows instead of 128 compare+convert rows; the
                # i8/i16 narrow-compare route is REJECTED by Mosaic on
                # v5e.  NOTE: Mosaic requires a 32-bit matmul accumulator
                # (a bf16 acc fails verification), so the z-reduce runs
                # in f32.
                okj = slotp == j + 1
                if _OH_MODE == "cmp":
                    code_j = jnp.where(
                        okj, jax.lax.shift_left(zrel >> 3, 5) + xl, -1
                    )
                    oh = (
                        iota_zbxl == code_j.reshape(1, n_all)
                    ).astype(_BF16)
                else:
                    zb_j = jnp.where(okj, zrel >> 3, -1)
                    xl_j = jnp.where(okj, xl, -1)
                    oh_z = (
                        iota_zb == zb_j.reshape(1, n_all)
                    ).astype(_BF16)
                    oh_x = (
                        iota_xl == xl_j.reshape(1, n_all)
                    ).astype(_BF16)
                    if _OH_MODE == "outer3d":
                        oh = (
                            oh_z.reshape(ZB, 1, n_all)
                            * oh_x.reshape(1, W, n_all)
                        ).reshape(ZB * W, n_all)
                    else:
                        oh = jnp.concatenate(
                            [oh_z[z:z + 1] * oh_x for z in range(ZB)],
                            axis=0,
                        )
                return jnp.dot(blks[j], oh, preferred_element_type=_F32)

            a = extract(0)
            for j in range(1, n_win):
                # resident slots beyond the tile's live window count are
                # _BIG; their one-hot is all-zero, so the matmul is an
                # exact no-op — branch around it (and the one-hot build)
                # so coherent tiles don't pay k matmuls for 1-2 windows
                a = a + jax.lax.cond(
                    wl[j] != _BIG,
                    functools.partial(extract, j),
                    lambda: jnp.zeros_like(a),
                )
            # z-local row select: exactly one of the ZL=8 rows per channel
            # is wanted (row zrel&7), so a log2(ZL)-stage binary select
            # replaces the old one-hot mul+sum (8 muls + 7 adds per
            # channel -> 3 selects over halving row counts — ~half the
            # vreg-ops of the event's second-biggest block)
            # with band skips statically elided the band-distance channels
            # are never read: skip their select (the matmul row cost is
            # unchanged — they live in the same table block)
            n_ch = nc if bsk else base_b
            zlr = (zrel & 7).reshape(1, n_all)
            sel = a[: n_ch * ZL].reshape(n_ch, ZL, n_all)
            h = ZL
            while h > 1:
                h //= 2
                bit = (zlr & h) != 0
                sel = jnp.where(bit.reshape(1, 1, n_all),
                                sel[:, h:2 * h], sel[:, :h])
            ch = [sel[c, 0].reshape(R, T).astype(_I32)
                  for c in range(n_ch)]

            Tm = (ch[0] | jax.lax.shift_left(ch[1], 8)
                  | jax.lax.shift_left(ch[2], 16)
                  | jax.lax.shift_left(ch[3], 24))
            if has_glass:
                Lm = (ch[4] | jax.lax.shift_left(ch[5], 8)
                      | jax.lax.shift_left(ch[6], 16)
                      | jax.lax.shift_left(ch[7], 24))
            else:
                Lm = Tm
            all1 = jnp.full_like(Tm, -1)
            Tm = jnp.where(inside, Tm, all1)       # out-of-grid = air
            Lm = Tm if not has_glass else jnp.where(inside, Lm, all1)
            bands = ch[base_b:base_b + N_BANDS] if bsk else None
            notT = ~Tm

            yl = y - ybv       # ybv = y & -32, so yl = y & 31: ALWAYS 0..31

            def bit_at(mask, yy):
                # yy is in [0, 31] by construction (yl and the clipped
                # y_out); out-of-grid lanes read all-ones masks where any
                # row is air, exactly the old out-of-range convention
                return jax.lax.shift_right_logical(mask, yy) & 1

            bit_t = bit_at(Tm, yl)
            bit_l = bit_at(Lm, yl)

            # ---- pending crossing at t_in (face between prev voxel and
            # this position; dda hit rule, enter beats exit).  Vertical
            # slab switches arrive here with prev bits from the departed
            # slab's boundary row, so the mesher face rule is exact across
            # slab boundaries with no context chunks.
            prev_t = jax.lax.shift_right_logical(flags, 2) & 1
            prev_l = jax.lax.shift_right_logical(flags, 3) & 1
            e_enter = (bit_t == 0) & (prev_l == 1)
            e_exit = (prev_t == 0) & (bit_l == 1)
            e_hit = (
                march & ((flags & 2) != 0) & (e_enter | e_exit)
                & (t_in >= _F32(t_min)) & (t_in <= limit)
            )

            # ---- column exit ----
            tx = jnp.where(mx, ((cx + sxp).astype(_F32) - ox) * ivx, _INF)
            tz = jnp.where(mz, ((cz + szp).astype(_F32) - oz) * ivz, _INF)
            t_exit = jnp.minimum(tx, tz)

            # ---- vertical slab boundary (grid exit or slab switch) ----
            bound = jnp.where(up, bound_up_f, ybase_f)
            # select through i32: Mosaic cannot lower an i8->i1 trunc on a
            # vector select between bools
            grid_exit = jnp.where(
                up,
                (bound_up >= gy).astype(_I32),
                (ybv <= 0).astype(_I32),
            ) != 0
            # clamp: out-of-grid lanes above the grid can see
            # bound_up <= ybv (their window base snaps to y & -32), and a
            # negative shift amount is undefined even when discarded
            top_row = jnp.clip(bound_up - 1 - ybv, 0, W - 1)
            t_slab = jnp.where(my, (bound - oy) * ivy, _INF)
            t_scan_end = jnp.minimum(
                jnp.minimum(t_exit, limit), t_slab
            )

            # ---- in-column y crossings: bit scan over slab-local rows
            y_at = jnp.clip(
                oy + dy * (t_scan_end - _F32(_NUDGE)),
                ybase_f - 1.0, ybase_f + _F32(W),
            )
            y_out = jnp.where(
                my,
                jnp.clip(jnp.floor(y_at).astype(_I32), ybv, ybv + W - 1),
                y,
            )
            yl_out = y_out - ybv
            # scan-range mask: bits (min+1 .. max) of the slab-local span.
            # (-2 << lo) has bits lo+1..31 set; clearing (-2 << hi) leaves
            # exactly (lo+1 .. hi); empty when lo == hi.  Both operands are
            # in [0, 31] by construction (yl = y & 31, y_out clipped).
            lo_m = jnp.minimum(yl, yl_out)
            hi_m = jnp.maximum(yl, yl_out)
            m2 = jnp.full_like(yl, -2)
            wmask = jax.lax.shift_left(m2, lo_m) & ~jax.lax.shift_left(
                m2, hi_m)
            A1 = notT & jax.lax.shift_left(Lm, 1)   # face owner=b (DOWN)
            A2 = jax.lax.shift_left(notT, 1) & Lm   # owner=b-1 (UP)
            C = (A1 | A2) & wmask
            has_c = C != 0
            c_safe = jnp.where(has_c, C, jnp.ones_like(C))
            bstar = jnp.where(up, _ctz(c_safe), 31 - jax.lax.clz(c_safe))
            a1_at = jax.lax.shift_right_logical(A1, bstar) & 1
            a2_at = jax.lax.shift_right_logical(A2, bstar) & 1
            y_entered = (up & (a1_at == 1)) | (~up & (a2_at == 1))
            y_is_a1 = (up & (a1_at == 1)) | (~up & ~(a2_at == 1))
            y_owner = ybv + jnp.where(y_is_a1, bstar, bstar - 1)
            y_face = jnp.where(y_is_a1, 2, 3)       # DOWN / UP
            t_y = ((ybv + bstar).astype(_F32) - oy) * ivy
            y_hit = (
                march & ~e_hit & has_c
                & (t_y >= _F32(t_min)) & (t_y <= limit)
            )

            # ---- vertical boundary reach ----
            v_reach = my & (t_slab <= t_exit) & (t_slab <= limit) & (
                t_slab >= _F32(t_min))
            # arithmetic >> is fine: &1 isolates the bit either way
            v_bit = jnp.where(up, (notT >> top_row) & 1, notT & 1)
            # grid-boundary exit back-face (neighbor beyond grid = air,
            # mesher rule always satisfied)
            v_hit = (
                march & ~e_hit & ~y_hit & inside & v_reach & grid_exit
                & (v_bit == 1)
            )

            new_hit = e_hit | y_hit | v_hit
            hit_t = jnp.where(e_hit, t_in, jnp.where(y_hit, t_y, t_slab))
            fent_f = jax.lax.shift_right_logical(flags, 4) & 7
            hit_face = jnp.where(
                e_hit,
                # a crossing's exit face = its entry face with the sign
                # bit flipped (same axis, opposite side)
                jnp.where(e_enter, fent_f, fent_f ^ 1),
                jnp.where(y_hit, y_face, jnp.where(up, 3, 2)),
            )
            # vy+2 (9 bits, the o_pa field): exit crossings reuse ppos's
            # already-packed py+2 bits verbatim
            vy2 = jnp.where(
                e_hit,
                jnp.where(
                    e_enter, y + 2,
                    jax.lax.shift_right_logical(s2["ppos"], 20) & 511,
                ),
                jnp.where(
                    y_hit, y_owner + 2,
                    jnp.where(up, bound_up + 1, i32(2)),
                ),
            )
            hit_ent = (e_hit & e_enter) | (~e_hit & y_hit & y_entered)

            # ---- advance: band skip / whole-window skip (merged landing
            # computation: candidates are chosen on their t values FIRST,
            # then ONE floor/clip chain computes the landing cell with
            # per-candidate clip bounds — half the old chain count).
            # Statically ELIDED (use_bskip=False) to trade skip coverage
            # for a leaner event: in dense volumetric worlds skips rarely
            # fire (docs/PERF.md) but their candidate math runs every
            # event; sweep the trade with tools/trace_tune.py --skips. ----
            if bsk:
              band = yl >> (BAND_H.bit_length() - 1)
              d_here = bands[0]
              for bi in range(1, N_BANDS):
                d_here = jnp.where(band == bi, bands[bi], d_here)
              can_skip = inside & (d_here >= 2)
              rf = (d_here - 1).astype(_F32)
              ex = jnp.where(
                mx,
                ((cx.astype(_F32) + jnp.where(sx > 0, rf + 1.0, -rf)) - ox)
                * ivx,
                _INF,
              )
              ez = jnp.where(
                mz,
                ((cz.astype(_F32) + jnp.where(sz > 0, rf + 1.0, -rf)) - oz)
                * ivz,
                _INF,
              )
              t_sq = jnp.minimum(ex, ez)
              bnd = ybv + jnp.where(up, (band + 1) * BAND_H, band * BAND_H)
              t_bnd = jnp.where(my, (bnd.astype(_F32) - oy) * ivy, _INF)
              sel1 = t_sq <= t_bnd
              sel2 = ~sel1 & (t_bnd + _F32(2 * _NUDGE) <= t_sq)
              t_land = jnp.where(
                sel1, t_sq - _F32(_NUDGE), t_bnd + _F32(_NUDGE)
              )
              do_skip = (
                can_skip & (sel1 | sel2) & (t_land >= t_exit)
                & (t_land > t_in)
              )
              sel2 = do_skip & sel2
              r_i = d_here - 1
              lo_x, hi_x = cx - r_i, cx + r_i
              lo_z, hi_z = cz - r_i, cz + r_i
              lo_y = ybv + band * BAND_H
              hi_y = lo_y + (BAND_H - 1)

            if bsk and use_wskip:
                # ---- whole-window skip: the resident window's wdist
                # bounds an empty L-inf ball of 32^3 windows; one event
                # jumps to just before the first window that may hold
                # faces — the sky/secondary-bounce regime the per-band
                # in-plane field cannot cross.  Statically ELIDED when the
                # pack was built with every window face-occupied
                # (max_wdist == 0, the volumetric-worldgen regime).
                dwv = i32(0)
                for j, dw_j in enumerate(dws):
                    dwv = jnp.where(slotp == j + 1, dw_j, dwv)
                can_wskip = inside & matched & (dwv >= 1)
                rwf = ((dwv - 1) * W).astype(_F32)
                exw = jnp.where(
                    mx,
                    ((x0v.astype(_F32)
                      + jnp.where(sx > 0, rwf + _F32(W), -rwf)) - ox) * ivx,
                    _INF,
                )
                ezw = jnp.where(
                    mz,
                    ((z0v.astype(_F32)
                      + jnp.where(sz > 0, rwf + _F32(W), -rwf)) - oz) * ivz,
                    _INF,
                )
                eyw = jnp.where(
                    my,
                    ((ybv.astype(_F32)
                      + jnp.where(up, rwf + _F32(W), -rwf)) - oy) * ivy,
                    _INF,
                )
                tw_land = (
                    jnp.minimum(jnp.minimum(exw, ezw), eyw) - _F32(_NUDGE)
                )
                do_wskip = (
                    can_wskip & (tw_land >= t_exit) & (tw_land > t_in)
                )
                # prefer whichever safe jump lands farther
                use_w = do_wskip & (
                    ~do_skip | (tw_land > t_land) | sel2
                )
                sel2 = sel2 & ~use_w
                t_land = jnp.where(use_w, tw_land, t_land)
                do_skip = do_skip | use_w
                r_w = (dwv - 1) * W
                lo_x = jnp.where(use_w, x0v - r_w, lo_x)
                hi_x = jnp.where(use_w, x0v + r_w + (W - 1), hi_x)
                lo_y = jnp.where(use_w, ybv - r_w, lo_y)
                hi_y = jnp.where(use_w, ybv + r_w + (W - 1), hi_y)
                lo_z = jnp.where(use_w, z0v - r_w, lo_z)
                hi_z = jnp.where(use_w, z0v + r_w + (W - 1), hi_z)

            if bsk:
              s_cx = jnp.clip(
                jnp.floor(
                    jnp.clip(ox + dx * t_land, -2.0, gx + 1.0)
                ).astype(_I32),
                lo_x, hi_x,
              )
              s_y = jnp.where(
                sel2,
                jnp.where(up, bnd, bnd - 1),
                jnp.clip(
                    jnp.floor(
                        jnp.clip(oy + dy * t_land, -2.0, gy + 1.0)
                    ).astype(_I32),
                    lo_y, hi_y,
                ),
              )
              s_cz = jnp.clip(
                jnp.floor(
                    jnp.clip(oz + dz * t_land, -2.0, gz + 1.0)
                ).astype(_I32),
                lo_z, hi_z,
              )

            # vertical slab switch (not a grid exit): pending vertical
            # entry crossing; prev bits = the departed slab's boundary row
            v_sw = v_reach & ~grid_exit
            if bsk:
                v_sw = v_sw & ~do_skip
            vs_y = jnp.where(up, bound_up, ybv - 1)
            b_bit_t = jnp.where(
                up, jax.lax.shift_right_logical(Tm, 31) & 1, Tm & 1
            )
            b_bit_l = jnp.where(
                up, jax.lax.shift_right_logical(Lm, 31) & 1, Lm & 1
            )

            use_x = tx <= tz                        # dda axis priority
            n_cx = cx + jnp.where(use_x, sx, 0)
            n_cz = cz + jnp.where(use_x, 0, sz)
            stp = jnp.where(use_x, sx, sz)
            n_axis = jnp.where(use_x, 0, 2)
            prev_t_n = bit_at(Tm, yl_out)
            prev_l_n = bit_at(Lm, yl_out)

            if bsk:
                ncx = jnp.where(v_sw, cx, jnp.where(do_skip, s_cx, n_cx))
                ny = jnp.where(v_sw, vs_y, jnp.where(do_skip, s_y, y_out))
                ncz = jnp.where(v_sw, cz, jnp.where(do_skip, s_cz, n_cz))
                nt_in = jnp.where(
                    v_sw, t_slab,
                    jnp.where(do_skip, jnp.where(sel2, t_bnd, t_land),
                              t_exit),
                )
                n_have = v_sw | ~do_skip | sel2
                n_pt = jnp.where(
                    v_sw, b_bit_t, jnp.where(do_skip, 1, prev_t_n))
                n_pl = jnp.where(
                    v_sw, b_bit_l, jnp.where(do_skip, 1, prev_l_n))
                vsel = v_sw | sel2
            else:
                # no skips: the only non-column advance is the slab switch
                ncx = jnp.where(v_sw, cx, n_cx)
                ny = jnp.where(v_sw, vs_y, y_out)
                ncz = jnp.where(v_sw, cz, n_cz)
                nt_in = jnp.where(v_sw, t_slab, t_exit)
                n_have = None                      # constant True
                n_pt = jnp.where(v_sw, b_bit_t, prev_t_n)
                n_pl = jnp.where(v_sw, b_bit_l, prev_l_n)
                vsel = v_sw
            n_fent = jnp.where(
                vsel, vert_face_ent, n_axis * 2 + (-stp > 0).astype(_I32))
            n_py = jnp.where(
                v_sw, jnp.where(up, bound_up - 1, ybv), y_out)

            vert_term = v_reach & grid_exit
            act_n = (
                march & ~new_hit & inside
                & (nt_in <= limit)
                & ~((ny >= ymax) & (sy >= 0))
            )
            if bsk:
                vert_term = vert_term & ~do_skip
                act_n = act_n & (~do_skip | (t_land < t_vert_g))
            act_n = act_n & ~vert_term
            nflags = (
                act_n.astype(_I32)
                | (jax.lax.shift_left(n_have.astype(_I32), 1)
                   if bsk else 2)
                | jax.lax.shift_left(n_pt, 2)
                | jax.lax.shift_left(n_pl, 3)
                | jax.lax.shift_left(n_fent, 4)
            )
            # prev voxel = CURRENT cell (cx, cz always >= -2 so the +2
            # offsets are non-negative; py can wander below -2 on outside
            # lanes whose window base snapped down, so it alone clips)
            xz2 = (cx + 2) | jax.lax.shift_left(cz + 2, 10)
            nppos = (
                xz2 | jax.lax.shift_left(jnp.clip(n_py + 2, 0, 511), 20)
            )

            rec = new_hit
            pa_new = (
                1
                | jax.lax.shift_left(hit_ent.astype(_I32), 1)
                | jax.lax.shift_left(hit_face, 2)
                | jax.lax.shift_left(jnp.clip(vy2, 0, 511), 5)
            )
            # exit crossings record the PREV voxel, whose +2-offset coords
            # sit in ppos bits 0..19 in exactly o_pb's layout
            pb_new = jnp.where(
                e_hit & ~e_enter, s2["ppos"] & 0xFFFFF, xz2,
            )

            out = dict(s2)
            out["cx"] = jnp.where(march, ncx, cx)
            out["y"] = jnp.where(march, ny, y)
            out["cz"] = jnp.where(march, ncz, cz)
            out["t_in"] = jnp.where(march, nt_in, t_in)
            out["flags"] = jnp.where(march, nflags, flags)
            out["ppos"] = jnp.where(march, nppos, s2["ppos"])
            out["o_pa"] = jnp.where(rec, pa_new, s2["o_pa"])
            out["o_pb"] = jnp.where(rec, pb_new, s2["o_pb"])
            out["o_t"] = jnp.where(rec, hit_t, s2["o_t"])
            out["i"] = s2["i"] + 1
            out.update(march_mask(out["cx"], out["y"], out["cz"],
                                  (out["flags"] & 1) != 0,
                                  more=None if need_more else s2["more"]))
            if debug_stats:
                out["nm"] = s2["nm"] + jnp.sum(march.astype(_I32))
            return out

        s = dict(s)
        s.update(march_mask(s["cx"], s["y"], s["cz"],
                            (s["flags"] & 1) != 0))
        if debug_stats:
            s["nv"] = s["nv"] + 1

        # Unrolled event group: every while iteration pays a vector->scalar
        # sync (the `more` reduction feeding inner_cond) plus loop-boundary
        # scheduling barriers; running `unroll` events per iteration
        # amortizes that fixed cost.  A group whose lanes all terminate
        # mid-group marches nothing in the remaining copies (march_mask
        # gates every write), so correctness is unaffected; the event
        # counter may overshoot max_events by up to unroll-1 (the budget is
        # a lower bound -- the audit/truncation semantics only need "ran at
        # least the budget").
        def group(s2):
            n = max(1, unroll)
            for j in range(n):
                s2 = event(
                    s2,
                    need_more=(j == n - 1),
                    # lean/full alternation: copies j % skip_stride != 0
                    # elide the skip machinery (see event docstring).
                    # Only meaningful with unroll > 1 — the alternation is
                    # static over the unrolled copies.
                    with_skips=(j % max(1, skip_stride) == 0),
                )
            return s2

        return jax.lax.while_loop(inner_cond, group, s)

    s = jax.lax.while_loop(outer_cond, outer_body, state)

    if prefetch:
        # retire the last in-flight prefetch (DMA semaphores must balance)
        @pl.when(s["pfid"] != _BIG)
        def _drain():
            pltpu.make_async_copy(tw_ref.at[0], tw_scr.at[0], tw_sem).wait()

    truncated = s["flags"] & 1     # budget-exhausted lanes (report + flag)

    # ---- packed outputs (see _unpack_hits); o_pa/o_pb are ALREADY in the
    # output layout — only the owner default and truncation bits append
    pa_ref[:] = (
        s["o_pa"]
        | jax.lax.shift_left(jnp.full((R, T), air_id, _I32), 14)
        | jax.lax.shift_left(truncated, 22)
    )
    pb_ref[:] = s["o_pb"]
    # truncated lanes report their PROGRESS in t (the pending crossing time)
    # so a later phase can resume exactly (see window_trace phases)
    t_ref[:] = jnp.where(truncated != 0, s["t_in"], s["o_t"])
    if debug_stats:
        # row 0: events run; row 1: marching-lane total; row 2: visits;
        # row 3: prefetch prediction hits (hbm n_win=1 double-buffer)
        row = jax.lax.broadcasted_iota(_I32, (R, T), 0)
        nph = s["nph"] if prefetch else jnp.int32(0)
        st_ref[:] = jnp.where(
            row == 0, s["i"],
            jnp.where(row == 1, s["nm"],
                      jnp.where(row == 2, s["nv"],
                                jnp.where(row == 3, nph, 0))),
        )
    else:
        st_ref[:] = jnp.zeros((R, T), _I32)

    # ---- owner ids: per hit window, one (128,128)@(128,n) id matmul, a
    # 7-stage row-select tree, and one (1,16)@(16,n) palette matmul.  The
    # one-hot code and the selected row index are WINDOW-INDEPENDENT
    # (window-local coords are just v & 31, shared 32-lattice), so they
    # hoist OUT of the per-window loop — the loop used to rebuild both
    # (128, n) masks every iteration, ~half its VPU cost on diffuse tiles
    # that hit in dozens of windows.  (An out-of-kernel dense-grid gather
    # alternative was measured WORSE — 479.2 vs 451.1 ms headline A/B,
    # 2026-08-19 — and removed.) ----
    o_hit = s["o_pa"] & 1
    o_vx = (s["o_pb"] & 1023) - 2
    o_vy = (jax.lax.shift_right_logical(s["o_pa"], 5) & 511) - 2
    o_vz = jax.lax.shift_right_logical(s["o_pb"], 10) - 2
    # garbage values on non-hit lanes are discarded by the sel-gated merge
    xl_h = o_vx & 31
    zr_h = o_vz & 31
    yl_h = o_vy & 31
    code_h = jax.lax.shift_left(zr_h >> 3, 5) + xl_h
    oh_h = (iota_row == code_h.reshape(1, n_all)).astype(_BF16)
    rowsel_h = (jax.lax.shift_left(yl_h >> 1, 3) + (zr_h & 7)).reshape(
        1, n_all)
    nib_shift = 4 * (yl_h & 1)

    def oc(carry):
        rem, _ = carry
        return jnp.any(rem != 0)

    def ob(carry):
        rem, pa = carry
        remb = rem != 0
        wv = jnp.where(remb, win_of(o_vx, o_vy, o_vz), _BIG)
        w2 = jnp.clip(jnp.min(wv), 0, nw - 1)
        sel = remb & (wv == w2)
        if hbm_tables:
            cp = pltpu.make_async_copy(
                twid_ref.at[wmap_ref[w2]], id_scr, id_sem
            )
            cp.start()
            cp.wait()
            idblk = id_scr[:]                     # (128, 128)
        else:
            idblk = twid_ref[wmap_ref[w2]]        # (128, 128)
        palrow = palv_ref[wmap_ref[w2]]           # (1, 16)
        aid = jnp.dot(idblk, oh_h, preferred_element_type=_F32)
        # per-lane row pick: binary tree over the 128 rows (7 select
        # stages) — half the vreg ops of the old mask-mul + 128-row sum
        h = 128
        sel_rows = aid
        while h > 1:
            h //= 2
            bit = (rowsel_h & h) != 0
            sel_rows = jnp.where(bit, sel_rows[h:2 * h], sel_rows[:h])
        pair = sel_rows.reshape(R, T).astype(_I32)
        pidx = jax.lax.shift_right_logical(pair, nib_shift) & 15
        oh16 = (
            iota_pal == jnp.where(sel, pidx, -1).reshape(1, n_all)
        ).astype(_BF16)
        ownf = jnp.dot(palrow, oh16, preferred_element_type=_F32)
        owner = ownf.reshape(R, T).astype(_I32)
        pa = jnp.where(
            sel,
            (pa & ~jax.lax.shift_left(jnp.full_like(pa, 255), 14))
            | jax.lax.shift_left(owner, 14),
            pa,
        )
        return (remb & ~sel).astype(_I32), pa

    @pl.when(jnp.any(o_hit != 0))
    def _owner():
        rem, pa = jax.lax.while_loop(
            oc, ob, (o_hit, pa_ref[:])
        )
        pa_ref[:] = pa


def _unpack_hits(pa, pb, t) -> VoxelHit:
    """pa: hit(0) | entered(1) | face(2..4) | vy+2(5..13) | owner(14..21)
    | truncated(22); pb: vx+2(0..9) | vz+2(10..19)"""
    return VoxelHit(
        hit=(pa & 1).astype(bool),
        t=t,
        owner=jax.lax.shift_right_logical(pa, 14) & 255,
        face=jax.lax.shift_right_logical(pa, 2) & 7,
        vx=(pb & 1023) - 2,
        vy=(jax.lax.shift_right_logical(pa, 5) & 511) - 2,
        vz=jax.lax.shift_right_logical(pb, 10) - 2,
        entered=(jax.lax.shift_right_logical(pa, 1) & 1).astype(bool),
    )


def _coherence_key(pack: WindowPack, ox, oyv, oz, dx, dy, dz):
    """Sort key grouping rays into kernel tiles: dead-last, then CURRENT
    WINDOW, then direction class, then fine position cell.  Positions are
    grid-local components (phased tracing passes each ray's CURRENT
    position, not its origin).

    Tile time = (serialized events) x (event cost): a tile whose rays sit
    in different windows pays window visits back to back with most lanes
    stalled, so window residency dominates the key — rays that start in
    the same 32^3 window march together from the first event and tend to
    cross into the same neighbors.  Direction class breaks up the window
    cohort so a visit's in-window march length stays short.  (Measured:
    the direction-first key ran 2% lane occupancy on bounce-1 hemisphere
    rays; tools/occupancy.py.)"""
    dead = (dx == 0.0) & (dy == 0.0) & (dz == 0.0)
    cw = _F32(1.0 / W)
    wx = jnp.clip(ox * cw, 0.0, pack.nwx - 1.0).astype(jnp.uint32)
    wy = jnp.clip(oyv * cw, 0.0, pack.nky - 1.0).astype(jnp.uint32)
    wz = jnp.clip(oz * cw, 0.0, pack.nwz - 1.0).astype(jnp.uint32)
    win = jnp.minimum((wy * pack.nwx + wx) * pack.nwz + wz,
                      jnp.uint32(511))
    dyq = jnp.clip((dy + 1.0) * 3.99, 0.0, 7.0).astype(jnp.uint32)
    ang = jnp.arctan2(dz, dx)
    angq = jnp.clip((ang + 3.1416) * 10.14, 0.0, 63.0).astype(jnp.uint32)
    xq = jnp.clip(ox * 0.25, 0.0, 127.0).astype(jnp.uint32) & 7
    yq = jnp.clip(oyv * 0.25, 0.0, 127.0).astype(jnp.uint32) & 3
    zq = jnp.clip(oz * 0.25, 0.0, 127.0).astype(jnp.uint32) & 7
    return (
        (dead.astype(jnp.uint32) << 31)
        | (win << 22)
        | (dyq << 19)
        | (angq << 13)
        | (xq << 10)
        | (zq << 7)
        | (yq << 5)
    )


def window_trace(
    pack: WindowPack,
    grid_origin: jax.Array,       # (3,) i32 world coords of grid[0,0,0]
    origin: jax.Array,            # (N, 3) f32 world space
    direction: jax.Array,         # (N, 3) f32; zero => inactive
    *,
    t_min: float = EPSILON_BLOCK,
    t_max: float = T_MAX,
    max_events: int = 384,
    air_id: int = 255,
    tile: int = 1024,
    windows: int = 4,
    presort: bool = False,
    presorted: bool = False,
    phases: int = 1,
    phase_events: int = 64,
    unroll: int = 1,
    skip_stride: int = 1,
    skips: bool = True,
    wskip: bool = True,
    interpret: bool = False,
    with_truncated: bool = False,
    with_stats: bool = False,
    tables_in_hbm: Optional[bool] = None,
    packed_hits: bool = False,
    _force_events: bool = False,
):
    """Drop-in Pallas replacement for intersect.dda_trace (same VoxelHit);
    ONE kernel call for any grid height.

    presort: reorder rays by _coherence_key before tracing and restore
    after, both as multi-operand lax.sort (docs/PERF.md).

    windows: resident 32^3 windows per event (one one-hot matmul per
    resident window, partial products summed).  >1 multiplies marching-
    lane occupancy on divergent (secondary-bounce) tiles at an MXU cost
    that scales with k; measured sweep in docs/PERF.md.

    phases (requires presort): straggler compaction.  Tile time runs to
    the SLOWEST lane, so a few long-marching rays serialize whole tiles.
    Phase p < last traces with a small `phase_events` budget; truncated
    rays report their progress (t_in) and are re-sorted by CURRENT
    position — stragglers from all tiles pack into few dense tiles, and
    tiles whose rays all finished exit after one bounds check.  Resume is
    exact: a truncated ray restarts 2 nudges before its pending crossing
    (every crossing before it was already evaluated clear, and re-scanning
    a cleared span finds nothing).

    with_truncated: additionally return the (N,) bool mask of rays that
    exhausted the final phase's max_events (reported as misses) — the
    exhaustive-traversal gate of tools/tpu_parity.py.

    origin/direction: (N, 3) arrays or SoA component triples (anything
    with .x/.y/.z, e.g. core.vec3.V3 — the renderer's hot-path form)."""
    grid_origin = jnp.asarray(grid_origin, _I32)
    go = grid_origin.astype(_F32)
    if hasattr(origin, "x"):
        ox0, oy0, oz0 = origin.x, origin.y, origin.z
        dx0, dy0, dz0 = direction.x, direction.y, direction.z
    else:
        origin = jnp.asarray(origin, _F32)
        direction = jnp.asarray(direction, _F32)
        ox0, oy0, oz0 = origin[:, 0], origin[:, 1], origin[:, 2]
        dx0, dy0, dz0 = direction[:, 0], direction[:, 1], direction[:, 2]
    n = ox0.shape[0]

    rows = max(tile // 128, 8)
    tile = rows * 128
    n_pad = -n % tile
    n_tiles = (n + n_pad) // tile

    def prep(x):
        if n_pad:
            x = jnp.concatenate([x, jnp.zeros((n_pad,), x.dtype)])
        return x.reshape(n_tiles * rows, 128)

    def unprep(x):
        return x.reshape(-1)[:n]

    row_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_sd = jax.ShapeDtypeStruct((n_tiles * rows, 128), _I32)

    # tw/twid move to HBM (per-visit DMA) when they cannot comfortably
    # share the ~16 MB VMEM with the ray tiles — the streamed-window
    # regime; small scenes keep the cheaper VMEM-resident path.  Override
    # with tables_in_hbm for tests/sweeps.
    table_bytes = (pack.tw.size + pack.twid.size) * 2
    hbm_tables = (
        tables_in_hbm if tables_in_hbm is not None
        else table_bytes > 10 * 2 ** 20
    )
    n_win_eff = max(1, min(windows, 8))

    def run_tiles(ox1, oy1, oz1, dx1, dy1, dz1, tm1, budget):
        kernel = functools.partial(
            _kernel,
            gx=pack.gx, gy=pack.gy, gz=pack.gz,
            nwx=pack.nwx, nwz=pack.nwz, nky=pack.nky,
            t_min=float(t_min), t_max=float(t_max),
            max_events=budget, air_id=air_id,
            has_glass=pack.has_glass,
            n_win=n_win_eff,
            use_wskip=wskip and pack.max_wdist >= 1,
            use_bskip=skips,
            unroll=max(1, unroll),
            skip_stride=max(1, skip_stride),
            hbm_tables=hbm_tables,
            force_events=_force_events, debug_stats=with_stats,
        )
        tbl = (
            pl.BlockSpec(memory_space=pl.ANY) if hbm_tables else full()
        )
        scratch = (
            [
                # n_win=1 runs the cross-visit prefetch double-buffer:
                # two slots even though one window is resident
                pltpu.VMEM((max(n_win_eff, 2), pack.tw.shape[1], 128),
                           _BF16),
                pltpu.SemaphoreType.DMA,
                pltpu.VMEM((128, 128), _BF16),
                pltpu.SemaphoreType.DMA,
            ]
            if hbm_tables else []
        )
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                tbl, tbl, full(),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                row_spec, row_spec, row_spec, row_spec, row_spec,
                row_spec, row_spec,
            ],
            out_specs=[row_spec] * 4,
            out_shape=[
                out_sd, out_sd,
                jax.ShapeDtypeStruct((n_tiles * rows, 128), _F32),
                out_sd,
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(pack.tw, pack.twid, pack.palv, pack.wmap, pack.wdist,
          jnp.asarray(pack.ymax, _I32).reshape(1),
          prep(ox1), prep(oy1), prep(oz1),
          prep(dx1), prep(dy1), prep(dz1), prep(tm1))

    ox1 = ox0 - go[0]
    oy1 = oy0 - go[1]
    oz1 = oz0 - go[2]
    dx1, dy1, dz1 = dx0, dy0, dz0
    tm1 = jnp.zeros(n, _F32)

    # presorted (the hoisted bounce-sort already ordered the rays by the
    # coherence key): phase 0 skips its sort; later phases still re-sort
    # the truncated stragglers by their current position (that repacking
    # IS the point of phasing), and the final restore undoes them.
    n_phases = max(1, phases) if (presort or presorted) else 1
    idx = jnp.arange(n, dtype=jnp.uint32)
    acc = None
    outs = None
    for p in range(n_phases):
        budget = (
            max_events if p == n_phases - 1
            else min(phase_events, max_events)
        )
        if p > 0:
            trunc = (jax.lax.shift_right_logical(acc[0], 22) & 1) == 1
            tf = trunc.astype(_F32)
            dx1, dy1, dz1 = dx1 * tf, dy1 * tf, dz1 * tf
            tm1 = jnp.maximum(acc[2] - _F32(2 * _NUDGE), 0.0) * tf
        if presort or (presorted and p > 0):
            key = _coherence_key(
                pack,
                ox1 + dx1 * tm1, oy1 + dy1 * tm1, oz1 + dz1 * tm1,
                dx1, dy1, dz1,
            )
            ops = [key, ox1, oy1, oz1, dx1, dy1, dz1, tm1, idx]
            if acc is not None:
                ops += list(acc)
            so = jax.lax.sort(tuple(ops), num_keys=1)
            (ox1, oy1, oz1, dx1, dy1, dz1, tm1, idx) = so[1:9]
            if acc is not None:
                acc = tuple(so[9:])
        outs = run_tiles(ox1, oy1, oz1, dx1, dy1, dz1, tm1, budget)
        pa, pb, t = (unprep(o) for o in outs[:3])
        if acc is None:
            acc = (pa, pb, t)
        else:
            trunc = (jax.lax.shift_right_logical(acc[0], 22) & 1) == 1
            acc = (
                jnp.where(trunc, pa, acc[0]),
                jnp.where(trunc, pb, acc[1]),
                jnp.where(trunc, t, acc[2]),
            )
    pa, pb, t = acc
    if presort or (presorted and n_phases > 1):
        (_, pa, pb, t) = jax.lax.sort((idx, pa, pb, t), num_keys=1)
    if packed_hits:
        # fused-shade path (kernels/shade.py): hand back the packed words
        # verbatim — the shade kernel unpacks them in-register, so the
        # VoxelHit SoA arrays never materialize in HBM
        ret = ((pa, pb, t),)
        if with_truncated:
            ret += ((jax.lax.shift_right_logical(pa, 22) & 1).astype(bool),)
        if with_stats:
            st = outs[3].reshape(n_tiles, rows, 128)
            ret += ({"events": st[:, 0, 0], "march_lanes": st[:, 1, 0],
                     "visits": st[:, 2, 0], "pf_hits": st[:, 3, 0]},)
        return ret if len(ret) > 1 else ret[0]
    hit = _unpack_hits(pa, pb, t)
    ret = (hit,)
    if with_truncated:
        ret += ((jax.lax.shift_right_logical(pa, 22) & 1).astype(bool),)
    if with_stats:
        # phased runs report the FINAL phase's per-tile stats
        st = outs[3].reshape(n_tiles, rows, 128)
        ret += ({"events": st[:, 0, 0], "march_lanes": st[:, 1, 0],
                 "visits": st[:, 2, 0], "pf_hits": st[:, 3, 0]},)
    return ret if len(ret) > 1 else hit
