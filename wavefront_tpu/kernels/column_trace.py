"""Fused Pallas voxel tracer: the gather-free column DDA.

This is the TPU-native replacement for the reference's hot kernel — the
hardware ray-query traversal loop in raytrace.rs:366-400.  The XLA DDA
(render/intersect.py) is correct but gather-bound: every crossing pays one
random-access gather, and XLA lowers those to ~25-60 M/s on v5e (no
gather hardware; docs/PERF.md).  Measured end to end that caps the whole
renderer at ~1 Mray/s.  This kernel removes *every* per-step gather:

  * RANDOM ACCESS -> MXU.  Mosaic's only dynamic gather is the degenerate
    (8,128)-table case (verified empirically; lowering.py:2464-2524), so
    per-lane grid lookups are expressed as one-hot matmuls: fetching a
    ray's (x,z) column is  M1 @ onehot(x)  on the systolic array (one
    matmul per event for the whole 1024-ray tile, rays on lanes), and the
    z-selection is a broadcast-multiply + sublane reduction.  A column
    event costs ~1-2 us per tile — orders of magnitude past XLA gathers
    (docs/PERF.md: 15-19 Mray/s standalone vs the XLA DDA's 1.4).

  * Y IS FREE.  Each (x,z) column's 32 voxel classes are bit-packed along
    y (transparent mask T, translucent mask L).  All face crossings along
    y inside a column resolve with shifted-mask bit logic and a
    count-leading-zeros first-hit scan — zero marching.  A straight-down
    ray traces in ONE column event.

  * EMPTY SPACE SKIPPING is per-band Chebyshev distance fields: the slab
    is cut into 4 bands of 8 rows, and each column stores, per band, the
    (x,z) Chebyshev distance to the nearest column whose band holds any
    face-owning voxel.  A ray in an empty band jumps the radius-(d-1)
    square in one event; a jump that would cross the band boundary lands
    just past it with a PENDING ENTRY CROSSING (prev voxel = air — the
    jumped segment is provably air) so a solid on the far side is hit
    exactly like the DDA would.  This skips both terrain valleys and 3-D
    air pockets in volumetric worlds.  Rays that rise above the slab's
    highest solid voxel terminate immediately (sky early-out).

Hit semantics mirror render/intersect.dda_trace exactly (same face rule
derived from the mesher chunk.rs:222-287, same epsilons, same
enter-beats-exit coplanar tie, same x-before-z axis tie), so the kernel is
drop-in behind the same VoxelHit interface and is parity-tested against
dda_trace (tests/test_column_trace.py).

Grids taller than 32 voxels are traced as a y-STACK of 32-row slabs
(build_column_stack / column_trace_stack): per-slab kernel calls chained
through a per-ray t-cap and merged closest-hit.  Each slab carries its
neighbors' boundary rows as context bits so slab-boundary faces follow the
exact mesher rule, and every boundary face is reported exactly once, by
the slab that owns its voxel (whose palette can resolve the id).

Constraint of this packing (renderer falls back to dda_trace otherwise):
at most 16 distinct block ids per slab (owner ids are extracted through a
4-bit palette by one final matmul per tile).
"""

from __future__ import annotations

import functools
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
_INF = 3.0e38
_NUDGE = 1e-4          # start/landing nudge, identical to dda_trace
SLAB_H = 32            # slab height: one y-mask word; taller grids stack
N_BANDS = 4            # empty-space bands per slab (8 rows each)
BAND_H = SLAB_H // N_BANDS
MAX_COL_SKIP = 15      # band-distance clamp
# chunk layout per slab: 4xT + [4xL] + 2 packed band-distance chunks
# (two 4-bit distances per 8-bit chunk) + 1 ctx chunk (bit0 belowT,
# bit1 aboveT, bit2 belowL, bit3 aboveL); the L mask chunks are elided
# when the slab+context is glass-free
N_CHUNKS = 4 + 4 + N_BANDS // 2 + 1
N_ID_CHUNKS = 16       # 4-bit palette indices, 2 voxels per 8-bit chunk
MAX_PALETTE = 16


@jax.tree_util.register_pytree_node_class
class ColumnPack(NamedTuple):
    """Device tables for the column tracer (host-built by build_column_pack).

    m1:  (nc*Gz, Gx) bf16 — row c*Gz+z holds chunk c of column (x,z):
         c in 0..3  -> byte c of the transparency bitmask T (bit y set iff
                       block (x,y,z) is transparent; bits >= Gy read air=1)
         c in 4..7  -> byte c of the translucency bitmask L (ELIDED when the
                       window holds no glass-like block: then L == T and
                       the chunk count drops by 4)
         next N_BANDS/2 chunks -> per-band (8-row) Chebyshev (x,z)
                       distances to the nearest column whose band holds a
                       face-owning voxel, packed two 4-bit values/chunk
         last chunk -> neighbor-slab boundary-row context bits
                       (belowT, aboveT, belowL, aboveL in bits 0..3)
    mid: (N_ID_CHUNKS*Gz, Gx) bf16 — row k*Gz+z packs the 4-bit palette
         indices of voxels y=2k (low nibble) and y=2k+1 (high nibble).
    palette: (1, 16) i32 — palette slot -> block id.
    has_glass: python bool (static) — whether the L chunks are present.
    ymax: python int (static) — 1 + highest y of any non-transparent voxel;
         a ray at y >= ymax with dy >= 0 can never hit (sky early-out).
    """

    m1: jax.Array
    mid: jax.Array
    palette: jax.Array
    has_glass: bool
    ymax: int
    gy: int
    has_ctx: bool = True

    # pytree: arrays are children; the python scalars are static aux data so
    # the pack can cross jit boundaries without tracing them
    def tree_flatten(self):
        return (self.m1, self.mid, self.palette), (
            self.has_glass, self.ymax, self.gy, self.has_ctx,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


class ColumnStack(NamedTuple):
    """A y-stack of ColumnPacks covering a grid taller than SLAB_H.

    Slab k covers grid rows [k*SLAB_H, (k+1)*SLAB_H); each pack carries its
    neighbors' boundary rows as context bits, so slab-boundary faces follow
    the exact mesher rule (no face between two solids across the boundary).
    """

    packs: tuple

    def tree_flatten(self):
        return tuple(self.packs), len(self.packs)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(tuple(children))


jax.tree_util.register_pytree_node_class(ColumnStack)


def build_column_stack(
    grid: np.ndarray,
    transparent: np.ndarray,
    translucent: np.ndarray,
) -> Optional[ColumnStack]:
    """Slab-stack column tables for a grid of any height; None only when a
    slab holds more than MAX_PALETTE distinct block ids."""
    grid = np.asarray(grid)
    gy = grid.shape[1]
    packs = []
    for base in range(0, max(gy, 1), SLAB_H):
        slab = grid[:, base:base + SLAB_H, :]
        below = grid[:, base - 1, :] if base > 0 else None
        above = (
            grid[:, base + SLAB_H, :] if base + SLAB_H < gy else None
        )
        pack = build_column_pack(
            slab, transparent, translucent, below_row=below, above_row=above
        )
        if pack is None:
            return None
        packs.append(pack)
    return ColumnStack(tuple(packs))


def build_column_pack(
    grid: np.ndarray,
    transparent: np.ndarray,
    translucent: np.ndarray,
    below_row: Optional[np.ndarray] = None,
    above_row: Optional[np.ndarray] = None,
) -> Optional[ColumnPack]:
    """Pack a (Gx,Gy<=32,Gz) u8 grid slab into column tables; None if out
    of range.  below_row/above_row: (Gx,Gz) block-id rows adjacent to the
    slab (None = air) — boundary-face context for stacked slabs."""
    grid = np.asarray(grid)
    gx, gy, gz = grid.shape
    if gy > SLAB_H:
        return None
    ids = np.unique(grid)
    if len(ids) > MAX_PALETTE:
        return None

    transparent = np.asarray(transparent, bool)
    translucent = np.asarray(translucent, bool)

    def ctx_bits(row, table):
        if row is None:
            return np.ones((gx, gz), np.uint64)
        return table[np.asarray(row)].astype(np.uint64)

    ctx_t_below = ctx_bits(below_row, transparent)
    ctx_t_above = ctx_bits(above_row, transparent)
    ctx_l_below = ctx_bits(below_row, translucent)
    ctx_l_above = ctx_bits(above_row, translucent)
    # an isolated slab (both neighbors air) needs no ctx chunk at all —
    # the kernel synthesizes all-air context, saving one extract row-block
    # per event (the single-slab window is the common benchmark case)
    has_ctx = below_row is not None or above_row is not None

    weights = (np.uint64(1) << np.arange(gy, dtype=np.uint64))[None, :, None]
    t_bits = transparent[grid].astype(np.uint64)
    l_bits = translucent[grid].astype(np.uint64)
    Tm = (t_bits * weights).sum(axis=1)          # (gx, gz)
    Lm = (l_bits * weights).sum(axis=1)
    if gy < 32:
        pad = ((np.uint64(1) << np.uint64(32))
               - (np.uint64(1) << np.uint64(gy)))
        Tm |= pad                                 # out-of-grid y reads air
        Lm |= pad

    owning = ~transparent[grid]                   # face-owning voxels
    # per-column 1 + highest owning voxel y (0 for all-air columns)
    any_y = owning.any(axis=1)
    maxh0 = np.where(
        any_y, gy - np.argmax(owning[:, ::-1, :], axis=1), 0
    ).astype(np.int64)

    def cheby_dist(occ):
        """(x,z) Chebyshev distance to the nearest True, clamped."""
        dist = np.full(occ.shape, MAX_COL_SKIP, np.int64)
        reach = occ.copy()
        dist[reach] = 0
        for d in range(1, MAX_COL_SKIP):
            if reach.all():
                break
            r = reach.copy()
            r[1:, :] |= reach[:-1, :]
            r[:-1, :] |= reach[1:, :]
            m = r.copy()
            r[:, 1:] |= m[:, :-1]
            r[:, :-1] |= m[:, 1:]
            reach = r
            dist[reach & (dist == MAX_COL_SKIP)] = d
        return dist

    has_glass = bool(
        np.any(Tm != Lm)
        or np.any(ctx_t_below != ctx_l_below)
        or np.any(ctx_t_above != ctx_l_above)
    )
    ymax = int(maxh0.max())

    chunks = [(Tm >> np.uint64(8 * c)) & np.uint64(255) for c in range(4)]
    if has_glass:
        chunks += [(Lm >> np.uint64(8 * c)) & np.uint64(255) for c in range(4)]
    dists = []
    for b in range(N_BANDS):
        lo, hi = b * BAND_H, min((b + 1) * BAND_H, gy)
        occ = (
            owning[:, lo:hi, :].any(axis=1)
            if lo < gy
            else np.zeros((gx, gz), bool)
        )
        dists.append(cheby_dist(occ).astype(np.uint64))
    # two 4-bit distances per chunk (exact in bf16: values <= 255)
    for b in range(0, N_BANDS, 2):
        chunks.append(dists[b] | (dists[b + 1] << np.uint64(4)))
    if has_ctx:
        chunks.append(
            ctx_t_below
            | (ctx_t_above << np.uint64(1))
            | (ctx_l_below << np.uint64(2))
            | (ctx_l_above << np.uint64(3))
        )
    # rows chunk-major: row c*Gz + z, column x
    m1 = np.stack([c.T for c in chunks], axis=0).reshape(len(chunks) * gz, gx)

    pal = np.zeros(MAX_PALETTE, np.int32)
    pal[: len(ids)] = ids
    pal_idx_of = np.zeros(256, np.uint64)
    for j, b in enumerate(ids):
        pal_idx_of[b] = j
    pidx = pal_idx_of[grid]                       # (gx, gy, gz)
    if gy < 32:
        pidx = np.pad(pidx, ((0, 0), (0, 32 - gy), (0, 0)))
    id_chunks = [
        (pidx[:, 2 * k, :] | (pidx[:, 2 * k + 1, :] << np.uint64(4))).T
        for k in range(N_ID_CHUNKS)
    ]
    mid = np.stack(id_chunks, axis=0).reshape(N_ID_CHUNKS * gz, gx)

    return ColumnPack(
        m1=jnp.asarray(m1.astype(np.float32), jnp.bfloat16),
        mid=jnp.asarray(mid.astype(np.float32), jnp.bfloat16),
        palette=jnp.asarray(pal.reshape(1, MAX_PALETTE)),
        has_glass=has_glass,
        ymax=ymax,
        gy=gy,
        has_ctx=has_ctx,
    )


def _safe_inv(d):
    tiny = jnp.where(d >= 0, _F32(1e-30), _F32(-1e-30))
    return _F32(1.0) / jnp.where(jnp.abs(d) < 1e-30, tiny, d)


def _bitrange(lo, hi):
    """int32 mask with bits [lo, hi] set (empty when lo > hi); lo,hi in
    [0, 31] after clamping."""
    lo_c = jnp.clip(lo, 0, 31)
    hi_c = jnp.clip(hi, 0, 31)
    n = hi_c - lo_c + 1
    # bits [0, n): (-1 >>> (32 - n)) with n in [1, 32]
    low = jax.lax.shift_right_logical(
        jnp.full_like(lo_c, -1), jnp.clip(32 - n, 0, 31)
    )
    low = jnp.where(n >= 32, jnp.full_like(lo_c, -1), low)
    mask = jax.lax.shift_left(low, lo_c)
    return jnp.where(lo > hi, jnp.zeros_like(lo_c), mask)


def _ctz(x):
    """Count trailing zeros (x != 0)."""
    return 31 - jax.lax.clz(x & jax.lax.neg(x))


def _kernel(
    m1_ref, mid_ref, pal_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, cap_ref,
    pa_ref, pb_ref, t_ref,
    *, gx: int, gy: int, gz: int, t_min: float, t_max: float,
    max_events: int, air_id: int, has_glass: bool, ymax: int,
    has_ctx: bool, force_events: bool = False,
):
    R, T = ox_ref.shape                 # (sublane rows, 128 lanes) per tile
    f32 = functools.partial(jnp.full, (R, T), dtype=_F32)
    i32 = functools.partial(jnp.full, (R, T), dtype=_I32)

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    valid = (dx != 0.0) | (dy != 0.0) | (dz != 0.0)
    ivx, ivy, ivz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    mx = jnp.abs(dx) > 1e-30
    my = jnp.abs(dy) > 1e-30
    mz = jnp.abs(dz) > 1e-30
    sx = jnp.where(dx > 0, 1, jnp.where(dx < 0, -1, 0)).astype(_I32)
    sy = jnp.where(dy > 0, 1, jnp.where(dy < 0, -1, 0)).astype(_I32)
    sz = jnp.where(dz > 0, 1, jnp.where(dz < 0, -1, 0)).astype(_I32)

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
    t_entry = jnp.maximum(t_near, _F32(t_min))
    # per-ray cap: a known earlier hit (another slab of the stack) bounds
    # this slab's march; <= comparisons keep equal-t boundary duplicates
    limit = jnp.minimum(jnp.minimum(t_far, _F32(t_max)), cap_ref[:])
    active0 = valid & (t_entry <= limit)

    # start voxel, nudged inside along the ray (dda_trace:266-269)
    tn = t_entry + _F32(_NUDGE)
    # sky early-out: nothing solid exists at y >= ymax, so a non-descending
    # ray already above it can never hit — skip the whole march (these are
    # exactly the horizon-skimming stragglers that dominate while_loop time)
    sky0 = (dy >= 0.0) & ((oy + dy * tn) >= _F32(ymax))
    active0 = active0 & ~sky0
    # a y-parallel ray outside this slab's rows can never enter it (the
    # slab box test can't exclude it: its y slab is degenerate)
    active0 = active0 & (my | ((oy >= 0.0) & (oy < _F32(gy))))
    cx0 = jnp.floor(jnp.clip(ox + dx * tn, -2.0, gx + 1.0)).astype(_I32)
    y0 = jnp.floor(jnp.clip(oy + dy * tn, -2.0, gy + 1.0)).astype(_I32)
    cz0 = jnp.floor(jnp.clip(oz + dz * tn, -2.0, gz + 1.0)).astype(_I32)

    # rays starting outside evaluate the grid-entry crossing as their first
    # event's entry check (prev voxel = outside = air), matching dda_trace's
    # pre-entry voxel trick (:271-278 incl. the x>=y>=z entry-axis priority)
    starts_outside = t_near > _F32(t_min)
    entry_x = starts_outside & (nx_ >= ny_) & (nx_ >= nz_)
    entry_y = starts_outside & ~entry_x & (ny_ >= nz_)
    eaxis = jnp.where(entry_x, 0, jnp.where(entry_y, 1, 2)).astype(_I32)
    es = jnp.where(entry_x, sx, jnp.where(entry_y, sy, sz))
    face_ent0 = eaxis * 2 + (-es > 0).astype(_I32)
    face_ex0 = eaxis * 2 + (es > 0).astype(_I32)
    t_in0 = jnp.where(starts_outside, t_near, t_entry)

    # vertical grid exit time (constant per ray)
    y_exit_bound = jnp.where(sy > 0, _F32(gy), _F32(0.0))
    t_vert = jnp.where(my, (y_exit_bound - oy) * ivy, _INF)

    n_all = R * T
    base_b = 8 if has_glass else 4           # first packed band-dist chunk
    base_c = base_b + N_BANDS // 2           # the ctx chunk (if any)
    n_chunks = base_c + (1 if has_ctx else 0)
    iota_x = jax.lax.broadcasted_iota(_I32, (gx, n_all), 0)
    iota_z = jax.lax.broadcasted_iota(_I32, (gz, n_all), 0)
    m1 = m1_ref[:]

    def extract_chunks(mat, nc, vx, vz):
        """mat (nc*gz, gx) bf16; per-lane (vx, vz) column fetch via ONE
        one-hot matmul for the whole (R, T) ray tile (rays flattened onto
        lanes), then a per-chunk z-masked sublane reduction.  Exact: chunk
        values are 8-bit ints, well inside bf16-one-hot/f32-accum range."""
        vxf = vx.reshape(1, n_all)
        vzf = vz.reshape(1, n_all)
        ohx = (iota_x == jnp.clip(vxf, 0, gx - 1)).astype(jnp.bfloat16)
        a = jnp.dot(mat, ohx, preferred_element_type=_F32)  # (nc*gz, n_all)
        ozf = (iota_z == jnp.clip(vzf, 0, gz - 1)).astype(_F32)
        out = []
        for c in range(nc):
            blk = a[c * gz:(c + 1) * gz, :]
            val = jnp.sum(blk * ozf, axis=0, keepdims=True)  # (1, n_all)
            out.append(val.reshape(R, T).astype(_I32))
        return out

    state = dict(
        i=jnp.int32(0),
        cx=cx0, y=y0, cz=cz0,
        t_in=t_in0,
        prev_t=i32(1), prev_l=i32(1),              # outside = air
        have_entry=(starts_outside & active0).astype(_I32),
        ent_y=(starts_outside & entry_y & active0).astype(_I32),
        face_ent=face_ent0, face_ex=face_ex0,
        pcx=cx0, pcz=cz0,
        active=active0.astype(_I32),
        o_hit=jnp.zeros((R, T), _I32),
        o_t=f32(_INF),
        o_face=i32(0), o_vx=i32(0), o_vy=i32(0), o_vz=i32(0),
        o_ent=jnp.zeros((R, T), _I32),
    )

    def event(s):
        cx, y, cz = s["cx"], s["y"], s["cz"]
        t_in, act = s["t_in"], s["active"] != 0
        have_entry = s["have_entry"] != 0
        o_hit = s["o_hit"] != 0
        o_ent = s["o_ent"] != 0
        inside = (cx >= 0) & (cx < gx) & (cz >= 0) & (cz < gz)

        ch = extract_chunks(m1, n_chunks, cx, cz)
        Tm = (ch[0] | jax.lax.shift_left(ch[1], 8)
              | jax.lax.shift_left(ch[2], 16)
              | jax.lax.shift_left(ch[3], 24))
        if has_glass:
            Lm = (ch[4] | jax.lax.shift_left(ch[5], 8)
                  | jax.lax.shift_left(ch[6], 16)
                  | jax.lax.shift_left(ch[7], 24))
        else:
            Lm = Tm                                 # glass-free: L == T
        all1 = jnp.full_like(Tm, -1)
        Tm = jnp.where(inside, Tm, all1)           # out-of-grid = air
        Lm = Tm if not has_glass else jnp.where(inside, Lm, all1)
        # packed band distances (two 4-bit values per chunk): out-of-grid
        # columns are all-air but their windows may overlap the grid —
        # skipping is disabled there instead
        bands = []
        for i in range(N_BANDS):
            w = ch[base_b + i // 2]
            bands.append(
                jax.lax.shift_right_logical(w, 4 * (i & 1)) & 15
            )
        # neighbor-slab boundary-row context bits (1 = transparent /
        # translucent; out-of-grid columns and isolated slabs read air)
        one = jnp.ones_like(Tm)
        if has_ctx:
            cw = ch[base_c]
            ctx_t_b = jnp.where(inside, cw & 1, one)
            ctx_t_a = jnp.where(
                inside, jax.lax.shift_right_logical(cw, 1) & 1, one
            )
            ctx_l_b = jnp.where(
                inside, jax.lax.shift_right_logical(cw, 2) & 1, one
            )
            ctx_l_a = jnp.where(
                inside, jax.lax.shift_right_logical(cw, 3) & 1, one
            )
        else:
            ctx_t_b = ctx_t_a = ctx_l_b = ctx_l_a = one
        notT = ~Tm

        def bit_at(mask, yy):
            """Bit yy of a y-mask; out-of-range y reads air (=1) — masks pad
            air only up to bit 31, and dy==0 rays can sit at any y."""
            ok = (yy >= 0) & (yy <= 31)
            b = jax.lax.shift_right_logical(mask, jnp.clip(yy, 0, 31)) & 1
            return jnp.where(ok, b, jnp.ones_like(b))

        bit_t = bit_at(Tm, y)
        bit_l = bit_at(Lm, y)

        # ---- entry crossing at t_in (face between prev voxel and this
        # column's entry voxel; dda hit rule, enter beats exit) ----
        # A vertical slab entry reads the neighbor slab's boundary row as
        # the prev voxel (context bits); its prev-side back-face belongs to
        # the neighbor, which reports it as its own vertical exit — so the
        # e_exit half is suppressed there (exactly-once reporting across
        # the stack; single-slab grids have air context, where this matches
        # the old behavior bit for bit).
        ent_y = s["ent_y"] != 0
        prev_t_eff = jnp.where(
            ent_y, jnp.where(sy < 0, ctx_t_a, ctx_t_b), s["prev_t"]
        )
        prev_l_eff = jnp.where(
            ent_y, jnp.where(sy < 0, ctx_l_a, ctx_l_b), s["prev_l"]
        )
        e_enter = (bit_t == 0) & (prev_l_eff == 1)
        e_exit = (prev_t_eff == 0) & (bit_l == 1) & ~ent_y
        e_hit = (
            act & have_entry & (e_enter | e_exit)
            & (t_in >= _F32(t_min)) & (t_in <= limit)
        )
        e_entered = e_enter

        # ---- column exit ----
        tx = jnp.where(
            mx, ((cx + (sx > 0).astype(_I32)).astype(_F32) - ox) * ivx, _INF
        )
        tz = jnp.where(
            mz, ((cz + (sz > 0).astype(_I32)).astype(_F32) - oz) * ivz, _INF
        )
        t_exit = jnp.minimum(tx, tz)
        t_scan_end = jnp.minimum(jnp.minimum(t_exit, limit), t_vert)

        # ---- in-column y crossings: bit scan ----
        y_at_end = jnp.clip(oy + dy * (t_scan_end - _F32(_NUDGE)),
                            -1.0, _F32(gy))
        # dy == 0 rays never change y (and may sit outside [0, gy))
        y_out = jnp.where(
            my, jnp.clip(jnp.floor(y_at_end).astype(_I32), 0, gy - 1), y
        )
        up = sy > 0
        b_lo = jnp.where(up, y + 1, y_out + 1)
        b_hi = jnp.where(up, y_out, y)
        wmask = _bitrange(b_lo, b_hi)
        A1 = notT & jax.lax.shift_left(Lm, 1)      # boundary face owner=b (DOWN)
        A2 = jax.lax.shift_left(notT, 1) & Lm      # owner=b-1 (UP)
        C = (A1 | A2) & wmask
        has_c = C != 0
        c_safe = jnp.where(has_c, C, jnp.ones_like(C))
        bstar = jnp.where(up, _ctz(c_safe), 31 - jax.lax.clz(c_safe))
        a1_at = jax.lax.shift_right_logical(A1, bstar) & 1
        a2_at = jax.lax.shift_right_logical(A2, bstar) & 1
        # up: entering owner=bstar (A1) wins coplanar ties; down: entering
        # owner=bstar-1 (A2) wins
        # (bool-valued selects don't lower in Mosaic; use mask logic)
        y_entered = (up & (a1_at == 1)) | (~up & (a2_at == 1))
        y_is_a1 = (up & (a1_at == 1)) | (~up & ~(a2_at == 1))
        y_owner = jnp.where(y_is_a1, bstar, bstar - 1)
        y_face = jnp.where(y_is_a1, 2, 3)          # DOWN / UP
        t_y = (bstar.astype(_F32) - oy) * ivy
        y_hit = (
            act & ~e_hit & has_c & (t_y >= _F32(t_min)) & (t_y <= limit)
        )

        # ---- vertical grid exit inside this column (boundary b=0 / b=gy
        # is outside the 32-bit window; back-face against the sky/underworld)
        v_reach = my & (t_vert <= t_exit) & (t_vert <= limit) & (
            t_vert >= _F32(t_min))
        v_bit = jnp.where(
            up,
            jax.lax.shift_right_logical(notT, gy - 1) & 1,
            notT & 1,
        )
        # exit back-face exists iff the neighbor row beyond the boundary is
        # translucent (mesher rule; air context = always, the old behavior)
        ctx_l_next = jnp.where(up, ctx_l_a, ctx_l_b)
        v_hit = (
            act & ~e_hit & ~y_hit & inside & v_reach & (v_bit == 1)
            & (ctx_l_next == 1)
        )

        new_hit = e_hit | y_hit | v_hit
        hit_t = jnp.where(e_hit, t_in, jnp.where(y_hit, t_y, t_vert))
        hit_face = jnp.where(
            e_hit,
            jnp.where(e_entered, s["face_ent"], s["face_ex"]),
            jnp.where(y_hit, y_face, jnp.where(up, 3, 2)),
        )
        hit_vx = jnp.where(e_hit & ~e_entered, s["pcx"], cx)
        hit_vz = jnp.where(e_hit & ~e_entered, s["pcz"], cz)
        hit_vy = jnp.where(
            e_hit, y,
            jnp.where(y_hit, y_owner, jnp.where(up, gy - 1, 0)),
        )
        hit_ent = (e_hit & e_entered) | (~e_hit & y_hit & y_entered)

        out = dict(s)
        rec = new_hit & ~o_hit
        out["o_hit"] = (o_hit | new_hit).astype(_I32)
        out["o_t"] = jnp.where(rec, hit_t, s["o_t"])
        out["o_face"] = jnp.where(rec, hit_face, s["o_face"])
        out["o_vx"] = jnp.where(rec, hit_vx, s["o_vx"])
        out["o_vy"] = jnp.where(rec, hit_vy, s["o_vy"])
        out["o_vz"] = jnp.where(rec, hit_vz, s["o_vz"])
        out["o_ent"] = ((rec & hit_ent) | (~rec & o_ent)).astype(_I32)

        # ---- advance: band empty-space skip or single-column step ----
        # vertical leave without hit terminates the ray in this column
        vert_leave = my & (t_vert <= t_exit)

        # Band skip: the current band's distance field certifies that no
        # column within Chebyshev radius d-1 holds a face-owning voxel in
        # this 8-row band.  Jump to just before the square exit (sel1) or
        # just PAST the band boundary (sel2) — the far side of the boundary
        # is uncertified, so a sel2 landing carries a PENDING ENTRY
        # CROSSING (prev = air: the jumped segment is provably air) that
        # the next event evaluates exactly like a dda boundary crossing.
        # Near-ties fall back to the single-column step, whose voxel
        # increment always progresses.
        band = jnp.clip(y, 0, gy - 1) >> (BAND_H.bit_length() - 1)
        d_here = bands[0]
        for i in range(1, N_BANDS):
            d_here = jnp.where(band == i, bands[i], d_here)
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
        bnd = jnp.where(up, (band + 1) * BAND_H, band * BAND_H)
        t_bnd = jnp.where(my, (bnd.astype(_F32) - oy) * ivy, _INF)
        sel1 = t_sq <= t_bnd
        sel2 = ~sel1 & (t_bnd + _F32(2 * _NUDGE) <= t_sq)
        t_land = jnp.where(
            sel1, t_sq - _F32(_NUDGE), t_bnd + _F32(_NUDGE)
        )
        do_skip = (
            can_skip & (sel1 | sel2) & (t_land >= t_exit) & (t_land > t_in)
        )
        sel2 = do_skip & sel2
        r_i = d_here - 1
        s_cx = jnp.clip(
            jnp.floor(jnp.clip(ox + dx * t_land, -2.0, gx + 1.0)).astype(_I32),
            cx - r_i, cx + r_i,
        )
        # sel1 stays inside the band; sel2 lands exactly one row past the
        # boundary (fp-proof: derived from the band index, not the float t)
        s_y = jnp.where(
            sel2,
            jnp.where(up, bnd, bnd - 1),
            jnp.clip(
                jnp.floor(jnp.clip(oy + dy * t_land, -2.0, gy + 1.0))
                .astype(_I32),
                band * BAND_H, band * BAND_H + (BAND_H - 1),
            ),
        )
        s_cz = jnp.clip(
            jnp.floor(jnp.clip(oz + dz * t_land, -2.0, gz + 1.0)).astype(_I32),
            cz - r_i, cz + r_i,
        )

        use_x = tx <= tz                            # dda axis priority
        n_cx = cx + jnp.where(use_x, sx, 0)
        n_cz = cz + jnp.where(use_x, 0, sz)
        stp = jnp.where(use_x, sx, sz)
        n_axis = jnp.where(use_x, 0, 2)
        prev_t_n = bit_at(Tm, y_out)
        prev_l_n = bit_at(Lm, y_out)

        out["cx"] = jnp.where(do_skip, s_cx, n_cx)
        out["y"] = jnp.where(do_skip, s_y, y_out)
        out["cz"] = jnp.where(do_skip, s_cz, n_cz)
        # a sel2 landing's pending crossing is stamped at the exact
        # boundary time so a recorded hit matches the dda's t
        out["t_in"] = jnp.where(
            do_skip, jnp.where(sel2, t_bnd, t_land), t_exit
        )
        out["have_entry"] = (~do_skip | sel2).astype(_I32)
        out["ent_y"] = jnp.zeros_like(s["ent_y"])  # only the first event
        out["prev_t"] = jnp.where(do_skip, 1, prev_t_n)
        out["prev_l"] = jnp.where(do_skip, 1, prev_l_n)
        out["face_ent"] = jnp.where(
            sel2, 2 + (-sy > 0).astype(_I32),
            n_axis * 2 + (-stp > 0).astype(_I32),
        )
        out["face_ex"] = jnp.where(
            sel2, 2 + (sy > 0).astype(_I32),
            n_axis * 2 + (stp > 0).astype(_I32),
        )
        out["pcx"] = cx
        out["pcz"] = cz
        out["active"] = (
            act & ~new_hit & ~vert_leave & inside
            & (out["t_in"] <= limit)
            & (~do_skip | (t_land < t_vert))
            # sky early-out: risen above every solid voxel and not descending
            & ~((out["y"] >= ymax) & (sy >= 0))
        ).astype(_I32)
        return out

    def cond(s):
        if force_events:  # roofline measurement: run every event op
            return s["i"] < max_events
        return (s["i"] < max_events) & jnp.any(s["active"] != 0)

    def body(s):
        s = event(s)
        s["i"] = s["i"] + 1
        return s

    s = jax.lax.while_loop(cond, body, state)

    # ---- packed outputs (see _unpack_hits): shrinks kernel output DMA,
    # the stack merge, and the presort restore from 8 arrays to 3 ----
    pa_base = (
        s["o_hit"]
        | jax.lax.shift_left(s["o_ent"], 1)
        | jax.lax.shift_left(s["o_face"], 2)
        # 9 bits: leaves headroom for the stack wrapper to add slab bases
        | jax.lax.shift_left(jnp.clip(s["o_vy"] + 2, 0, 511), 5)
    )
    pa_ref[:] = pa_base | jax.lax.shift_left(
        jnp.full((R, T), air_id, _I32), 14
    )
    pb_ref[:] = (
        jnp.clip(s["o_vx"] + 2, 0, 1023)
        | jax.lax.shift_left(jnp.clip(s["o_vz"] + 2, 0, 1023), 10)
    )
    t_ref[:] = s["o_t"]

    # ---- owner block id: one palette-matmul extract per tile, skipped
    # entirely when the tile recorded no hit (common for stacked slabs) ----
    fin_hit = s["o_hit"] != 0

    @pl.when(jnp.any(fin_hit))
    def _owner_extract():
        idc = extract_chunks(mid_ref[:], N_ID_CHUNKS, s["o_vx"], s["o_vz"])
        ksel = jnp.clip(s["o_vy"], 0, 31) >> 1
        pair = jnp.zeros((R, T), _I32)
        for k in range(N_ID_CHUNKS):
            pair = jnp.where(ksel == k, idc[k], pair)
        pidx = jax.lax.shift_right_logical(
            pair, 4 * (jnp.clip(s["o_vy"], 0, 31) & 1)
        ) & 15
        owner = jnp.full((R, T), air_id, _I32)
        for j in range(MAX_PALETTE):
            owner = jnp.where(fin_hit & (pidx == j), pal_ref[0, j], owner)
        pa_ref[:] = pa_base | jax.lax.shift_left(owner, 14)


def column_trace(
    pack: ColumnPack,
    grid_origin: jax.Array,       # (3,) i32 world coords of grid[0,0,0]
    origin: jax.Array,            # (N, 3) f32 world space
    direction: jax.Array,         # (N, 3) f32; zero => inactive
    *,
    gy: Optional[int] = None,
    t_min: float = EPSILON_BLOCK,
    t_max: float = T_MAX,
    t_cap: Optional[jax.Array] = None,   # (N,) f32 per-ray upper bound
    max_events: int = 384,
    air_id: int = 255,
    tile: int = 512,
    packed: bool = False,
    interpret: bool = False,
    _force_events: bool = False,
) -> VoxelHit:
    """Drop-in Pallas replacement for intersect.dda_trace (same VoxelHit).

    packed=True returns the raw (pa, pb, t) output words (see
    _unpack_hits) — the stack wrapper merges/restores in packed form and
    unpacks once at the end."""
    n_rows, gx = pack.m1.shape
    gz = n_rows // (
        (8 if pack.has_glass else 4)
        + N_BANDS // 2
        + (1 if pack.has_ctx else 0)
    )
    if gy is None:
        gy = pack.gy
    origin = jnp.asarray(origin, _F32)
    direction = jnp.asarray(direction, _F32)
    n = origin.shape[0]
    go = jnp.asarray(grid_origin, _I32).astype(_F32)

    # tile = rays per kernel invocation; rows of 128 lanes, >= 8 sublanes
    rows = max(tile // 128, 8)
    tile = rows * 128
    n_pad = -n % tile
    n_tiles = (n + n_pad) // tile

    def prep(x):
        if n_pad:
            x = jnp.concatenate([x, jnp.zeros((n_pad,), x.dtype)])
        return x.reshape(n_tiles * rows, 128)

    ox = prep(origin[:, 0] - go[0])
    oy = prep(origin[:, 1] - go[1])
    oz = prep(origin[:, 2] - go[2])
    dx = prep(direction[:, 0])
    dy = prep(direction[:, 1])
    dz = prep(direction[:, 2])
    if t_cap is None:
        cap = jnp.full((n_tiles * rows, 128), _INF, _F32)
    else:
        cap = prep(jnp.asarray(t_cap, _F32))

    row_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, gx=gx, gy=gy, gz=gz, t_min=float(t_min), t_max=float(t_max),
        max_events=max_events, air_id=air_id,
        has_glass=pack.has_glass, ymax=pack.ymax, has_ctx=pack.has_ctx,
        force_events=_force_events,
    )
    out_sd = jax.ShapeDtypeStruct((n_tiles * rows, 128), _I32)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            full(), full(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec, row_spec, row_spec, row_spec, row_spec, row_spec,
            row_spec,
        ],
        out_specs=[row_spec] * 3,
        out_shape=[
            out_sd, out_sd,
            jax.ShapeDtypeStruct((n_tiles * rows, 128), _F32),
        ],
        interpret=interpret,
    )(pack.m1, pack.mid, pack.palette, ox, oy, oz, dx, dy, dz, cap)

    def unprep(x):
        return x.reshape(-1)[:n]

    pa, pb, t = (unprep(o) for o in outs)
    if packed:
        return pa, pb, t
    return _unpack_hits(pa, pb, t)


def _unpack_hits(pa, pb, t) -> VoxelHit:
    """Inverse of the kernel's output packing:
    pa: hit(0) | entered(1) | face(2..4) | vy+2(5..13) | owner(14..21)
    pb: vx+2(0..9) | vz+2(10..19)"""
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


def _coherence_key(grid_origin, origin, direction):
    """Sort key grouping rays of similar march length and locality into
    the same kernel tile: dead-last, then direction (vertical class,
    horizontal angle), then coarse origin cell.  The per-tile while_loop
    runs to the slowest lane, so tile homogeneity — not global order —
    is what cuts straggler time."""
    ox = origin[:, 0] - grid_origin[0].astype(_F32)
    oz = origin[:, 2] - grid_origin[2].astype(_F32)
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
    dead = ~jnp.any(direction != 0.0, axis=-1)
    dyq = jnp.clip((dy + 1.0) * 15.99, 0.0, 31.0).astype(jnp.uint32)
    ang = jnp.arctan2(dz, dx)
    angq = jnp.clip((ang + 3.1416) * 40.58, 0.0, 255.0).astype(jnp.uint32)
    xq = jnp.clip(ox * 0.125, 0.0, 255.0).astype(jnp.uint32)
    zq = jnp.clip(oz * 0.125, 0.0, 255.0).astype(jnp.uint32)
    return (
        (dead.astype(jnp.uint32) << 31)
        | (dyq << 26)
        | (angq << 18)
        | (xq << 10)
        | (zq << 2)
    )


def column_trace_stack(
    stack: ColumnStack,
    grid_origin: jax.Array,       # (3,) i32 world coords of grid[0,0,0]
    origin: jax.Array,            # (N, 3) f32 world space
    direction: jax.Array,         # (N, 3) f32; zero => inactive
    *,
    t_min: float = EPSILON_BLOCK,
    t_max: float = T_MAX,
    max_events: int = 384,
    air_id: int = 255,
    tile: int = 512,
    presort: bool = False,
    interpret: bool = False,
) -> VoxelHit:
    """Trace the slab stack: per-slab column_trace calls chained by a
    per-ray t-cap, merged closest-hit.  Boundary faces are reported exactly
    once, by the slab owning the face's voxel; equal-t enter/exit pairs at
    a slab boundary resolve to the entering face (the dda tie rule).

    Slabs are processed middle-out: rays overwhelmingly originate near the
    window's vertical center (ego/camera) and, in dense content, hit near
    their origin — so the center slab's hits cap the outer slabs' marches.
    The merge is exact for any order; the order only affects how much
    post-hit marching the cap prunes.

    presort: reorder rays by _coherence_key before tracing and restore
    after — both as MULTI-OPERAND lax.sort (payloads ride the sort
    network; ~3x cheaper than argsort+gathers on TPU).  An identity-
    preserving, image-invariant optimization for incoherent bounce rays."""
    grid_origin = jnp.asarray(grid_origin, _I32)
    origin = jnp.asarray(origin, _F32)
    direction = jnp.asarray(direction, _F32)
    if presort:
        n = origin.shape[0]
        key = _coherence_key(grid_origin, origin, direction)
        idx = jnp.arange(n, dtype=jnp.uint32)
        (_, ox, oy, oz, dx, dy, dz, idx_s) = jax.lax.sort(
            (key, origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2], idx),
            num_keys=1,
        )
        origin = jnp.stack([ox, oy, oz], axis=-1)
        direction = jnp.stack([dx, dy, dz], axis=-1)

    # merge/restore run on the kernel's PACKED output words (2 x i32 + t):
    # 3-array merges and a 4-operand restore sort instead of 8 each
    best = None
    kk = len(stack.packs)
    order = sorted(range(kk), key=lambda k: (abs(k - (kk - 1) / 2), k))
    for k in order:
        pack = stack.packs[k]
        go_k = grid_origin + jnp.asarray([0, k * SLAB_H, 0], _I32)
        pa, pb, t = column_trace(
            pack, go_k, origin, direction,
            t_min=t_min, t_max=t_max,
            t_cap=None if best is None else best[2],
            max_events=max_events, air_id=air_id, tile=tile,
            packed=True, interpret=interpret,
        )
        pa = pa + jnp.int32(k * SLAB_H << 5)   # vy -> global row
        if best is None:
            best = (pa, pb, t)
        else:
            b_pa, b_pb, b_t = best
            hit, b_hit = (pa & 1) != 0, (b_pa & 1) != 0
            ent, b_ent = (pa & 2) != 0, (b_pa & 2) != 0
            take = hit & (
                ~b_hit | (t < b_t) | ((t == b_t) & ent & ~b_ent)
            )
            # non-hit lanes carry vy-offset words; keep the hit flag OR'd
            # via take-selection (a miss never wins take)
            best = (
                jnp.where(take, pa, b_pa),
                jnp.where(take, pb, b_pb),
                jnp.where(take, t, b_t),
            )
    pa, pb, t = best
    if presort:
        # restore original ray order: one multi-operand sort keyed by the
        # carried original index (a uint32 permutation — exact inverse)
        (_, pa, pb, t) = jax.lax.sort((idx_s, pa, pb, t), num_keys=1)
    return _unpack_hits(pa, pb, t)
