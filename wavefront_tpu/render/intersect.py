"""Ray intersection kernels.

The reference intersects rays against triangle meshes of voxel faces through
Vulkan's hardware ray query + two-level acceleration structures
(reference raytrace.rs:366-400, scene.rs:234-497).  TPUs have no ray-tracing
hardware, so the idiomatic intersector for voxel content is a **3-D DDA
(Amanatides & Woo) over the dense voxel grid**: branch-light, fixed trip
count, fully vectorized across the 8x128 VPU lanes, with the chunk window as
a single (Gx,Gy,Gz) uint8 array in HBM.  Radiometric outputs are identical
to the mesh path because the mesher's face-culling rule (a face exists
between voxel A and neighbor B iff A is not completely transparent and B is
translucent, reference chunk.rs:158-292) is evaluated directly per DDA
boundary crossing.

TPU performance shape:
  * per-ray state is SoA scalar arrays (vx/vy/vz/tx/ty/tz ...), never
    (N,3) — a trailing dim of 3 wastes 125/128 VPU lanes per tile;
  * the marching loop runs `unroll` crossings per `while_loop` iteration —
    sequential loop iterations carry fixed dispatch overhead, so fewer,
    fatter iterations win;
  * the loop gathers ONE byte per crossing from a precomputed *class grid*
    (bit0 = transparent, bit1 = translucent) instead of a block-id gather
    plus two table gathers; the owner block id is gathered once at the end.

Dynamic (non-voxel) entities — e.g. the ego cube (reference main.rs:99-114)
— are intersected by a fixed-budget vectorized Moller-Trumbore sweep and
merged by closest hit, replacing per-entity BLAS.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from wavefront_tpu.core.config import EPSILON_BLOCK, T_MAX

_F32 = jnp.float32
_I32 = jnp.int32

# A value larger than any real hit t.  Plain python float: a module-level
# jnp scalar would be a device array, forcing backend init at import time.
_INF_T = 3.0e38

CLASS_TRANSPARENT = 1  # bit0
CLASS_TRANSLUCENT = 2  # bit1
MAX_SKIP = 31          # distance field clamp (bits 2+; bigger jumps through sky)


def make_aux_grid(grid, transparent, translucent, max_skip: int = MAX_SKIP):
    """Precompute the DDA aux grid: bits0-1 voxel class, bits2-5 chebyshev
    distance to the nearest non-transparent voxel (clamped to `max_skip`).

    The distance field drives empty-space skipping: from a voxel at distance
    d >= 2 the ray can jump to the boundary of the radius-(d-1) cube without
    crossing any face (every voxel inside is air).  Built by iterated
    3^3 dilation of the non-air mask (separable per axis); hoisted out of
    the frame loop and rebuilt only when the grid changes.

    Returns int32 (gathers are cheapest at 32-bit on TPU).
    """
    import numpy as np

    grid = np.asarray(grid)
    transparent = np.asarray(transparent, bool)
    translucent = np.asarray(translucent, bool)
    cls = (
        transparent[grid].astype(np.int32) * CLASS_TRANSPARENT
        + translucent[grid].astype(np.int32) * CLASS_TRANSLUCENT
    )

    solid = ~transparent[grid]  # any face-owning voxel
    dist = np.full(grid.shape, max_skip, np.int32)
    reach = solid.copy()
    dist[reach] = 0

    def dilate(m):
        r = m.copy()
        r[1:, :, :] |= m[:-1, :, :]
        r[:-1, :, :] |= m[1:, :, :]
        m = r.copy()
        r[:, 1:, :] |= m[:, :-1, :]
        r[:, :-1, :] |= m[:, 1:, :]
        m = r.copy()
        r[:, :, 1:] |= m[:, :, :-1]
        r[:, :, :-1] |= m[:, :, 1:]
        return r

    for d in range(1, max_skip):
        if reach.all():
            break
        reach = dilate(reach)
        newly = reach & (dist == max_skip)
        dist[newly] = d

    return cls | (dist << 2)


def refresh_aux_box(grid, aux, transparent, translucent, lo, hi,
                    max_skip: int = MAX_SKIP, in_place: bool = False):
    """Recompute the aux grid exactly over the box [lo, hi) in place-copy
    semantics (returns a new array; `aux` is not mutated).

    A voxel's distance value depends only on solids within `max_skip` of
    it, so evaluating make_aux_grid on the box padded by max_skip and
    writing back only the box is exact.  Used by the streaming window
    shift: distances in the region the window KEPT can only have grown
    (content was removed at the trailing edge), and a too-small distance
    is conservative for the skip loop, so only ENTERED content needs a
    refresh (scene.update_grid).
    """
    import numpy as np

    grid = np.asarray(grid)
    aux = np.asarray(aux)
    lo = np.asarray(lo, np.int64)
    hi = np.asarray(hi, np.int64)
    plo = np.maximum(lo - max_skip, 0)
    phi = np.minimum(hi + max_skip, np.array(grid.shape))
    sub = grid[plo[0]:phi[0], plo[1]:phi[1], plo[2]:phi[2]]
    sub_aux = make_aux_grid(sub, transparent, translucent, max_skip)
    s = tuple(slice(int(a - p), int(b - p)) for a, b, p in zip(lo, hi, plo))
    # in_place: the caller owns `aux` (streaming loops refresh many boxes;
    # a defensive 66 MB copy per box dominated the recenter, measured)
    out = aux if in_place else aux.copy()
    out[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = sub_aux[s]
    return out


def update_aux_region(grid, aux, transparent, translucent, pos,
                      max_skip: int = MAX_SKIP):
    """Incrementally refresh the aux grid after a single-voxel edit at `pos`
    (grid-local).  A voxel's distance value depends only on solids within
    `max_skip` of it, so recomputing the cube of radius 2*max_skip around
    the edit (reading, writing back the inner radius-max_skip cube... the
    whole recomputed cube is written; values outside the influence radius
    come out unchanged) is exact.  Returns the updated aux array (numpy).

    This is the DDA analog of the reference's incremental edit path — which
    re-meshes the chunk and rebuilds its BLAS (chunk_manager.rs:331-392);
    here it is a local distance-transform refresh.
    """
    import numpy as np

    grid = np.asarray(grid)
    aux = np.asarray(aux)
    pos = np.asarray(pos, np.int64)
    r = 2 * max_skip + 1
    lo = np.maximum(pos - r, 0)
    hi = np.minimum(pos + r + 1, np.array(grid.shape))
    sub = grid[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
    sub_aux = make_aux_grid(sub, transparent, translucent, max_skip)
    # the outer shell of the subregion may see phantom "air" beyond its
    # borders, but those voxels are > max_skip from the edit and their
    # *distance upper bound* can only be wrong optimistically near the
    # cut; write back only the inner cube whose full neighborhood was seen
    ilo = np.maximum(pos - max_skip, 0)
    ihi = np.minimum(pos + max_skip + 1, np.array(grid.shape))
    s = tuple(slice(int(a - l), int(b - l)) for a, b, l in zip(ilo, ihi, lo))
    out = aux.copy()
    out[ilo[0]:ihi[0], ilo[1]:ihi[1], ilo[2]:ihi[2]] = sub_aux[s]
    return out


class VoxelHit(NamedTuple):
    """SoA result of the voxel DDA trace (per-ray)."""

    hit: jax.Array          # (N,)  bool
    t: jax.Array            # (N,)  f32, ray parameter of the hit
    owner: jax.Array        # (N,)  i32, block id owning the hit face
    face: jax.Array         # (N,)  i32 in [0,6): LEFT RIGHT DOWN UP BACK FRONT
    vx: jax.Array           # (N,)  i32 owner voxel coords (grid-local)
    vy: jax.Array
    vz: jax.Array
    entered: jax.Array      # (N,) bool: True = front-face (ray enters owner)


def _safe_inv(d):
    # 1/d with the sign preserved and infinities avoided; d==0 lanes produce
    # a huge inv so their crossing times never win the axis selection.
    tiny = jnp.where(d >= 0, _F32(1e-30), _F32(-1e-30))
    return _F32(1.0) / jnp.where(jnp.abs(d) < 1e-30, tiny, d)


def dda_trace(
    grid: jax.Array,            # (Gx, Gy, Gz) uint8 block ids
    grid_origin: jax.Array,     # (3,) i32 world coords of grid[0,0,0]
    transparent: jax.Array,     # (256,) bool block table
    translucent: jax.Array,     # (256,) bool
    air_id: int,
    origin: jax.Array,          # (N, 3) f32 world-space
    direction: jax.Array,       # (N, 3) f32, zero => inactive ray
    *,
    t_min: float = EPSILON_BLOCK,
    t_max: float = T_MAX,
    max_steps: int = 256,
    unroll: int = 8,
    aux_grid: Optional[jax.Array] = None,  # (Gx,Gy,Gz) i32, see make_aux_grid
) -> VoxelHit:
    """Vectorized voxel DDA: closest face hit per ray.

    Face-hit rule per boundary crossing cur -> nxt (derived from the mesher,
    reference chunk.rs:222-287):
      * entering:  nxt face toward cur exists iff !transparent(nxt) and
                   translucent(cur); owner = nxt (front-face hit).
      * exiting:   cur face toward nxt exists iff !transparent(cur) and
                   translucent(nxt); owner = cur (back-face hit, as the
                   reference's ray query also returns back faces).
    When both coplanar faces exist the entering face wins (the reference's
    closest-hit tie order is unspecified).
    """
    grid = jnp.asarray(grid)
    grid_origin = jnp.asarray(grid_origin, _I32)
    transparent = jnp.asarray(transparent, bool)
    translucent = jnp.asarray(translucent, bool)
    origin = jnp.asarray(origin, _F32)
    direction = jnp.asarray(direction, _F32)
    gx, gy, gz = grid.shape
    n = origin.shape[0]
    flat_grid = grid.reshape(-1)

    if aux_grid is None:
        # fallback for direct/test calls: class bits only, no skipping
        cls_of = (
            transparent.astype(jnp.int32) * CLASS_TRANSPARENT
            + translucent.astype(jnp.int32) * CLASS_TRANSLUCENT
        )
        aux_flat = cls_of[flat_grid.astype(_I32)]
    else:
        aux_flat = jnp.asarray(aux_grid, _I32).reshape(-1)
    # voxels outside the grid read as air: transparent + translucent, no skip
    air_aux = jnp.int32(CLASS_TRANSPARENT | CLASS_TRANSLUCENT)

    # SoA ray components (never keep (N,3) hot state: lane waste)
    px = origin[:, 0] - grid_origin[0].astype(_F32)
    py = origin[:, 1] - grid_origin[1].astype(_F32)
    pz = origin[:, 2] - grid_origin[2].astype(_F32)
    dx_, dy_, dz_ = direction[:, 0], direction[:, 1], direction[:, 2]
    valid = (dx_ != 0.0) | (dy_ != 0.0) | (dz_ != 0.0)

    ivx, ivy, ivz = _safe_inv(dx_), _safe_inv(dy_), _safe_inv(dz_)

    def slab(p, inv, dim, moving):
        lo = (0.0 - p) * inv
        hi = (dim - p) * inv
        near = jnp.where(moving, jnp.minimum(lo, hi), -_INF_T)
        far = jnp.where(moving, jnp.maximum(lo, hi), _INF_T)
        return near, far

    mx = jnp.abs(dx_) > 1e-30
    my = jnp.abs(dy_) > 1e-30
    mz = jnp.abs(dz_) > 1e-30
    nx_, fx_ = slab(px, ivx, _F32(gx), mx)
    ny_, fy_ = slab(py, ivy, _F32(gy), my)
    nz_, fz_ = slab(pz, ivz, _F32(gz), mz)
    t_near = jnp.maximum(nx_, jnp.maximum(ny_, nz_))
    t_far = jnp.minimum(fx_, jnp.minimum(fy_, fz_))

    t_entry = jnp.maximum(t_near, _F32(t_min))
    active = valid & (t_entry <= jnp.minimum(t_far, _F32(t_max)))

    sx = jnp.where(dx_ > 0, 1, jnp.where(dx_ < 0, -1, 0)).astype(_I32)
    sy = jnp.where(dy_ > 0, 1, jnp.where(dy_ < 0, -1, 0)).astype(_I32)
    sz = jnp.where(dz_ > 0, 1, jnp.where(dz_ < 0, -1, 0)).astype(_I32)

    # starting voxel: nudged inside along the ray
    tn = t_entry + _F32(1e-4)
    vx = jnp.floor(px + dx_ * tn).astype(_I32)
    vy = jnp.floor(py + dy_ * tn).astype(_I32)
    vz = jnp.floor(pz + dz_ * tn).astype(_I32)
    # rays entering from outside start in the pre-entry voxel so the entry
    # crossing itself is evaluated by the loop
    starts_outside = t_near > _F32(t_min)
    entry_x = starts_outside & (nx_ >= ny_) & (nx_ >= nz_)
    entry_y = starts_outside & ~entry_x & (ny_ >= nz_)
    entry_z = starts_outside & ~entry_x & ~entry_y
    vx = vx - jnp.where(entry_x, sx, 0)
    vy = vy - jnp.where(entry_y, sy, 0)
    vz = vz - jnp.where(entry_z, sz, 0)

    def aux_lookup(vx, vy, vz):
        inside = (
            (vx >= 0) & (vx < gx) & (vy >= 0) & (vy < gy) & (vz >= 0) & (vz < gz)
        )
        idx = (
            jnp.clip(vx, 0, gx - 1) * (gy * gz)
            + jnp.clip(vy, 0, gy - 1) * gz
            + jnp.clip(vz, 0, gz - 1)
        )
        c = aux_flat[idx]
        return jnp.where(inside, c, air_aux), inside

    cur_aux, _ = aux_lookup(vx, vy, vz)

    # crossing times from the current voxel (exact, drift-free)
    def cross_time(v, p, inv, s, moving):
        bound = v.astype(_F32) + (s > 0).astype(_F32)
        return jnp.where(moving, (bound - p) * inv, _INF_T)

    tx = cross_time(vx, px, ivx, sx, mx)
    ty = cross_time(vy, py, ivy, sy, my)
    tz = cross_time(vz, pz, ivz, sz, mz)

    limit = jnp.minimum(t_far, _F32(t_max))

    state = dict(
        i=jnp.int32(0),
        vx=vx, vy=vy, vz=vz,
        tx=tx, ty=ty, tz=tz,
        cur=cur_aux,
        active=active,
        out_hit=jnp.zeros(n, bool),
        out_t=jnp.full(n, _INF_T, _F32),
        out_face=jnp.zeros(n, _I32),
        out_vx=jnp.zeros(n, _I32),
        out_vy=jnp.zeros(n, _I32),
        out_vz=jnp.zeros(n, _I32),
        out_entered=jnp.zeros(n, bool),
    )

    def one_step(c):
        vx, vy, vz = c["vx"], c["vy"], c["vz"]
        tx, ty, tz = c["tx"], c["ty"], c["tz"]
        cur, act = c["cur"], c["active"]

        dist = cur >> 2
        do_skip = act & (dist >= 2)

        # ---- fine DDA crossing ----
        use_x = (tx <= ty) & (tx <= tz)
        use_y = (~use_x) & (ty <= tz)
        use_z = (~use_x) & (~use_y)
        t_cross = jnp.where(use_x, tx, jnp.where(use_y, ty, tz))

        f_vx = vx + jnp.where(use_x, sx, 0)
        f_vy = vy + jnp.where(use_y, sy, 0)
        f_vz = vz + jnp.where(use_z, sz, 0)

        # ---- empty-space skip: jump to just inside the exit of the
        # radius-(dist-1) empty cube around the current voxel ----
        r = (dist - 1).astype(_F32)
        vxf, vyf, vzf = vx.astype(_F32), vy.astype(_F32), vz.astype(_F32)
        ex = jnp.where(
            mx, ((vxf + jnp.where(sx > 0, r + 1.0, -r)) - px) * ivx, _INF_T
        )
        ey = jnp.where(
            my, ((vyf + jnp.where(sy > 0, r + 1.0, -r)) - py) * ivy, _INF_T
        )
        ez = jnp.where(
            mz, ((vzf + jnp.where(sz > 0, r + 1.0, -r)) - pz) * ivz, _INF_T
        )
        t_exit = jnp.minimum(ex, jnp.minimum(ey, ez))
        t_land = t_exit - _F32(1e-4)
        s_vx = jnp.floor(px + dx_ * t_land).astype(_I32)
        s_vy = jnp.floor(py + dy_ * t_land).astype(_I32)
        s_vz = jnp.floor(pz + dz_ * t_land).astype(_I32)

        # ---- merge the two movement modes ----
        nvx = jnp.where(do_skip, s_vx, f_vx)
        nvy = jnp.where(do_skip, s_vy, f_vy)
        nvz = jnp.where(do_skip, s_vz, f_vz)
        nxt_aux, inside_nxt = aux_lookup(nvx, nvy, nvz)

        # hit rule applies only to fine crossings (skips never cross faces)
        enter_hit = (
            ~do_skip
            & ((nxt_aux & CLASS_TRANSPARENT) == 0)
            & ((cur & CLASS_TRANSLUCENT) != 0)
        )
        exit_hit = (
            ~do_skip
            & ((cur & CLASS_TRANSPARENT) == 0)
            & ((nxt_aux & CLASS_TRANSLUCENT) != 0)
        )
        within = act & (t_cross <= limit) & (t_cross >= _F32(t_min))
        is_hit = within & (enter_hit | exit_hit)

        ax_step = jnp.where(use_x, sx, jnp.where(use_y, sy, sz))
        axis = jnp.where(use_x, 0, jnp.where(use_y, 1, 2)).astype(_I32)
        entered = enter_hit  # entering wins coplanar ties
        normal_sign = jnp.where(entered, -ax_step, ax_step)
        face = axis * 2 + (normal_sign > 0).astype(_I32)

        new = is_hit & ~c["out_hit"]
        out = dict(c)
        out["out_hit"] = c["out_hit"] | is_hit
        out["out_t"] = jnp.where(new, t_cross, c["out_t"])
        out["out_face"] = jnp.where(new, face, c["out_face"])
        out["out_vx"] = jnp.where(new, jnp.where(entered, nvx, vx), c["out_vx"])
        out["out_vy"] = jnp.where(new, jnp.where(entered, nvy, vy), c["out_vy"])
        out["out_vz"] = jnp.where(new, jnp.where(entered, nvz, vz), c["out_vz"])
        out["out_entered"] = jnp.where(new, entered, c["out_entered"])

        # progress measure: fine steps end when t_cross passes the clip
        # limit; skips when the landing point leaves the grid
        past = jnp.where(do_skip, t_land > limit, t_cross > limit)
        out["active"] = act & ~is_hit & inside_nxt & ~past
        out["vx"], out["vy"], out["vz"] = nvx, nvy, nvz
        # crossing times are RECOMPUTED from voxel indices every step (not
        # accumulated): incremental `t += |inv|` drifts by an ulp over a
        # march, which made boundary-exit faces at t == t_far fall past the
        # clip limit and report a miss where the scalar oracle (exact
        # per-step times, oracle.py:126-135) and the windowed kernel hit
        out["tx"] = cross_time(nvx, px, ivx, sx, mx)
        out["ty"] = cross_time(nvy, py, ivy, sy, my)
        out["tz"] = cross_time(nvz, pz, ivz, sz, mz)
        out["cur"] = nxt_aux
        return out

    def cond(c):
        return (c["i"] < max_steps) & jnp.any(c["active"])

    def body(c):
        for _ in range(unroll):
            c = one_step(c)
        c["i"] = c["i"] + unroll
        return c

    c = jax.lax.while_loop(cond, body, state)

    # one final block-id gather at the recorded hit voxel
    idx = (
        jnp.clip(c["out_vx"], 0, gx - 1) * (gy * gz)
        + jnp.clip(c["out_vy"], 0, gy - 1) * gz
        + jnp.clip(c["out_vz"], 0, gz - 1)
    )
    owner = jnp.where(
        c["out_hit"], flat_grid[idx].astype(_I32), _I32(air_id)
    )

    return VoxelHit(
        hit=c["out_hit"],
        t=c["out_t"],
        owner=owner,
        face=c["out_face"],
        vx=c["out_vx"],
        vy=c["out_vy"],
        vz=c["out_vz"],
        entered=c["out_entered"],
    )


class TriHit(NamedTuple):
    hit: jax.Array       # (N,) bool
    t: jax.Array         # (N,) f32
    tri: jax.Array       # (N,) i32 index of the winning triangle
    bary_u: jax.Array    # (N,) f32 barycentric of vertex 1
    bary_v: jax.Array    # (N,) f32 barycentric of vertex 2


def triangle_sweep(
    tri_verts: jax.Array,    # (T, 3, 3) f32
    tri_active: jax.Array,   # (T,) bool
    origin: jax.Array,       # (N, 3)
    direction: jax.Array,    # (N, 3)
    *,
    t_min: float = EPSILON_BLOCK,
    t_max: float = T_MAX,
) -> TriHit:
    """Closest-hit Moller-Trumbore over a fixed triangle budget.

    Replaces per-entity hardware BLAS for the handful of dynamic meshes
    (reference scene.rs:150-202).  O(N*T) but T is a small static budget.
    """
    tri_verts = jnp.asarray(tri_verts, _F32)
    tri_active = jnp.asarray(tri_active, bool)
    origin = jnp.asarray(origin, _F32)
    direction = jnp.asarray(direction, _F32)
    v0 = tri_verts[:, 0]                      # (T,3)
    e1 = tri_verts[:, 1] - v0
    e2 = tri_verts[:, 2] - v0

    # broadcast (N,1,3) x (1,T,3)
    o = origin[:, None, :]
    d = direction[:, None, :]
    pvec = jnp.cross(d, e2[None, :, :])                        # (N,T,3)
    det = jnp.sum(pvec * e1[None, :, :], axis=-1)              # (N,T)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0[None, :, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det

    ok = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= t_min)
        & (t <= t_max)
        & tri_active[None, :]
        & jnp.any(direction != 0.0, axis=-1)[:, None]
    )
    t = jnp.where(ok, t, _INF_T)
    best = jnp.argmin(t, axis=-1)                               # (N,)
    best_t = jnp.take_along_axis(t, best[:, None], axis=-1)[:, 0]
    best_u = jnp.take_along_axis(u, best[:, None], axis=-1)[:, 0]
    best_v = jnp.take_along_axis(v, best[:, None], axis=-1)[:, 0]
    any_hit = best_t < _INF_T
    return TriHit(
        hit=any_hit,
        t=best_t,
        tri=best.astype(_I32),
        bary_u=best_u,
        bary_v=best_v,
    )
