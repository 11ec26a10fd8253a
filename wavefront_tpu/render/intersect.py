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

Dynamic (non-voxel) entities — e.g. the ego cube (reference main.rs:99-114)
— are intersected by a fixed-budget vectorized Moller-Trumbore sweep and
merged by closest hit, replacing per-entity BLAS.

All functions are shape-polymorphic over a leading ray dimension N and are
designed to live inside one `jax.jit` region.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from wavefront_tpu.core.config import EPSILON_BLOCK, T_MAX

_F32 = jnp.float32
_I32 = jnp.int32

# A value larger than any real hit t.
_INF_T = jnp.float32(3.0e38)


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
    # a huge inv so their crossing times never win the argmin.
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
    dims = jnp.array([gx, gy, gz], _F32)
    n = origin.shape[0]
    flat_grid = grid.reshape(-1)

    # grid-local ray
    p0 = origin - grid_origin.astype(_F32)
    d = direction
    valid = jnp.any(d != 0.0, axis=-1)

    inv = _safe_inv(d)                                   # (N,3)
    t_lo = (0.0 - p0) * inv
    t_hi = (dims - p0) * inv
    t_small = jnp.minimum(t_lo, t_hi)
    t_big = jnp.maximum(t_lo, t_hi)
    # ignore axes with ~zero direction (their slab is degenerate)
    moving = jnp.abs(d) > 1e-30
    t_near_ax = jnp.where(moving, t_small, -_INF_T)
    t_far_ax = jnp.where(moving, t_big, _INF_T)
    t_near = jnp.max(t_near_ax, axis=-1)
    t_far = jnp.min(t_far_ax, axis=-1)
    entry_axis = jnp.argmax(t_near_ax, axis=-1)

    t_entry = jnp.maximum(t_near, _F32(t_min))
    active = valid & (t_entry <= jnp.minimum(t_far, _F32(t_max)))

    step = jnp.where(d > 0, 1, jnp.where(d < 0, -1, 0)).astype(_I32)  # (N,3)

    # starting voxel: nudged inside along the ray
    pos = p0 + d * (t_entry[:, None] + _F32(1e-4))
    vox = jnp.floor(pos).astype(_I32)
    # rays entering from outside start in the pre-entry voxel so the entry
    # crossing itself is evaluated by the loop
    starts_outside = t_near > _F32(t_min)
    entry_onehot = jax.nn.one_hot(entry_axis, 3, dtype=_I32)
    vox = vox - jnp.where(starts_outside[:, None], step * entry_onehot, 0)

    def lookup(vx, vy, vz):
        inside = (
            (vx >= 0) & (vx < gx) & (vy >= 0) & (vy < gy) & (vz >= 0) & (vz < gz)
        )
        idx = (
            jnp.clip(vx, 0, gx - 1) * (gy * gz)
            + jnp.clip(vy, 0, gy - 1) * gz
            + jnp.clip(vz, 0, gz - 1)
        )
        blk = flat_grid[idx].astype(_I32)
        return jnp.where(inside, blk, _I32(air_id)), inside

    cur_block, _ = lookup(vox[:, 0], vox[:, 1], vox[:, 2])

    # crossing times from the *current* voxel (exact, drift-free)
    def crossing_times(vox):
        bound = vox.astype(_F32) + (step > 0).astype(_F32)
        tm = (bound - p0) * inv
        return jnp.where(moving, tm, _INF_T)

    tmax = crossing_times(vox)

    out = dict(
        hit=jnp.zeros(n, bool),
        t=jnp.full(n, _INF_T, _F32),
        owner=jnp.full(n, air_id, _I32),
        face=jnp.zeros(n, _I32),
        vox=jnp.zeros((n, 3), _I32),
        entered=jnp.zeros(n, bool),
    )

    limit = jnp.minimum(t_far, _F32(t_max))

    def cond(c):
        return (c["i"] < max_steps) & jnp.any(c["active"])

    def body(c):
        vox, tmax, cur, act = c["vox"], c["tmax"], c["cur"], c["active"]
        axis = jnp.argmin(tmax, axis=-1)                    # (N,)
        t_cross = jnp.take_along_axis(tmax, axis[:, None], axis=-1)[:, 0]
        ax_onehot = jax.nn.one_hot(axis, 3, dtype=_I32)
        nvox = vox + step * ax_onehot
        nxt, inside_nxt = lookup(nvox[:, 0], nvox[:, 1], nvox[:, 2])

        enter_hit = (~transparent[nxt]) & translucent[cur]
        exit_hit = (~transparent[cur]) & translucent[nxt]
        within = act & (t_cross <= limit) & (t_cross >= _F32(t_min))
        is_hit = within & (enter_hit | exit_hit)

        # face index: axis*2 + (outward normal positive ? 1 : 0)
        ax_step = jnp.take_along_axis(step, axis[:, None], axis=-1)[:, 0]
        # entering: owner = nxt, outward normal = -step  -> sign = -ax_step
        # exiting:  owner = cur, outward normal = +step  -> sign = +ax_step
        entered = enter_hit  # entering wins ties
        normal_sign = jnp.where(entered, -ax_step, ax_step)
        face = axis.astype(_I32) * 2 + (normal_sign > 0).astype(_I32)
        owner = jnp.where(entered, nxt, cur)
        owner_vox = jnp.where(entered[:, None], nvox, vox)

        new = is_hit & ~c["out_hit"]
        out_hit = c["out_hit"] | is_hit
        out_t = jnp.where(new, t_cross, c["out_t"])
        out_owner = jnp.where(new, owner, c["out_owner"])
        out_face = jnp.where(new, face, c["out_face"])
        out_vox = jnp.where(new[:, None], owner_vox, c["out_vox"])
        out_entered = jnp.where(new, entered, c["out_entered"])

        # deactivate: got a hit, left the grid for good (grid is convex), or
        # stepped past the clip range
        act = act & ~is_hit & inside_nxt & (t_cross <= limit)

        tmax = tmax + jnp.abs(inv) * ax_onehot.astype(_F32)
        return dict(
            i=c["i"] + 1,
            vox=nvox,
            tmax=tmax,
            cur=nxt,
            active=act,
            out_hit=out_hit,
            out_t=out_t,
            out_owner=out_owner,
            out_face=out_face,
            out_vox=out_vox,
            out_entered=out_entered,
        )

    init = dict(
        i=jnp.int32(0),
        vox=vox,
        tmax=tmax,
        cur=cur_block,
        active=active,
        out_hit=out["hit"],
        out_t=out["t"],
        out_owner=out["owner"],
        out_face=out["face"],
        out_vox=out["vox"],
        out_entered=out["entered"],
    )
    c = jax.lax.while_loop(cond, body, init)

    return VoxelHit(
        hit=c["out_hit"],
        t=c["out_t"],
        owner=c["out_owner"],
        face=c["out_face"],
        vx=c["out_vox"][:, 0],
        vy=c["out_vox"][:, 1],
        vz=c["out_vox"][:, 2],
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
