"""Pallas TPU kernel: fused entity-triangle sweep.

The XLA version (render/intersect.triangle_sweep) materializes several
(N, T) intermediates in HBM for the Moller-Trumbore test against the entity
triangle pool.  This kernel keeps the whole per-triangle loop in registers/
VMEM: each grid step loads a block of rays, iterates the (static) triangle
budget with scalar reads of the packed triangle constants, and writes only
the per-ray closest-hit results.

Pure vector math — no gathers — so it stays inside Mosaic's current
operation set (dynamic gathers are unsupported, docs/PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavefront_tpu.core.config import EPSILON_BLOCK, T_MAX
from wavefront_tpu.render.intersect import TriHit

_F32 = jnp.float32
_I32 = jnp.int32
_INF = 3.0e38  # plain float: jnp scalars would be captured consts in pallas


def _kernel(tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            t_ref, tri_idx_ref, bu_ref, bv_ref,
            *, n_tris: int, t_min: float, t_max: float):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    moving = (dx != 0.0) | (dy != 0.0) | (dz != 0.0)

    best_t = jnp.full(ox.shape, _INF, _F32)
    best_i = jnp.zeros(ox.shape, _F32)
    best_u = jnp.zeros(ox.shape, _F32)
    best_v = jnp.zeros(ox.shape, _F32)

    for t in range(n_tris):
        # packed per-tri constants: v0(3), e1(3), e2(3), active(1)
        v0x, v0y, v0z = tri_ref[t, 0], tri_ref[t, 1], tri_ref[t, 2]
        e1x, e1y, e1z = tri_ref[t, 3], tri_ref[t, 4], tri_ref[t, 5]
        e2x, e2y, e2z = tri_ref[t, 6], tri_ref[t, 7], tri_ref[t, 8]
        act = tri_ref[t, 9]

        # pvec = d x e2
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = px * e1x + py * e1y + pz * e1z
        ok_det = jnp.abs(det) > 1e-12
        inv_det = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        u = (tvx * px + tvy * py + tvz * pz) * inv_det
        # qvec = tvec x e1
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        th = (e2x * qx + e2y * qy + e2z * qz) * inv_det

        ok = (
            ok_det & moving & (act > 0)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (th >= t_min) & (th <= t_max) & (th < best_t)
        )
        best_t = jnp.where(ok, th, best_t)
        best_i = jnp.where(ok, _F32(t), best_i)
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, v, best_v)

    t_ref[:] = best_t
    tri_idx_ref[:] = best_i
    bu_ref[:] = best_u
    bv_ref[:] = best_v


def triangle_sweep_pallas(
    tri_verts: jax.Array,    # (T, 3, 3) f32
    tri_active: jax.Array,   # (T,) bool
    origin: jax.Array,       # (N, 3)
    direction: jax.Array,    # (N, 3)
    *,
    t_min: float = EPSILON_BLOCK,
    t_max: float = T_MAX,
    block: int = 65536,
    interpret: bool = False,
) -> TriHit:
    """Drop-in replacement for intersect.triangle_sweep."""
    tri_verts = jnp.asarray(tri_verts, _F32)
    tri_active = jnp.asarray(tri_active, bool)
    origin = jnp.asarray(origin, _F32)
    direction = jnp.asarray(direction, _F32)

    n = origin.shape[0]
    n_tris = tri_verts.shape[0]
    v0 = tri_verts[:, 0]
    e1 = tri_verts[:, 1] - v0
    e2 = tri_verts[:, 2] - v0
    packed = jnp.concatenate(
        [v0, e1, e2, tri_active[:, None].astype(_F32)], axis=1
    )                                                       # (T, 10)

    # 2-D ray layout (rows, 512): Mosaic wants tiled 2-D blocks in VMEM
    lanes = 512
    rows_per_block = max(block // lanes, 8)
    pad = (-n) % (rows_per_block * lanes)

    def comp(a, i):
        c = a[:, i]
        c = jnp.pad(c, (0, pad)) if pad else c
        return c.reshape(-1, lanes)

    parts = [comp(origin, i) for i in range(3)] + [
        comp(direction, i) for i in range(3)
    ]
    rows = parts[0].shape[0]
    grid = (rows // rows_per_block,)
    ray_spec = pl.BlockSpec(
        (rows_per_block, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _kernel, n_tris=n_tris, t_min=t_min, t_max=t_max
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((rows, lanes), _F32) for _ in range(4)
        ],
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 6,
        out_specs=[ray_spec] * 4,
        interpret=interpret,
    )(packed, *parts)
    best_t, best_i, best_u, best_v = [o.reshape(-1)[:n] for o in outs]
    hit = best_t < _INF
    return TriHit(
        hit=hit,
        t=best_t,
        tri=best_i.astype(_I32),
        bary_u=best_u,
        bary_v=best_v,
    )
