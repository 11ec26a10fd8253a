"""Wavefront shading stages as pure JAX functions.

The reference splits the frame into five GLSL compute passes over flat ray
queues: raygen (raygen.rs), intersect+shade+sample (raytrace.rs), NEE pdf
(nee_pdf.rs), backward radiance (outgoing_radiance.rs), postprocess
(postprocess.rs).  Here each pass is a pure function over SoA ray arrays;
the renderer fuses them into one jitted program, so XLA's dataflow replaces
every pipeline barrier of the reference (interactive_rendering.rs:1080-1487).

Radiometric semantics are kept bit-faithful where practical (murmur3 draw
order, scatter rules, MIS weights, sky model); structural divergences
(DDA instead of ray query, one-level light BVH, face quads as light prims,
canonical per-face tangent frames) are documented inline.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from wavefront_tpu.core.config import (
    EPSILON_BLOCK,
    EPSILON_NEE,
    T_MAX,
)
from wavefront_tpu.core.rng import murmur3_combine, murmur3_finalizef
from wavefront_tpu.core import vec3
from wavefront_tpu.core.vec3 import V3

_F32 = jnp.float32
_I32 = jnp.int32
_U32 = jnp.uint32
# numpy scalar (NOT jnp: a module-level jnp scalar would be a device array,
# forcing backend init at import time; plain python int overflows int32
# weak-typing in comparisons)
import numpy as _np

_SENTINEL = _np.uint32(0xFFFFFFFF)
_PI = math.pi


def _as_v3(p) -> V3:
    """Accept (N, 3) arrays or V3 component tuples (the shade hot path is
    SoA — docs/PERF.md lane economics; array callers keep working)."""
    if isinstance(p, V3):
        return p
    return V3.from_array(jnp.asarray(p, _F32))


class LightArrays(NamedTuple):
    """Device mirror of lights.LightSet (all padded to static buckets)."""

    p0: jax.Array          # (P, 3)
    e1: jax.Array          # (P, 3)
    e2: jax.Array          # (P, 3)
    is_tri: jax.Array      # (P,)
    area: jax.Array        # (P,)
    power: jax.Array       # (P,)
    leaf_node: jax.Array   # (P,) u32
    num_prims: jax.Array   # () i32
    node_left: jax.Array   # (M,) u32
    node_right: jax.Array  # (M,) u32
    node_min: jax.Array    # (M, 3)
    node_max: jax.Array    # (M, 3)
    node_power: jax.Array  # (M,)
    node_parent: jax.Array  # (M,) u32
    ancestors: jax.Array   # (M, P) f32 path-indicator by prim column,
    #                        or (1,1) when the dense path is disabled
    leaf_prim: jax.Array   # (M,) i32 prim per leaf column, -1 elsewhere
    prim_min: jax.Array    # (P, 3) exact prim AABBs (leaf bounds)
    prim_max: jax.Array    # (P, 3)

    @property
    def dense(self) -> bool:
        """Static: whether the MXU dense path is enabled for this set."""
        return self.ancestors.shape[0] > 1


# ---------------------------------------------------------------------------
# raygen (reference raygen.rs:88-116)
# ---------------------------------------------------------------------------


def raygen_soa(eye, front, right, up, width: int, height: int,
               jitter: float = 0.0, seed=None):
    """Pinhole rays for every pixel as SoA components; returns
    (origin V3, direction V3, ray ids (N,)) with N = width*height,
    id = y*width + x.  Component arrays keep the per-ray math on full
    128-lane vectors (docs/PERF.md: (N,3) elementwise is 2.5x worse).

    jitter: sub-pixel anti-aliasing amplitude in pixels.  The reference
    computes the same murmur3 jitter but multiplies it by 0.00
    (raygen.rs:108-111); enabling it here (with temporal accumulation)
    recovers anti-aliasing.  Default 0 preserves reference behavior.
    """
    front = jnp.asarray(front, _F32)
    right = jnp.asarray(right, _F32)
    up = jnp.asarray(up, _F32)

    n = width * height
    y = jax.lax.broadcasted_iota(_I32, (height, width), 0)
    x = jax.lax.broadcasted_iota(_I32, (height, width), 1)
    # uv = 2*screen/size - 1 (reference raygen.rs:84-86,103)
    u = 2.0 * x.astype(_F32) / _F32(width) - 1.0
    v = 2.0 * y.astype(_F32) / _F32(height) - 1.0
    if jitter != 0.0 and seed is not None:
        pid = (y * width + x).astype(jnp.uint32)
        s = murmur3_combine(jnp.asarray(seed, jnp.uint32), pid)
        ju = murmur3_finalizef(murmur3_combine(s, jnp.uint32(0))) - 0.5
        jv = murmur3_finalizef(murmur3_combine(s, jnp.uint32(1))) - 0.5
        u = u + jitter * (2.0 / width) * ju
        v = v + jitter * (2.0 / height) * jv
    aspect = _F32(width / height)

    u = u.reshape(n)
    v = v.reshape(n)
    # association matches the packed form ((u*right)*aspect + v*up) + front
    d = V3(
        u * right[0] * aspect + v * up[0] + front[0],
        u * right[1] * aspect + v * up[1] + front[1],
        u * right[2] * aspect + v * up[2] + front[2],
    )
    d = d / vec3.norm(d)
    eye_j = jnp.asarray(eye, _F32)
    origin = V3(
        jnp.broadcast_to(eye_j[0], (n,)),
        jnp.broadcast_to(eye_j[1], (n,)),
        jnp.broadcast_to(eye_j[2], (n,)),
    )
    ray_id = (y * width + x).reshape(n).astype(_U32)
    return origin, d, ray_id


def raygen(eye, front, right, up, width: int, height: int,
           jitter: float = 0.0, seed=None):
    """(N, 3)-array wrapper over raygen_soa (tools and oracle callers)."""
    o, d, ray_id = raygen_soa(
        eye, front, right, up, width, height, jitter=jitter, seed=seed
    )
    return o.stack(), d.stack(), ray_id


# ---------------------------------------------------------------------------
# light BVH walks (reference raytrace.rs:186-293, nee_pdf.rs:119-228)
# ---------------------------------------------------------------------------


def _pack_nodes(lights: LightArrays):
    """Pack the node SoA into one (M, 10) f32 row matrix so each BVH-walk
    iteration is a row gather instead of ten scalar gathers.

    Columns: [left, right, parent, power, minx, miny, minz, maxx, maxy, maxz]
    with left/right/parent as exact small integers in f32 and the 0xFFFFFFFF
    sentinel mapped to -1.0 (u32 -> i32 cast).
    """
    def idxf(a):
        return a.astype(_I32).astype(_F32)

    return jnp.stack(
        [
            idxf(lights.node_left),
            idxf(lights.node_right),
            idxf(lights.node_parent),
            lights.node_power,
            lights.node_min[:, 0],
            lights.node_min[:, 1],
            lights.node_min[:, 2],
            lights.node_max[:, 0],
            lights.node_max[:, 1],
            lights.node_max[:, 2],
        ],
        axis=-1,
    )


def _row_importance(point: V3, normal: V3, row, eps):
    """nodeImportance from a packed node row (reference raytrace.rs:193-220):
    power / distance^2 times the visible fraction of the 8 aabb corners.

    point/normal: V3 of (N,); row: (N,10) gathered rows.
    """
    x, y, z = point.x, point.y, point.z
    nx_, ny_, nz_ = normal.x, normal.y, normal.z
    power = row[:, 3]
    mnx, mny, mnz = row[:, 4], row[:, 5], row[:, 6]
    mxx, mxy, mxz = row[:, 7], row[:, 8], row[:, 9]

    visible = jnp.zeros_like(power)
    for cx in (0, 1):
        px = mxx if cx else mnx
        dx = (px - x) * nx_
        for cy in (0, 1):
            py = mxy if cy else mny
            dy = (py - y) * ny_
            for cz in (0, 1):
                pz = mxz if cz else mnz
                dz = (pz - z) * nz_
                visible = visible + (dx + dy + dz >= eps).astype(_F32)
    diag_sq = (mxx - mnx) ** 2 + (mxy - mny) ** 2 + (mxz - mnz) ** 2
    cx_ = 0.5 * (mnx + mxx) - x
    cy_ = 0.5 * (mny + mxy) - y
    cz_ = 0.5 * (mnz + mxz) - z
    dist_sq = jnp.maximum(diag_sq, cx_ * cx_ + cy_ * cy_ + cz_ * cz_)
    return power / dist_sq * (visible / 8.0)


# ---------------------------------------------------------------------------
# dense light-BVH math (TPU fast path)
#
# For small light sets the stochastic descent and reverse walk are replaced
# by dense linear algebra: importance of EVERY node against every shading
# point as an (N, M) broadcast (zero gathers), per-node normalized branch
# probabilities via the builder's adjacent-sibling layout (a pair swap, no
# gathers), and per-PRIM path probabilities via one (N,M)x(M,P) matmul with
# the precomputed ancestor indicator — MXU work instead of pointer chasing.
# Sampling draws ONE uniform and inverts the prim CDF in prim order; the
# NEE-pdf sweep reads walk probabilities by static prim-column slices, so
# it accumulates EVERY light-prim crossing exactly (the reference walks all
# hits too, nee_pdf.rs:302-334 — no slot cap on this path).
#
# Radiometric divergence from the reference (documented): the reference
# draws a fresh uniform per tree level (raytrace.rs:282-291) and evaluates
# the reverse walk with a smaller epsilon (nee_pdf.rs:15); the dense path
# produces the identical *distribution* with a single draw and uses the
# trace epsilon throughout, making the MIS weights exactly consistent.
# ---------------------------------------------------------------------------


def dense_node_importance(lights: LightArrays, point, normal, eps):
    """(N, M) importance of every node from every shading point
    (nodeImportance, reference raytrace.rs:193-220), no gathers."""
    point, normal = _as_v3(point), _as_v3(normal)
    x, y, z = point.x[:, None], point.y[:, None], point.z[:, None]  # (N,1)
    nx_, ny_, nz_ = normal.x[:, None], normal.y[:, None], normal.z[:, None]
    mn = lights.node_min                                          # (M,3)
    mx = lights.node_max
    power = lights.node_power[None, :]                            # (1,M)
    mnx, mny, mnz = mn[None, :, 0], mn[None, :, 1], mn[None, :, 2]
    mxx, mxy, mxz = mx[None, :, 0], mx[None, :, 1], mx[None, :, 2]

    visible = None
    for cx in (mnx, mxx):
        dx = (cx - x) * nx_
        for cy in (mny, mxy):
            dy = (cy - y) * ny_
            for cz in (mnz, mxz):
                dz = (cz - z) * nz_
                v = (dx + dy + dz >= eps).astype(_F32)
                visible = v if visible is None else visible + v
    diag_sq = (mxx - mnx) ** 2 + (mxy - mny) ** 2 + (mxz - mnz) ** 2
    cx_ = 0.5 * (mnx + mxx) - x
    cy_ = 0.5 * (mny + mxy) - y
    cz_ = 0.5 * (mnz + mxz) - z
    dist_sq = jnp.maximum(diag_sq, cx_ * cx_ + cy_ * cy_ + cz_ * cz_)
    return power / dist_sq * (visible / 8.0)


def dense_prim_importance(lights: LightArrays, point, normal, eps):
    """(N, P) leaf importance of every prim from every shading point —
    nodeImportance evaluated at the prim's exact leaf AABB
    (reference raytrace.rs:193-220), pure elementwise broadcast math."""
    point, normal = _as_v3(point), _as_v3(normal)
    x, y, z = point.x[:, None], point.y[:, None], point.z[:, None]  # (N,1)
    nx_, ny_, nz_ = normal.x[:, None], normal.y[:, None], normal.z[:, None]
    mn = lights.prim_min                                           # (P,3)
    mx = lights.prim_max
    power = lights.power[None, :]                                  # (1,P)
    mnx, mny, mnz = mn[None, :, 0], mn[None, :, 1], mn[None, :, 2]
    mxx, mxy, mxz = mx[None, :, 0], mx[None, :, 1], mx[None, :, 2]

    visible = None
    for cx in (mnx, mxx):
        dx = (cx - x) * nx_
        for cy in (mny, mxy):
            dy = (cy - y) * ny_
            for cz in (mnz, mxz):
                dz = (cz - z) * nz_
                v = (dx + dy + dz >= eps).astype(_F32)
                visible = v if visible is None else visible + v
    diag_sq = (mxx - mnx) ** 2 + (mxy - mny) ** 2 + (mxz - mnz) ** 2
    cx_ = 0.5 * (mnx + mxx) - x
    cy_ = 0.5 * (mny + mxy) - y
    cz_ = 0.5 * (mnz + mxz) - z
    dist_sq = jnp.maximum(diag_sq, cx_ * cx_ + cy_ * cy_ + cz_ * cz_)
    # padded prim columns have zero extent AND zero power; guard the 0/0
    return power / jnp.maximum(dist_sq, 1e-30) * (visible / 8.0)


def dense_prim_probs(lights: LightArrays, point, normal, eps=EPSILON_BLOCK):
    """(N, P) descent probability of every prim.

    prob(q) = prod over non-root root->leaf(q) path nodes a of
              imp(a) / (imp(a) + imp(sibling(a)))
    computed as exp(log_nimp @ ancestors) with ancestors keyed by prim
    column; padded prim columns are masked to 0.
    """
    imp = dense_node_importance(lights, point, normal, eps)       # (N,M)
    n, m = imp.shape
    # sibling pairs are (1,2), (3,4), ... by builder construction; padded
    # tail columns (importance 0) are left unswapped
    m2 = ((m - 1) // 2) * 2
    pair = imp[:, 1 : 1 + m2].reshape(n, m2 // 2, 2)
    swapped = pair[:, :, ::-1].reshape(n, m2)
    imp_sib = jnp.concatenate(
        [imp[:, :1], swapped, imp[:, 1 + m2 :]], axis=1
    )
    total = imp + imp_sib
    nimp = jnp.where(total > 0, imp / jnp.maximum(total, 1e-30), 0.0)
    nimp = nimp.at[:, 0].set(1.0)  # root has no sibling
    log_nimp = jnp.log(jnp.maximum(nimp, 1e-35))
    # precision=HIGHEST: TPU DEFAULT-precision f32 dots round the operands
    # toward bf16 passes; log values reach ~-80 (the 1e-35 floor), where
    # bf16 rounding is +-0.25 absolute -> up to ~e^0.25 = 28% pdf error
    # after exp.  Measured as the config-1 hardware-golden divergence
    # (1312 px, max 0.51, identical in every shade arm — docs/PERF.md
    # round 4).  The matrices are (M,P)=(16,8)-tiny; exactness is free.
    logp = jnp.dot(
        log_nimp, lights.ancestors, preferred_element_type=_F32,
        precision=jax.lax.Precision.HIGHEST,
    )
    p = lights.ancestors.shape[1]
    valid = (
        jnp.arange(p, dtype=_I32)[None, :] < lights.num_prims.astype(_I32)
    )
    return jnp.where(valid, jnp.exp(logp), 0.0)


def dense_sample_light(lights: LightArrays, point, normal, seed, active):
    """Importance-proportional prim pick from the dense probability matrix;
    replaces traverse_light_bvh on the dense path.  Returns BvhSample plus
    the (N, P) prim-probability matrix for reuse by the pdf pass."""
    probs = dense_prim_probs(lights, point, normal)
    imp = dense_prim_importance(lights, point, normal, EPSILON_BLOCK)
    total = probs.sum(axis=1)                                      # (N,)

    u = murmur3_finalizef(seed) * total
    cum = jnp.cumsum(probs, axis=1)
    # first prim column whose cumulative reaches u
    reached = cum >= u[:, None]
    before = jnp.concatenate(
        [jnp.zeros_like(reached[:, :1]), reached[:, :-1]], axis=1
    )
    pick = reached & ~before & (probs > 0)                         # one-hot
    p = probs.shape[1]
    cols = jnp.arange(p, dtype=_F32)[None, :]
    prim_f = (pick * cols).sum(1)
    prob = (pick * probs).sum(1)
    importance = (pick * imp).sum(1)

    ok = active & (total > 0) & pick.any(axis=1)
    return (
        BvhSample(
            success=ok,
            prim=jnp.where(ok, prim_f.astype(_I32), 0),
            probability=prob,
            importance=importance,
        ),
        probs,
    )


class BvhSample(NamedTuple):
    success: jax.Array      # (N,) bool
    prim: jax.Array         # (N,) i32
    probability: jax.Array  # (N,)
    importance: jax.Array   # (N,)


def traverse_light_bvh(
    lights: LightArrays, point, normal, seed, active, max_depth: int
) -> BvhSample:
    """Stochastic top-down descent, importance-proportional at every split
    (reference raytrace.rs:230-293), over the one-level global BVH.

    The reference hops from a top-level BVH into a per-instance bottom-level
    BVH (raytrace.rs:251-261); with a single global tree the hop disappears
    but branch probabilities are computed identically.
    """
    point, normal = _as_v3(point), _as_v3(normal)
    n = point.x.shape[0]
    packed = _pack_nodes(lights)
    root_left = lights.node_left[0]
    root_right = lights.node_right[0]
    # dummy-root check (reference raytrace.rs:235-243)
    have_lights = ~((root_left == _SENTINEL) & (root_right == _SENTINEL))

    root_leaf = root_left == _SENTINEL
    root_imp = _row_importance(
        point, normal, jnp.broadcast_to(packed[0], (n, packed.shape[1])),
        EPSILON_BLOCK,
    )

    def cond(c):
        return jnp.any(c["running"]) & (c["i"] < max_depth)

    def body(c):
        node, prob, imp, s, running = (
            c["node"], c["prob"], c["imp"], c["seed"], c["running"],
        )
        row = packed[node]                                 # (N,10)
        is_leaf = row[:, 0] < 0
        li = jnp.maximum(row[:, 0], 0.0).astype(_I32)
        ri = jnp.maximum(row[:, 1], 0.0).astype(_I32)
        lrow = packed[li]
        rrow = packed[ri]
        imp_l = _row_importance(point, normal, lrow, EPSILON_BLOCK)
        imp_r = _row_importance(point, normal, rrow, EPSILON_BLOCK)
        total = imp_l + imp_r
        # the reference divides blindly (raytrace.rs:279-280); a 0/0 NaN makes
        # the comparison false and sends the walk right with importance 0,
        # which the caller then rejects.  Guard explicitly to the same effect.
        norm_l = jnp.where(total > 0, imp_l / jnp.maximum(total, 1e-30), 0.0)
        rand = murmur3_finalizef(s)
        go_left = rand < norm_l
        stepping = running & ~is_leaf
        new_node = jnp.where(stepping, jnp.where(go_left, li, ri), node)
        new_prob = jnp.where(
            stepping, prob * jnp.where(go_left, norm_l, 1.0 - norm_l), prob
        )
        new_imp = jnp.where(stepping, jnp.where(go_left, imp_l, imp_r), imp)
        return dict(
            node=new_node,
            prob=new_prob,
            imp=new_imp,
            seed=murmur3_combine(s, jnp.uint32(0)),
            running=running & ~is_leaf,
            i=c["i"] + 1,
        )

    init = dict(
        node=jnp.zeros(n, _I32),
        prob=jnp.ones(n, _F32),
        imp=jnp.where(root_leaf, root_imp, jnp.zeros(n, _F32)),
        seed=seed,
        running=active & have_lights,
        i=jnp.int32(0),
    )
    c = jax.lax.while_loop(cond, body, init)

    final_row = packed[c["node"]]
    at_leaf = final_row[:, 0] < 0
    success = active & have_lights & at_leaf
    prim = jnp.maximum(final_row[:, 1], 0.0).astype(_I32)
    return BvhSample(
        success=success,
        prim=jnp.where(success, prim, 0),
        probability=c["prob"],
        importance=c["imp"],
    )


def reverse_walk_prob(lights: LightArrays, point, normal, leaf_node, active, max_depth: int):
    """Probability that the forward descent would have picked `leaf_node`,
    reconstructed bottom-up via parent pointers (reference nee_pdf.rs:154-228).
    Uses the NEE epsilon (nee_pdf.rs:15)."""
    point, normal = _as_v3(point), _as_v3(normal)
    n = point.x.shape[0]
    packed = _pack_nodes(lights)

    def cond(c):
        return jnp.any(c["running"]) & (c["i"] < max_depth)

    def body(c):
        node, prob, running = c["node"], c["prob"], c["running"]
        row = packed[node]
        parent_f = row[:, 2]
        at_root = parent_f < 0
        stepping = running & ~at_root
        pi = jnp.maximum(parent_f, 0.0).astype(_I32)
        prow = packed[pi]
        li = jnp.maximum(prow[:, 0], 0.0).astype(_I32)
        ri = jnp.maximum(prow[:, 1], 0.0).astype(_I32)
        lrow = packed[li]
        rrow = packed[ri]
        imp_l = _row_importance(point, normal, lrow, EPSILON_NEE)
        imp_r = _row_importance(point, normal, rrow, EPSILON_NEE)
        total = imp_l + imp_r
        was_left = node == li
        branch = jnp.where(
            total > 0,
            jnp.where(was_left, imp_l, imp_r) / jnp.maximum(total, 1e-30),
            0.0,
        )
        prob = jnp.where(stepping, prob * branch, prob)
        node = jnp.where(stepping, pi, node)
        return dict(
            node=node, prob=prob, running=stepping, i=c["i"] + 1
        )

    init = dict(
        node=jnp.where(active, leaf_node.astype(_I32), 0),
        prob=jnp.ones(n, _F32),
        running=active,
        i=jnp.int32(0),
    )
    c = jax.lax.while_loop(cond, body, init)
    return jnp.where(active, c["prob"], 0.0)


# ---------------------------------------------------------------------------
# NEE pdf sweep (reference nee_pdf.rs:281-337)
# ---------------------------------------------------------------------------


def _prim_tile_hits(lights: LightArrays, point: V3, direction: V3, active,
                    pid):
    """Crossing test of every ray against one tile of light prims.

    pid: (T,) prim indices (may run past num_prims; masked).
    Returns (hit (N,T) bool, t (N,T) ray parameter).
    """
    num = lights.num_prims.astype(_I32)
    pc = jnp.clip(pid, 0, lights.p0.shape[0] - 1)
    prim_ok = pid < num

    p0 = lights.p0[pc]            # (T,3)
    e1 = lights.e1[pc]
    e2 = lights.e2[pc]
    is_tri = lights.is_tri[pc]
    nvec = jnp.cross(e1, e2)
    d11 = jnp.sum(e1 * e1, axis=-1)
    d22 = jnp.sum(e2 * e2, axis=-1)
    d12 = jnp.sum(e1 * e2, axis=-1)
    det = d11 * d22 - d12 * d12

    # (N,T) broadcasting, all per-component (no (N,T,3) materialization)
    denom = (
        direction.x[:, None] * nvec[None, :, 0]
        + direction.y[:, None] * nvec[None, :, 1]
        + direction.z[:, None] * nvec[None, :, 2]
    )                                                            # (N,T)
    safe = jnp.abs(denom) > 1e-12
    t = (
        (p0[None, :, 0] - point.x[:, None]) * nvec[None, :, 0]
        + (p0[None, :, 1] - point.y[:, None]) * nvec[None, :, 1]
        + (p0[None, :, 2] - point.z[:, None]) * nvec[None, :, 2]
    )
    t = t / jnp.where(safe, denom, 1.0)
    hx = point.x[:, None] + direction.x[:, None] * t - p0[None, :, 0]
    hy = point.y[:, None] + direction.y[:, None] * t - p0[None, :, 1]
    hz = point.z[:, None] + direction.z[:, None] * t - p0[None, :, 2]
    r1 = hx * e1[None, :, 0] + hy * e1[None, :, 1] + hz * e1[None, :, 2]
    r2 = hx * e2[None, :, 0] + hy * e2[None, :, 1] + hz * e2[None, :, 2]
    inv_det = jnp.where(jnp.abs(det) > 1e-20, 1.0 / det, 0.0)
    u = (r1 * d22[None, :] - r2 * d12[None, :]) * inv_det[None, :]
    v = (r2 * d11[None, :] - r1 * d12[None, :]) * inv_det[None, :]
    in_quad = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
    in_tri = (u >= 0) & (v >= 0) & (u + v <= 1)
    inside = jnp.where(is_tri[None, :], in_tri, in_quad)
    hit = (
        active[:, None]
        & prim_ok[None, :]
        & safe
        & inside
        & (t >= EPSILON_NEE)
        & (t <= T_MAX)
    )                                                            # (N,T)
    return hit, t


def nee_pdf_sweep(
    lights: LightArrays,
    point,              # (N,3) shading point
    normal,             # (N,3) shading normal
    direction,          # (N,3) outgoing sample direction
    mis_weight,         # (N,)
    max_depth: int,
    max_hits: int = 8,
    prim_tile: int = 64,
    dense_probs=None,   # (N, P) prim-probability matrix from the dense path
    with_overflow: bool = False,
):
    """Sum of NEE pdfs over every light primitive crossed by the outgoing
    ray (the reference's non-opaque ray query over the light TLAS,
    nee_pdf.rs:302-334).  Here: a tiled vectorized sweep over the padded
    light prim list — `prim_tile` prims tested per loop iteration against
    all rays at once (loop iterations carry fixed dispatch cost on TPU, so
    the loop runs ceil(P/tile) times, not P times).

    Dense path (dense_probs given): the pdf contribution of EVERY crossing
    is accumulated directly in the tile loop — walk probabilities come from
    a static prim-column slice of dense_probs, so like the reference this
    path walks ALL hits, with no cap.

    Sparse path (big light sets): up to `max_hits` crossings are collected
    into slots, then ONE batched reverse BVH walk runs over all (ray, slot)
    pairs.  A ray crossing more than `max_hits` collinear light prims
    under-counts the pdf (over-weights that NEE sample); raise
    RenderSettings.max_nee_hits for pathological scenes.  with_overflow
    additionally returns the count of rays whose crossings exceeded
    max_hits (0 on the dense path, which is unbounded) — the NEE analog
    of the trace audit, surfaced in the renderer's aux and asserted 0 by
    tools/tpu_parity.py --bench (VERDICT r1 weak #5: the under-count used
    to be silent).

    pdf per hit = reverse_prob * dist^2 / (cos_theta * area)
    with cos_theta = dot(shading_normal, direction) (nee_pdf.rs:264-278).
    """
    point = _as_v3(point)
    normal = _as_v3(normal)
    direction = _as_v3(direction)
    n = point.x.shape[0]
    active = (mis_weight > 0) & vec3.any_nonzero(direction)

    # the prim bucket can be smaller than one tile (small light sets)
    prim_tile = min(prim_tile, lights.p0.shape[0])
    num = lights.num_prims.astype(_I32)
    n_tiles = (num + prim_tile - 1) // prim_tile
    cos_theta = vec3.dot(normal, direction)

    if dense_probs is not None:
        # exact unbounded accumulation (reference parity, nee_pdf.rs:302-334)
        def body(tile, pdf):
            base = tile * prim_tile
            pid = base + jnp.arange(prim_tile, dtype=_I32)          # (T,)
            pc = jnp.clip(pid, 0, lights.p0.shape[0] - 1)
            hit, t = _prim_tile_hits(lights, point, direction, active, pid)
            walk = jax.lax.dynamic_slice_in_dim(
                dense_probs, base, prim_tile, axis=1
            )                                                        # (N,T)
            area_of = lights.area[pc]                                # (T,)
            contrib = jnp.where(
                hit,
                walk * t * t / (cos_theta[:, None] * area_of[None, :]),
                0.0,
            )
            return pdf + contrib.sum(axis=1)

        pdf = jax.lax.fori_loop(0, n_tiles, body, jnp.zeros(n, _F32))
        if with_overflow:
            return pdf, jnp.int32(0)     # dense accumulation is unbounded
        return pdf

    # sparse path: slot collection + batched reverse walk
    slot_leaf = jnp.zeros((max_hits, n), _I32)
    slot_area = jnp.zeros((max_hits, n), _F32)
    slot_t = jnp.zeros((max_hits, n), _F32)
    slot_used = jnp.zeros((max_hits, n), bool)
    count = jnp.zeros(n, _I32)

    def body(tile, carry):
        slot_leaf, slot_area, slot_t, slot_used, count = carry
        base = tile * prim_tile
        pid = base + jnp.arange(prim_tile, dtype=_I32)              # (T,)
        pc = jnp.clip(pid, 0, lights.p0.shape[0] - 1)
        leaf_of = lights.leaf_node[pc].astype(_I32)   # (T,)
        area_of = lights.area[pc]                     # (T,)
        hit, t = _prim_tile_hits(lights, point, direction, active, pid)

        # slot insertion: per-ray position of each hit in this tile
        pos = count[:, None] + jnp.cumsum(hit, axis=1) - hit.astype(_I32)
        for k in range(max_hits):
            take = hit & (pos == k)                                  # (N,T)
            got = take.any(axis=1)
            lk = (take * leaf_of[None, :]).sum(axis=1)
            ak = (take * area_of[None, :]).sum(axis=1)
            tk = (take * t).sum(axis=1)
            slot_leaf = slot_leaf.at[k].set(jnp.where(got, lk, slot_leaf[k]))
            slot_area = slot_area.at[k].set(jnp.where(got, ak, slot_area[k]))
            slot_t = slot_t.at[k].set(jnp.where(got, tk, slot_t[k]))
            slot_used = slot_used.at[k].set(slot_used[k] | got)
        # count is UNCLAMPED: hits past max_hits match no slot (dropped),
        # and the final count > max_hits is the overflow signal
        count = count + hit.sum(axis=1)
        return slot_leaf, slot_area, slot_t, slot_used, count

    slot_leaf, slot_area, slot_t, slot_used, count = jax.lax.fori_loop(
        0, n_tiles, body,
        (slot_leaf, slot_area, slot_t, slot_used, count),
    )

    # batched reverse walk over all (slot, ray) pairs
    pt = V3(jnp.tile(point.x, max_hits), jnp.tile(point.y, max_hits),
            jnp.tile(point.z, max_hits))
    nm = V3(jnp.tile(normal.x, max_hits), jnp.tile(normal.y, max_hits),
            jnp.tile(normal.z, max_hits))
    walk = reverse_walk_prob(
        lights, pt, nm, slot_leaf.reshape(-1), slot_used.reshape(-1),
        max_depth,
    ).reshape(max_hits, n)

    point_pick = slot_t * slot_t / (cos_theta[None, :] * slot_area)
    pdf = jnp.where(slot_used, walk * point_pick, 0.0).sum(axis=0)
    if with_overflow:
        return pdf, jnp.sum((count > max_hits).astype(_I32))
    return pdf


# ---------------------------------------------------------------------------
# radiance accumulation (reference outgoing_radiance.rs:58-93)
# ---------------------------------------------------------------------------


def accumulate_radiance(emissivity, reflectivity, mis_weight, bsdf_pdf, nee_pdf, valid):
    """Backward recurrence L_b = E_b + R_b * L_{b+1} * (p/q) * valid_b with
    one-sample-MIS reweighting q = nee*w + (1-w)*bsdf (outgoing_radiance.rs:77-87).

    All inputs (B, N, ...); returns bounce-0 radiance (N, 3).
    """
    b_total = emissivity.shape[0]
    radiance = jnp.zeros_like(emissivity[0])
    for b in range(b_total - 1, -1, -1):
        q = nee_pdf[b] * mis_weight[b] + (1.0 - mis_weight[b]) * bsdf_pdf[b]
        # q == 0 happens for real: murmur3_finalizef rounds to exactly 1.0
        # about once per 2^25 draws, making a grazing cosine sample with
        # bsdf_pdf exactly 0 (~2 pixels per 8M-ray frame).  The reference
        # GLSL computes 0/0 there (NaN pixels, outgoing_radiance.rs:84);
        # we define the zero-probability sample to contribute nothing
        # beyond its own emission — a documented divergence, mirrored in
        # the oracle (render/oracle.py).
        w = jnp.where(q > 0.0, bsdf_pdf[b] / jnp.maximum(q, 1e-35), 0.0)
        radiance = emissivity[b] + reflectivity[b] * radiance * (
            w * valid[b].astype(_F32)
        )[:, None]
    return radiance


# ---------------------------------------------------------------------------
# postprocess (reference postprocess.rs:33-76)
# ---------------------------------------------------------------------------


def postprocess(radiance, debug, width: int, height: int, scale: int, debug_view):
    """Box-downsample the supersampled radiance (or debug) image by `scale`.

    radiance/debug: (N, 3) with N = (width*scale)*(height*scale).
    Returns (height, width, 3) float32; no tone mapping (postprocess.rs:66).
    """
    sw, sh = width * scale, height * scale
    img = jnp.where(debug_view != 0, debug, radiance).reshape(sh, sw, 3)
    if scale > 1:
        img = img.reshape(height, scale, width, scale, 3).mean(axis=(1, 3))
    return img


# ---------------------------------------------------------------------------
# sampling helpers (reference raytrace.rs:295-357)
# ---------------------------------------------------------------------------


def cosine_hemisphere(u1, u2, normal, tangent, bitangent):
    """Cosine-weighted hemisphere sample in the (tangent, normal, bitangent)
    frame (reference raytrace.rs:308-313, 354-357).  V3 in, V3 out (or
    (N,3) in, (N,3) out for array callers)."""
    packed = not isinstance(normal, V3)
    normal, tangent, bitangent = (
        _as_v3(normal), _as_v3(tangent), _as_v3(bitangent)
    )
    theta = 2.0 * _PI * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - u2))
    hx = r * jnp.cos(theta)
    hy = jnp.sqrt(u2)
    hz = r * jnp.sin(theta)
    d = V3(
        hx * tangent.x + hy * normal.x + hz * bitangent.x,
        hx * tangent.y + hy * normal.y + hz * bitangent.y,
        hx * tangent.z + hy * normal.z + hz * bitangent.z,
    )
    d = d / vec3.norm(d)
    return d.stack() if packed else d


def reflect(d, n):
    """GLSL reflect (reference raytrace.rs:594-597); V3 or (N,3)."""
    if not isinstance(d, V3):
        return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n
    k = 2.0 * vec3.dot(d, n)
    return V3(d.x - k * n.x, d.y - k * n.y, d.z - k * n.z)
