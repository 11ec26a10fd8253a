"""Fused Pallas shade stage: texel + scatter + NEE + throughput in ONE pass.

Phase B of the measured performance plan (docs/PERF.md "path to >=300"):
after the round-3 texel kernel, the frame was NON-TRACE bound — the XLA
shade chain (attribute selects, murmur3 scatter, dense NEE sampling, the
pdf sweep, throughput update) cost ~25 ms/bounce in stitched XLA stages
plus a separate texel kernel pass and a materialized (N, P) dense-probs
matrix.  This kernel runs the ENTIRE shade for a ray tile in one Pallas
program over the same (rows, 128) tiles the tracer uses:

  * hit attributes unpack straight from the tracer's packed words (pa/pb/t)
    — no intermediate VoxelHit arrays in HBM;
  * the texel fetch is the proven one-hot MXU contraction of
    kernels/texel.py (exact 3-term bf16 split), inlined, and SKIPPED
    per tile when no lane hit anything (sorted tiles make miss/dead tiles
    contiguous);
  * dense light-BVH NEE (wavefront.dense_sample_light + the dense
    nee_pdf_sweep) runs in-kernel: node/prim constants live in SMEM
    (the same place the tracer keeps wmap/wdist), the root->leaf
    path-probability contraction is one (P, M) @ (M, n) MXU matmul from a
    VMEM scratch, and the pdf sweep walks the static prim list — the
    (N, P) probability matrix never touches HBM;
  * throughput/radiance update (the forward fold of
    outgoing_radiance.rs:77-87) happens in-register: the kernel consumes
    (o, d, hits, tp, rad, rid) and emits (o', d', tp', rad') — per-ray
    state crosses HBM exactly once per bounce, the reference's write-once
    SoA-buffer property (interactive_rendering.rs:732-892) expressed as
    ONE kernel instead of five dispatches.

Radiometric semantics are the renderer's `_shade` verbatim (reference
raytrace.rs:467-694: murmur3 draw order, 3-way scatter, MIS weight 0.3,
sky model, one-sample MIS reweighting).  Selects/murmur3/texel math are
bit-exact vs the XLA path; the NEE descent probabilities go through
log/exp and a matmul whose summation order may differ from XLA's by ULPs,
so fused-vs-XLA image parity is pinned by tolerance
(tests/test_shade_fused.py), while goldens keep pinning the XLA path
against the scalar oracle.

Activation: RenderSettings.shade_fused (auto: TPU + no dynamic entities +
dense light set within the SMEM caps).  Falls back to the XLA path
everywhere else — both paths are maintained, and the tpu_parity --bench
gate runs whichever path the headline uses on BOTH its arms.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavefront_tpu.core.config import (
    EMISSION_SCALE,
    EPSILON_BLOCK,
    EPSILON_NEE,
    MISS_DISTANCE,
    NEE_MIS_WEIGHT,
    SKY_COS_CUTOFF,
    SKY_EMISSION,
    T_MAX,
)

_F32 = jnp.float32
_I32 = jnp.int32
_U32 = jnp.uint32
_BF16 = jnp.bfloat16
_PI = math.pi

# the 8 packed-atlas channels the shade consumes (kernels/texel.py)
CHANNELS = (0, 1, 2, 3, 4, 5, 6, 8)
# SMEM table caps: the dense light path is used for small light sets
# (lights.py dense_threshold); the unrolled in-kernel loops scale with
# these, so bigger sets fall back to the XLA shade.
MAX_NODES = 64
MAX_PRIMS = 64
_NPRIM_COLS = 25


class ShadeTables(NamedTuple):
    """Device tables for the fused shade kernel (built per frame inside
    the jitted program by prep_shade_tables; all tiny except at3)."""

    at3: jax.Array      # (3*size*nch, kpad) bf16 split atlas (texel.py)
    nodes: jax.Array    # (M, 8) f32 [minx,miny,minz,maxx,maxy,maxz,power,0]
    prims: jax.Array    # (P, 25) f32, columns:
    #   0-2 p0 | 3-5 e1 | 6-8 e2 | 9 is_tri | 10 area | 11 (unused power)
    #   12-14 prim_min | 15-17 prim_max | 18-20 nvec |
    #   21 d11 | 22 d22 | 23 d12 | 24 inv_det
    anct: jax.Array     # (P, M) f32 ancestors^T (0/1 path indicator)
    size: int           # atlas texel rows (static)
    n_tex: int          # texture count (static)
    kpad: int           # padded (tex, ti) contraction dim (static)
    dense: bool         # light set rides the dense path (static)

    @property
    def m_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def p_prims(self) -> int:
        return self.prims.shape[0]


def _split3(at):
    """(R, K) f32 -> (3R, K) bf16 exact-sum terms — shared implementation
    in kernels/texel.py (bitmask split; the dtype-round-trip form was an
    XLA excess-precision trap, see that docstring)."""
    from wavefront_tpu.kernels.texel import _split3 as _s3

    return _s3(at)


def prep_shade_tables(atlas_packed, lights) -> ShadeTables:
    """Build the kernel tables from the scene arrays.  All ops are tiny
    (<= a few hundred KB) and pure functions of the scene arrays, so they
    trace into the frame program once and XLA hoists them out of the
    bounce scan."""
    ap = atlas_packed[..., list(CHANNELS)]
    S, size, _size2, nch = ap.shape
    at = ap.transpose(1, 3, 0, 2).reshape(size * nch, S * size)
    kpad = (S * size + 127) // 128 * 128
    if kpad != S * size:
        at = jnp.concatenate(
            [at, jnp.zeros((size * nch, kpad - S * size), _F32)], axis=1
        )
    at3 = _split3(at)

    dense = bool(lights.ancestors.shape[0] > 1)
    if dense:
        nodes = jnp.concatenate(
            [
                lights.node_min, lights.node_max,
                lights.node_power[:, None],
                jnp.zeros((lights.node_min.shape[0], 1), _F32),
            ],
            axis=1,
        )
        e1, e2 = lights.e1, lights.e2
        nvec = jnp.cross(e1, e2)
        d11 = jnp.sum(e1 * e1, axis=-1)
        d22 = jnp.sum(e2 * e2, axis=-1)
        d12 = jnp.sum(e1 * e2, axis=-1)
        det = d11 * d22 - d12 * d12
        inv_det = jnp.where(jnp.abs(det) > 1e-20, 1.0 / det, 0.0)
        prims = jnp.concatenate(
            [
                lights.p0, e1, e2,
                lights.is_tri.astype(_F32)[:, None],
                lights.area[:, None], lights.power[:, None],
                lights.prim_min, lights.prim_max, nvec,
                d11[:, None], d22[:, None], d12[:, None],
                inv_det[:, None],
            ],
            axis=1,
        )
        anct = lights.ancestors.T.astype(_F32)
    else:
        nodes = jnp.zeros((1, 8), _F32)
        prims = jnp.zeros((1, _NPRIM_COLS), _F32)
        anct = jnp.zeros((1, 1), _F32)
    return ShadeTables(
        at3=at3, nodes=nodes, prims=prims, anct=anct,
        size=size, n_tex=S, kpad=kpad, dense=dense,
    )


def pack_hits(vox):
    """Pack a VoxelHit into the tracer's (pa, pb, t) words (window_trace
    _unpack_hits layout) so the fused shade composes with the XLA DDA
    intersector too (the tpu_parity --bench reference arm)."""
    pa = (
        vox.hit.astype(_I32)
        | jax.lax.shift_left(vox.entered.astype(_I32), 1)
        | jax.lax.shift_left(vox.face.astype(_I32), 2)
        | jax.lax.shift_left(jnp.clip(vox.vy + 2, 0, 511), 5)
        | jax.lax.shift_left(vox.owner.astype(_I32) & 255, 14)
    )
    pb = jnp.clip(vox.vx + 2, 0, 1023) | jax.lax.shift_left(
        jnp.clip(vox.vz + 2, 0, jnp.int32(2 ** 20 - 1)), 10
    )
    return pa, pb, vox.t


# ---------------------------------------------------------------------------
# in-kernel murmur3 (core/rng.py semantics, reference raytrace.rs:117-161)
# ---------------------------------------------------------------------------


def _m3_combine(h, k):
    h = h ^ (k * _U32(0x1B873593))
    h = (h << 13) | (h >> 19)
    return h * _U32(5) + _U32(0xE6546B64)


def _m3_finalizef(h):
    h = h ^ (h >> 16)
    h = h * _U32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _U32(0xC2B2AE35)
    h = h ^ (h >> 16)
    m = (h & _U32(0x007FFFFF)) | _U32(0x3F800000)
    return pltpu.bitcast(m, _F32) - _F32(1.0)


def _node_importance(nd, j, x, y, z, nx, ny, nz):
    """Importance of node j at every lane (dense_node_importance for ONE
    node, scalar bounds from SMEM; reference raytrace.rs:193-220)."""
    mnx, mny, mnz = nd[j, 0], nd[j, 1], nd[j, 2]
    mxx, mxy, mxz = nd[j, 3], nd[j, 4], nd[j, 5]
    power = nd[j, 6]
    d0x = (mnx - x) * nx
    d1x = (mxx - x) * nx
    d0y = (mny - y) * ny
    d1y = (mxy - y) * ny
    d0z = (mnz - z) * nz
    d1z = (mxz - z) * nz
    eps = _F32(EPSILON_BLOCK)
    visible = None
    for dx_ in (d0x, d1x):
        for dy_ in (d0y, d1y):
            for dz_ in (d0z, d1z):
                v = (dx_ + dy_ + dz_ >= eps).astype(_F32)
                visible = v if visible is None else visible + v
    diag_sq = (mxx - mnx) ** 2 + (mxy - mny) ** 2 + (mxz - mnz) ** 2
    cx = 0.5 * (mnx + mxx) - x
    cy = 0.5 * (mny + mxy) - y
    cz = 0.5 * (mnz + mxz) - z
    dist_sq = jnp.maximum(diag_sq, cx * cx + cy * cy + cz * cz)
    return power / dist_sq * (visible * _F32(0.125))


def _prim_importance(pr, p, x, y, z, nx, ny, nz):
    """Leaf importance of prim p (dense_prim_importance for one prim)."""
    mnx, mny, mnz = pr[p, 12], pr[p, 13], pr[p, 14]
    mxx, mxy, mxz = pr[p, 15], pr[p, 16], pr[p, 17]
    power = pr[p, 11]
    d0x = (mnx - x) * nx
    d1x = (mxx - x) * nx
    d0y = (mny - y) * ny
    d1y = (mxy - y) * ny
    d0z = (mnz - z) * nz
    d1z = (mxz - z) * nz
    eps = _F32(EPSILON_BLOCK)
    visible = None
    for dx_ in (d0x, d1x):
        for dy_ in (d0y, d1y):
            for dz_ in (d0z, d1z):
                v = (dx_ + dy_ + dz_ >= eps).astype(_F32)
                visible = v if visible is None else visible + v
    diag_sq = (mxx - mnx) ** 2 + (mxy - mny) ** 2 + (mxz - mnz) ** 2
    cx = 0.5 * (mnx + mxx) - x
    cy = 0.5 * (mny + mxy) - y
    cz = 0.5 * (mnz + mxz) - z
    dist_sq = jnp.maximum(diag_sq, cx * cx + cy * cy + cz * cz)
    return power / jnp.maximum(dist_sq, _F32(1e-30)) * (visible * _F32(0.125))


def _kernel(
    go_ref, si_ref, su_ref, nodes_ref, prims_ref,
    anct_ref, at3_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    pa_ref, pb_ref, t_ref,
    tpx_ref, tpy_ref, tpz_ref, rax_ref, ray_ref, raz_ref, rid_ref,
    nox_ref, noy_ref, noz_ref, ndx_ref, ndy_ref, ndz_ref,
    ntx_ref, nty_ref, ntz_ref, nrx_ref, nry_ref, nrz_ref,
    logn_scr,
    *, nee_type: int, size: int, n_tex: int, kpad: int, nch: int,
    m_nodes: int, p_prims: int, dense: bool,
):
    R, T = ox_ref.shape
    n_all = R * T
    f0 = jnp.zeros((R, T), _F32)
    f1 = jnp.ones((R, T), _F32)

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tpx, tpy, tpz = tpx_ref[:], tpy_ref[:], tpz_ref[:]
    rax, ray_, raz = rax_ref[:], ray_ref[:], raz_ref[:]

    alive = (dx != 0.0) | (dy != 0.0) | (dz != 0.0)
    any_alive = jnp.any(alive)

    def passthrough():
        # dead tile: one cheap check instead of the whole shade (sorted
        # tiles make the dead tail contiguous).  Dead-lane semantics of
        # the XLA path: origin/throughput/radiance pass through, the
        # direction stays zero, emission contributes nothing.
        return (ox, oy, oz, f0, f0, f0, tpx, tpy, tpz, rax, ray_, raz)

    def shade():
        pa, pb, t_hit = pa_ref[:], pb_ref[:], t_ref[:]
        hit = ((pa & 1) != 0) & alive
        face = jax.lax.shift_right_logical(pa, 2) & 7
        owner = jax.lax.shift_right_logical(pa, 14) & 255
        vx = (pb & 1023) - 2
        vy = (jax.lax.shift_right_logical(pa, 5) & 511) - 2
        vz = jax.lax.shift_right_logical(pb, 10) - 2

        hpx = ox + dx * t_hit
        hpy = oy + dy * t_hit
        hpz = oz + dz * t_hit

        # ---- voxel face attributes (renderer._shade, branchless) ----
        axis = face >> 1
        signf = ((face & 1) * 2 - 1).astype(_F32)
        ax0 = axis == 0
        ax1 = axis == 1
        ax2 = axis == 2
        n_x = jnp.where(ax0, signf, 0.0)
        n_y = jnp.where(ax1, signf, 0.0)
        n_z = jnp.where(ax2, signf, 0.0)
        tg_x = jnp.where(ax2, f1, f0)
        tg_y = jnp.where(ax0, f1, f0)
        tg_z = jnp.where(ax1, f1, f0)
        bt_x = n_y * tg_z - n_z * tg_y
        bt_y = n_z * tg_x - n_x * tg_z
        bt_z = n_x * tg_y - n_y * tg_x

        g0, g1, g2 = go_ref[0], go_ref[1], go_ref[2]
        lx = hpx - (vx.astype(_F32) + g0)
        ly = hpy - (vy.astype(_F32) + g1)
        lz = hpz - (vz.astype(_F32) + g2)
        f = face
        u = jnp.where(
            f == 0, 1.0 - lz,
            jnp.where(f == 1, lz,
                      jnp.where(f == 2, lx,
                                jnp.where(f == 3, 1.0 - lx,
                                          jnp.where(f == 4, lx, 1.0 - lx)))))
        v = jnp.where((f == 2) | (f == 3), lz, 1.0 - ly)
        tex = jnp.clip(owner * 6 + face, 0, n_tex - 1)

        # ---- texel fetch: one-hot MXU contraction (kernels/texel.py),
        # skipped wholesale when no lane in the tile hit anything ----
        def texels():
            ti = jnp.clip((u * size).astype(_I32), 0, size - 1)
            tjf = jnp.clip((v * size).astype(_I32), 0, size - 1)
            lin = (tex * size + ti).reshape(1, n_all)
            iota_k = jax.lax.broadcasted_iota(_I32, (kpad, n_all), 0)
            oh = (iota_k == lin).astype(_F32).astype(_BF16)
            b = jnp.dot(at3_ref[:], oh, preferred_element_type=_F32)
            rows = size * nch
            b = (b[:rows] + b[rows:2 * rows]) + b[2 * rows:3 * rows]
            h = size
            tj2 = tjf.reshape(1, n_all)
            while h > 1:
                h //= 2
                bit = (tj2 & h) != 0
                b = jnp.where(bit, b[h * nch:2 * h * nch], b[:h * nch])
            return tuple(b[c].reshape(R, T) for c in range(nch))

        ch = jax.lax.cond(
            jnp.any(hit), texels,
            lambda: tuple(f0 for _ in range(nch)),
        )
        # CHANNELS order: refl rgb(0,1,2) alpha(3) emis rgb(4,5,6) metal(7)
        rfx, rfy, rfz = ch[0], ch[1], ch[2]
        alpha = ch[3]
        cos_in = -(dx * n_x + dy * n_y + dz * n_z)
        scale = _F32(EMISSION_SCALE)
        emx = scale * ch[4] * cos_in
        emy = scale * ch[5] * cos_in
        emz = scale * ch[6] * cos_in
        metal = ch[7]

        # ---- scatter decision (raytrace.rs:588-603) ----
        rid = rid_ref[:]
        seed = _m3_combine(su_ref[0], rid)
        scatter_rand = _m3_finalizef(_m3_combine(seed, _U32(0)))
        is_mirror = scatter_rand < metal
        is_trans = (~is_mirror) & (scatter_rand < metal + (1.0 - alpha))
        is_lamb = hit & ~is_mirror & ~is_trans

        eps15 = _F32(EPSILON_BLOCK * 1.5)
        lox = hpx + eps15 * n_x
        loy = hpy + eps15 * n_y
        loz = hpz + eps15 * n_z

        if nee_type == 1:
            do_nee = is_lamb
        elif nee_type == 2:
            do_nee = is_lamb & (si_ref[0] == 0)
        else:
            do_nee = jnp.zeros((R, T), bool)

        # ---- dense light sampling (wavefront.dense_sample_light) ----
        if nee_type != 0 and dense:
            num = si_ref[1]
            nd = nodes_ref
            imps = [
                _node_importance(nd, j, lox, loy, loz, n_x, n_y, n_z)
                for j in range(m_nodes)
            ]
            # sibling pairs are (1,2),(3,4),... by builder construction
            m2 = ((m_nodes - 1) // 2) * 2
            nimps = [None] * m_nodes
            nimps[0] = f1                      # root has no sibling
            for j in range(1, 1 + m2, 2):
                a, b = imps[j], imps[j + 1]
                tot = a + b
                safe = jnp.maximum(tot, _F32(1e-30))
                pos = tot > 0
                nimps[j] = jnp.where(pos, a / safe, 0.0)
                nimps[j + 1] = jnp.where(pos, b / safe, 0.0)
            for j in range(1 + m2, m_nodes):
                nimps[j] = f0                  # unpaired padded tail
            # log of branch probs -> VMEM scratch -> one (P,M)@(M,n) matmul
            for j in range(m_nodes):
                logn_scr[j, :] = jnp.log(
                    jnp.maximum(nimps[j], _F32(1e-35))
                ).reshape(n_all)
            # precision=HIGHEST, same reason as the XLA twin
            # (wavefront.py dense_prim_probs): DEFAULT f32 dots on TPU
            # round toward bf16 passes, and the log floor (-80) rounds by
            # +-0.25 -> up to ~28% pdf error after exp — the measured
            # config-1 golden divergence (docs/PERF.md round 4)
            logp = jnp.dot(
                anct_ref[:], logn_scr[:], preferred_element_type=_F32,
                precision=jax.lax.Precision.HIGHEST,
            )                                   # (P, n_all)

            pr = prims_ref
            probs = []
            for p in range(p_prims):
                pp = jnp.exp(logp[p]).reshape(R, T)
                probs.append(jnp.where(jnp.int32(p) < num, pp, 0.0))
            total = f0
            for p in range(p_prims):
                total = total + probs[p]

            uu = _m3_finalizef(_m3_combine(seed, _U32(2))) * total
            # first prim whose cumulative reaches u (CDF inversion)
            cum = f0
            taken = jnp.zeros((R, T), bool)
            prob = f0
            imp = f0
            pick_any = jnp.zeros((R, T), bool)
            sp0x = f0; sp0y = f0; sp0z = f0
            se1x = f0; se1y = f0; se1z = f0
            se2x = f0; se2y = f0; se2z = f0
            s_tri = jnp.zeros((R, T), bool)
            for p in range(p_prims):
                cum = cum + probs[p]
                pick = (cum >= uu) & ~taken & (probs[p] > 0)
                taken = taken | pick
                pick_any = pick_any | pick
                prob = jnp.where(pick, probs[p], prob)
                imp = jnp.where(
                    pick,
                    _prim_importance(pr, p, lox, loy, loz, n_x, n_y, n_z),
                    imp,
                )
                sp0x = jnp.where(pick, pr[p, 0], sp0x)
                sp0y = jnp.where(pick, pr[p, 1], sp0y)
                sp0z = jnp.where(pick, pr[p, 2], sp0z)
                se1x = jnp.where(pick, pr[p, 3], se1x)
                se1y = jnp.where(pick, pr[p, 4], se1y)
                se1z = jnp.where(pick, pr[p, 5], se1z)
                se2x = jnp.where(pick, pr[p, 6], se2x)
                se2y = jnp.where(pick, pr[p, 7], se2y)
                se2z = jnp.where(pick, pr[p, 8], se2z)
                s_tri = s_tri | (pick & (pr[p, 9] > 0.5))
            ok = do_nee & (total > 0) & pick_any
        else:
            probs = None
            ok = jnp.zeros((R, T), bool)
            imp = f0
            sp0x = f0; sp0y = f0; sp0z = f0
            se1x = f0; se1y = f0; se1z = f0
            se2x = f0; se2y = f0; se2z = f0
            s_tri = jnp.zeros((R, T), bool)

        mis = jnp.where(ok & (imp > 0.0), _F32(NEE_MIS_WEIGHT), _F32(0.0))
        mis_rand = _m3_finalizef(_m3_combine(seed, _U32(3)))
        pick_light = mis_rand < mis

        u4 = _m3_finalizef(_m3_combine(seed, _U32(4)))
        u5 = _m3_finalizef(_m3_combine(seed, _U32(5)))

        # light point with the triangle fold (raytrace.rs:317-323)
        fold = s_tri & (u4 + u5 > 1.0)
        lu = jnp.where(fold, 1.0 - u4, u4)
        lv = jnp.where(fold, 1.0 - u5, u5)
        tlx = sp0x + lu * se1x + lv * se2x - lox
        tly = sp0y + lu * se1y + lv * se2y - loy
        tlz = sp0z + lu * se1z + lv * se2z - loz
        tl_n = jnp.maximum(
            jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz), _F32(1e-20)
        )
        ldx, ldy, ldz = tlx / tl_n, tly / tl_n, tlz / tl_n

        # cosine hemisphere sample (raytrace.rs:308-313,354-357)
        theta = _F32(2.0 * _PI) * u4
        r_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - u5))
        hx = r_ * jnp.cos(theta)
        hy = jnp.sqrt(u5)
        hz = r_ * jnp.sin(theta)
        hdx = hx * tg_x + hy * n_x + hz * bt_x
        hdy = hx * tg_y + hy * n_y + hz * bt_y
        hdz = hx * tg_z + hy * n_z + hz * bt_z
        hn = jnp.sqrt(hdx * hdx + hdy * hdy + hdz * hdz)
        hdx, hdy, hdz = hdx / hn, hdy / hn, hdz / hn

        lamdx = jnp.where(pick_light, ldx, hdx)
        lamdy = jnp.where(pick_light, ldy, hdy)
        lamdz = jnp.where(pick_light, ldz, hdz)
        lam_cos = lamdx * n_x + lamdy * n_y + lamdz * n_z
        lam_bsdf = lam_cos * _F32(1.0 / _PI)

        # ---- merge branches ----
        nx_o = jnp.where(is_lamb, lox, hpx)
        ny_o = jnp.where(is_lamb, loy, hpy)
        nz_o = jnp.where(is_lamb, loz, hpz)
        k2 = 2.0 * (dx * n_x + dy * n_y + dz * n_z)
        mrx, mry, mrz = dx - k2 * n_x, dy - k2 * n_y, dz - k2 * n_z
        ndx = jnp.where(is_mirror, mrx, jnp.where(is_trans, dx, lamdx))
        ndy = jnp.where(is_mirror, mry, jnp.where(is_trans, dy, lamdy))
        ndz = jnp.where(is_mirror, mrz, jnp.where(is_trans, dz, lamdz))
        inv_pi = _F32(1.0 / _PI)
        orx = jnp.where(is_mirror, rfx, jnp.where(is_trans, f1, rfx * inv_pi))
        ory = jnp.where(is_mirror, rfy, jnp.where(is_trans, f1, rfy * inv_pi))
        orz = jnp.where(is_mirror, rfz, jnp.where(is_trans, f1, rfz * inv_pi))
        bsdf = jnp.where(is_lamb, lam_bsdf, f1)
        mis_o = jnp.where(is_lamb, mis, f0)

        # ---- miss: directional sky (raytrace.rs:528-538) ----
        miss = alive & ~hit
        sky = jnp.where(dy > _F32(SKY_COS_CUTOFF), _F32(SKY_EMISSION), 0.0)
        md = _F32(MISS_DISTANCE)
        nx_o = jnp.where(miss, ox + dx * md, nx_o)
        ny_o = jnp.where(miss, oy + dy * md, ny_o)
        nz_o = jnp.where(miss, oz + dz * md, nz_o)
        ndx = jnp.where(miss, f0, ndx)
        ndy = jnp.where(miss, f0, ndy)
        ndz = jnp.where(miss, f0, ndz)
        n_xm = jnp.where(miss, f0, n_x)
        n_ym = jnp.where(miss, f0, n_y)
        n_zm = jnp.where(miss, f0, n_z)
        emx_ = jnp.where(miss, sky, emx)
        emy_ = jnp.where(miss, sky, emy)
        emz_ = jnp.where(miss, sky, emz)
        orx = jnp.where(miss, f0, orx)
        ory = jnp.where(miss, f0, ory)
        orz = jnp.where(miss, f0, orz)
        mis_o = jnp.where(miss, f0, mis_o)
        bsdf = jnp.where(miss, f1, bsdf)

        # ---- terminal passthrough (raytrace.rs:484-494) ----
        dead = ~alive
        nx_o = jnp.where(dead, ox, nx_o)
        ny_o = jnp.where(dead, oy, ny_o)
        nz_o = jnp.where(dead, oz, nz_o)
        ndx = jnp.where(dead, f0, ndx)
        ndy = jnp.where(dead, f0, ndy)
        ndz = jnp.where(dead, f0, ndz)
        emx_ = jnp.where(dead, f0, emx_)
        emy_ = jnp.where(dead, f0, emy_)
        emz_ = jnp.where(dead, f0, emz_)
        orx = jnp.where(dead, f0, orx)
        ory = jnp.where(dead, f0, ory)
        orz = jnp.where(dead, f0, orz)
        mis_o = jnp.where(dead, f0, mis_o)
        bsdf = jnp.where(dead, f1, bsdf)

        # ---- dense NEE pdf sweep (wavefront.nee_pdf_sweep dense path):
        # EVERY light-prim crossing of the outgoing ray accumulates
        # walk_prob * t^2 / (cos_theta * area) — reference nee_pdf.rs:302-334
        if nee_type != 0 and dense:
            act = (mis_o > 0) & ((ndx != 0.0) | (ndy != 0.0) | (ndz != 0.0))
            cos_t = n_xm * ndx + n_ym * ndy + n_zm * ndz
            pr = prims_ref
            pdf = f0
            for p in range(p_prims):
                nvx, nvy, nvz = pr[p, 18], pr[p, 19], pr[p, 20]
                denom = ndx * nvx + ndy * nvy + ndz * nvz
                safe = jnp.abs(denom) > _F32(1e-12)
                tt = (
                    (pr[p, 0] - nx_o) * nvx
                    + (pr[p, 1] - ny_o) * nvy
                    + (pr[p, 2] - nz_o) * nvz
                ) / jnp.where(safe, denom, 1.0)
                hx_ = nx_o + ndx * tt - pr[p, 0]
                hy_ = ny_o + ndy * tt - pr[p, 1]
                hz_ = nz_o + ndz * tt - pr[p, 2]
                r1 = hx_ * pr[p, 3] + hy_ * pr[p, 4] + hz_ * pr[p, 5]
                r2 = hx_ * pr[p, 6] + hy_ * pr[p, 7] + hz_ * pr[p, 8]
                uq = (r1 * pr[p, 22] - r2 * pr[p, 23]) * pr[p, 24]
                vq = (r2 * pr[p, 21] - r1 * pr[p, 23]) * pr[p, 24]
                in_quad = (uq >= 0) & (uq <= 1) & (vq >= 0) & (vq <= 1)
                in_tri = (uq >= 0) & (vq >= 0) & (uq + vq <= 1)
                # boolean algebra, not jnp.where: Mosaic can't legalize
                # arith.select on i1 vectors (vector<8x128xi1>)
                p_tri = pr[p, 9] > 0.5
                inside = (in_tri & p_tri) | (in_quad & ~p_tri)
                hitp = (
                    act & (jnp.int32(p) < si_ref[1]) & safe & inside
                    & (tt >= _F32(EPSILON_NEE)) & (tt <= _F32(T_MAX))
                )
                contrib = probs[p] * tt * tt / (cos_t * pr[p, 10])
                pdf = pdf + jnp.where(hitp, contrib, 0.0)
        else:
            pdf = f0

        # ---- forward-folded throughput update (outgoing_radiance.rs:77-87)
        valid = ((ndx != 0.0) | (ndy != 0.0) | (ndz != 0.0)).astype(_F32)
        q = pdf * mis_o + (1.0 - mis_o) * bsdf
        w = jnp.where(q > 0.0, bsdf / jnp.maximum(q, _F32(1e-35)), 0.0)
        wv = w * valid
        nrx = rax + tpx * emx_
        nry = ray_ + tpy * emy_
        nrz = raz + tpz * emz_
        ntx = tpx * (orx * wv)
        nty = tpy * (ory * wv)
        ntz = tpz * (orz * wv)
        return (nx_o, ny_o, nz_o, ndx, ndy, ndz,
                ntx, nty, ntz, nrx, nry, nrz)

    outs = jax.lax.cond(any_alive, shade, passthrough)
    out_refs = (nox_ref, noy_ref, noz_ref, ndx_ref, ndy_ref, ndz_ref,
                ntx_ref, nty_ref, ntz_ref, nrx_ref, nry_ref, nrz_ref)
    for ref, val in zip(out_refs, outs):
        ref[:] = val


def shade_pass(
    tables: ShadeTables,
    grid_origin,
    origin, direction,           # V3 components
    pa, pb, t,                   # packed hits (tracer layout / pack_hits)
    tp, rad,                     # V3 throughput / accumulated radiance
    rid,                         # (N,) u32 pixel ids (seed input)
    inv_seed,                    # u32 scalar (frame*bounces + bounce)
    bounce,                      # i32 scalar (nee_type==2 gating)
    num_prims,                   # i32 scalar (padded-prim mask)
    *,
    nee_type: int,
    tile: int = 2048,
    interpret: bool = False,
):
    """One fused shade step over (rows, 128) ray tiles.

    Returns (new_origin V3, new_direction V3, new_tp V3, new_rad V3).
    Consumes the tracer's packed hit words directly; callers on the DDA
    path pack them with pack_hits."""
    from wavefront_tpu.core.vec3 import V3

    assert nee_type == 0 or tables.dense, (
        "fused shade requires the dense light path for NEE modes"
    )
    n = origin.x.shape[0]
    rows = max(tile // 128, 8)
    tile = rows * 128
    n_pad = -n % tile
    n_tiles = (n + n_pad) // tile

    def prep(x, dt):
        x = x.astype(dt)
        if n_pad:
            x = jnp.concatenate([x, jnp.zeros((n_pad,), dt)])
        return x.reshape(n_tiles * rows, 128)

    row = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    out_f = jax.ShapeDtypeStruct((n_tiles * rows, 128), _F32)

    nch = len(CHANNELS)
    kernel = functools.partial(
        _kernel,
        nee_type=nee_type, size=tables.size, n_tex=tables.n_tex,
        kpad=tables.kpad, nch=nch,
        m_nodes=tables.m_nodes, p_prims=tables.p_prims,
        dense=tables.dense and nee_type != 0,
    )
    go = jnp.asarray(grid_origin, _F32).reshape(3)
    si = jnp.stack(
        [jnp.asarray(bounce, _I32), jnp.asarray(num_prims, _I32)]
    )
    su = jnp.asarray(inv_seed, _U32).reshape(1)

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            smem(), smem(), smem(), smem(), smem(),
            vmem(), vmem(),
        ] + [row] * 16,
        out_specs=[row] * 12,
        out_shape=[out_f] * 12,
        scratch_shapes=[
            pltpu.VMEM((tables.m_nodes, tile), _F32),
        ],
        interpret=interpret,
    )(
        go, si, su, tables.nodes, tables.prims,
        tables.anct, tables.at3,
        prep(origin.x, _F32), prep(origin.y, _F32), prep(origin.z, _F32),
        prep(direction.x, _F32), prep(direction.y, _F32),
        prep(direction.z, _F32),
        prep(pa, _I32), prep(pb, _I32), prep(t, _F32),
        prep(tp.x, _F32), prep(tp.y, _F32), prep(tp.z, _F32),
        prep(rad.x, _F32), prep(rad.y, _F32), prep(rad.z, _F32),
        prep(rid, _U32),
    )

    def unprep(x):
        return x.reshape(-1)[:n]

    o = V3(unprep(outs[0]), unprep(outs[1]), unprep(outs[2]))
    d = V3(unprep(outs[3]), unprep(outs[4]), unprep(outs[5]))
    tp2 = V3(unprep(outs[6]), unprep(outs[7]), unprep(outs[8]))
    rad2 = V3(unprep(outs[9]), unprep(outs[10]), unprep(outs[11]))
    return o, d, tp2, rad2
