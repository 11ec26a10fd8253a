"""Gather-free atlas texel fetch (Pallas, TPU).

The shade stage needs, per ray, the 12-channel packed texel
`atlas_packed[tex, tj, ti]` (reflectivity rgba / emissivity rgba /
metallicity+pad: renderer._shade).  As an XLA gather this is a 2M-row
random fetch and measures ~43 ms per bounce at the 1080p headline —
~38% of the WHOLE frame (tools/stage_table.py `notex` row,
docs/PERF.md) — and the cost is PER RAY, not per byte (measured:
a 2x-u32 gather times the same 42 ms as the 12x-f32 one), so shrinking
the payload can't help.  Reference analog: the texture-array sample in
raytrace.rs:567-580 (GPUs have texture units; TPUs have the MXU).

TPU-native re-expression — one MXU extraction, fixed cost, zero
divergence sensitivity:

  * ONE `(3*size*nch, K) @ (K, n)` bf16 matmul per ray tile, where
    K = n_tex*size is the combined (texture, ti) axis: each lane's
    one-hot column selects its texture AND texel column in the same
    contraction.  No per-texture loop, no scalar syncs (an earlier
    while-over-distinct-textures design measured 33 ms coherent but
    176 ms divergent; this one is ~flat).
  * EXACT in f32: the atlas value is pre-split into three bf16 terms
    (hi = bf16(v), mid = bf16(v - hi), lo = v - hi - mid; every
    subtraction exact under round-to-nearest, and (hi + mid) + lo
    reconstructs v exactly because each partial sum has < 24
    significant bits).  The three term-tables are stacked along the
    output rows of the SAME matmul, and each product is one-hot
    (0/1 x term), so the MXU's bf16 path loses nothing.
  * a log2(size)-stage binary select tree resolves the remaining `tj`
    axis (the same trick as kernels/window_trace.py's z-resolve).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_BF16 = jnp.bfloat16
_I32 = jnp.int32


def _kernel(at_ref, tex_ref, u_ref, v_ref, out_ref, *,
            n_tex, size, nch, kpad):
    # tex/u/v arrive (1, 1, n): the ray axis IS the lane axis end to end
    # (Mosaic cannot relayout (R,128)->(1,n), so the host hands the
    # kernel flat rows and every op here is 2-D with n lanes)
    n = tex_ref.shape[-1]
    u = u_ref[0]
    v = v_ref[0]
    # nearest/clamp sampling, GLSL uv origin (renderer._sample_atlas;
    # the reference uses vulkano's default sampler,
    # interactive_rendering.rs:599)
    ti = jnp.clip((u * size).astype(_I32), 0, size - 1)       # (1, n)
    tjf = jnp.clip((v * size).astype(_I32), 0, size - 1)
    tex = jnp.clip(tex_ref[0], 0, n_tex - 1)

    lin = tex * size + ti                                     # (1, n)
    iota_k = jax.lax.broadcasted_iota(_I32, (kpad, n), 0)
    # build the one-hot in f32 layout first: Mosaic cannot relayout the
    # (8,128)-tiled i1 compare mask straight into bf16's (16,128) tiling
    oh = (iota_k == lin).astype(_F32).astype(_BF16)           # (kpad, n)
    b = jnp.dot(at_ref[:], oh, preferred_element_type=_F32)   # (3*R, n)
    # exact f32 reconstruction of the 3-way bf16 split (see module doc)
    rows = size * nch
    b = (b[:rows] + b[rows:2 * rows]) + b[2 * rows:3 * rows]
    # tj row select: log2(size) binary stages, flat (j*nch+c, n) rows
    # (rows [0, h*nch) hold j<h, rows [h*nch, 2*h*nch) hold j in
    # [h, 2h) — the halving keeps the j-major packing invariant)
    h = size
    while h > 1:
        h //= 2
        bit = (tjf & h) != 0                                  # (1, n)
        b = jnp.where(bit, b[h * nch:2 * h * nch], b[:h * nch])
    out_ref[:] = b                                            # (nch, n)


def _split3(at):
    """(R, K) f32 -> (3R, K) bf16 terms whose exact f32 sum is the input.

    The split is computed by INTEGER truncation of the f32 bit pattern
    (bf16 is exactly the top 16 bits of f32), NOT by dtype round-trips:
    `at - at.astype(bf16).astype(f32)` is a correctness trap on TPU —
    XLA's excess-precision simplifier elides the f32->bf16->f32 round
    trip inside a fused program, zeroing the mid/lo terms, which rounded
    every in-frame texel to bf16 (the config-1 hardware-golden 1312-px
    divergence, docs/PERF.md round 4; the standalone kernel tests passed
    because un-fused programs keep the converts).  Each truncated term is
    exactly bf16-representable and the three-term partition of the 24-bit
    mantissa is exact by construction (a - trunc16(a) is Sterbenz-exact).
    """
    m16 = jnp.int32(-65536)                              # 0xFFFF0000
    bits = jax.lax.bitcast_convert_type(at, jnp.int32)
    hi = jax.lax.bitcast_convert_type(bits & m16, _F32)
    r1 = at - hi
    rbits = jax.lax.bitcast_convert_type(r1, jnp.int32)
    mid = jax.lax.bitcast_convert_type(rbits & m16, _F32)
    lo = r1 - mid
    return jnp.concatenate(
        [hi.astype(_BF16), mid.astype(_BF16), lo.astype(_BF16)], axis=0
    )


def texel_fetch(atlas_packed, tex, u, v, *, tile: int = 2048,
                channels=None, interpret: bool = False):
    """(N,) tex/u/v -> (nch, N) packed texels.

    channels: optional tuple of channel indices to fetch (output row k is
    channel channels[k]).  The shade stage consumes only 8 of the 12
    packed channels (reflectivity rgb+a, emissivity rgb, metallicity r) —
    slicing them here cuts the matmul's M dim by a third for free.

    atlas_packed: (S, size, size, nch) f32 — the renderer's packed atlas
    (all texture kinds' channels in one row; render/scene.py).  Output is
    channel-major SoA, matching the shade stage's per-channel reads.

    Bit-exact vs the XLA gather `atlas_packed[tex, tj, ti]`
    (tests/test_texel.py runs the comparison on hardware too).
    """
    if channels is not None:
        atlas_packed = atlas_packed[..., list(channels)]
    S, size, size2, nch = atlas_packed.shape
    assert size == size2
    # (t, j, i, c) -> (j*nch + c, t*size + i): the matmul contracts the
    # combined (t, i) axis, the select tree halves j, channels ride along
    at = atlas_packed.transpose(1, 3, 0, 2).reshape(size * nch, S * size)
    kpad = (S * size + 127) // 128 * 128
    if kpad != S * size:
        at = jnp.concatenate(
            [at, jnp.zeros((size * nch, kpad - S * size), _F32)], axis=1
        )
    at3 = _split3(at)                                # (3*size*nch, kpad)

    n = tex.shape[0]
    tile = max(tile // 128, 1) * 128
    n_pad = -n % tile
    n_tiles = (n + n_pad) // tile

    def prep(x, dt):
        x = x.astype(dt)
        if n_pad:
            x = jnp.concatenate([x, jnp.zeros((n_pad,), dt)])
        # (n_tiles, 1, tile): the unit middle dim satisfies the TPU
        # block-shape rule (last two block dims equal the array's)
        return x.reshape(n_tiles, 1, tile)

    row_spec = pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, n_tex=S, size=size, nch=nch, kpad=kpad),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((nch, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nch, n_tiles * tile), _F32),
        interpret=interpret,
    )(at3, prep(tex, _I32), prep(u, _F32), prep(v, _F32))
    return out[:, :n]
