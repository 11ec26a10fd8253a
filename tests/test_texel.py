"""Pallas texel-fetch kernel vs the XLA gather it replaces.

The kernel (kernels/texel.py) must be BIT-exact: its one-hot extraction
multiplies each table value by exactly 0.0 or 1.0 and sums one nonzero
term per output, so no rounding can occur.  Reference analog: the
texture-array sample in raytrace.rs:567-580.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wavefront_tpu.kernels.texel import texel_fetch

INTERP = jax.default_backend() != "tpu"


def _gather_ref(atlas, tex, u, v):
    size = atlas.shape[1]
    ti = np.clip((u * size).astype(np.int32), 0, size - 1)
    tj = np.clip((v * size).astype(np.int32), 0, size - 1)
    texc = np.clip(tex, 0, atlas.shape[0] - 1)
    return atlas[texc, tj, ti]  # (N, nch)


def _run(n, n_tex=7, size=16, nch=12, seed=0, tile=1024):
    rng = np.random.default_rng(seed)
    atlas = rng.random((n_tex, size, size, nch), np.float32)
    tex = rng.integers(0, n_tex, n, dtype=np.int32)
    u = rng.random(n, dtype=np.float32) * 1.2 - 0.1  # includes out-of-range
    v = rng.random(n, dtype=np.float32) * 1.2 - 0.1
    got = np.asarray(
        texel_fetch(jnp.asarray(atlas), jnp.asarray(tex), jnp.asarray(u),
                    jnp.asarray(v), tile=tile, interpret=INTERP)
    )
    want = _gather_ref(atlas, tex, u, v).T  # (nch, N)
    np.testing.assert_array_equal(got, want)


def test_bit_exact_mixed_textures():
    _run(5000)


def test_single_texture_tile():
    # degenerate coherence: every lane the same texture -> 1 loop iter
    rng = np.random.default_rng(1)
    atlas = rng.random((4, 16, 16, 12), np.float32)
    n = 1500
    tex = np.full(n, 2, np.int32)
    u = rng.random(n, dtype=np.float32)
    v = rng.random(n, dtype=np.float32)
    got = np.asarray(
        texel_fetch(jnp.asarray(atlas), jnp.asarray(tex), jnp.asarray(u),
                    jnp.asarray(v), interpret=INTERP)
    )
    np.testing.assert_array_equal(got, _gather_ref(atlas, tex, u, v).T)


def test_unaligned_n_and_small_tile():
    _run(2048 + 37, tile=256, seed=3)


def test_out_of_range_tex_clamps():
    # miss lanes carry clipped/huge tex slots in the renderer; the kernel
    # clamps like the XLA gather's OOB semantics
    rng = np.random.default_rng(2)
    atlas = rng.random((3, 16, 16, 12), np.float32)
    n = 600
    tex = rng.integers(-2, 9, n, dtype=np.int32)
    u = rng.random(n, dtype=np.float32)
    v = rng.random(n, dtype=np.float32)
    got = np.asarray(
        texel_fetch(jnp.asarray(atlas), jnp.asarray(tex), jnp.asarray(u),
                    jnp.asarray(v), interpret=INTERP)
    )
    np.testing.assert_array_equal(got, _gather_ref(atlas, tex, u, v).T)


def test_channel_slice():
    # channels=(0..6,8): output row k must equal gather channel channels[k]
    rng = np.random.default_rng(4)
    atlas = rng.random((7, 16, 16, 12), np.float32)
    n = 3000
    tex = rng.integers(0, 7, n, dtype=np.int32)
    u = rng.random(n, dtype=np.float32)
    v = rng.random(n, dtype=np.float32)
    chans = (0, 1, 2, 3, 4, 5, 6, 8)
    got = np.asarray(
        texel_fetch(jnp.asarray(atlas), jnp.asarray(tex), jnp.asarray(u),
                    jnp.asarray(v), channels=chans, interpret=INTERP)
    )
    want = _gather_ref(atlas, tex, u, v)[:, list(chans)].T
    np.testing.assert_array_equal(got, want)


def test_split3_exact_reconstruction():
    """The 3-term bf16 split must reconstruct f32 EXACTLY, and must be
    built by integer bitmask truncation: the dtype-round-trip form
    (`a - a.astype(bf16).astype(f32)`) is erased by XLA-TPU's
    excess-precision simplifier inside fused programs, silently rounding
    every texel to bf16 (the round-4 config-1 hardware regression)."""
    from wavefront_tpu.kernels.texel import _split3

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.random((6, 64)).astype(np.float32),
        np.full((1, 64), 0.9490196, np.float32),   # the lamp green
        np.full((1, 64), 0.8, np.float32),         # the lamp blue
        np.zeros((1, 64), np.float32),
    ])
    a = jnp.asarray(vals)
    s = _split3(a)
    r = vals.shape[0]
    rec = (s[:r].astype(jnp.float32) + s[r:2 * r].astype(jnp.float32)
           + s[2 * r:].astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(rec), vals)
    # every term must itself be exactly bf16-representable (the matmul
    # consumes them as bf16 with no further rounding allowed)
    np.testing.assert_array_equal(
        np.asarray(s.astype(jnp.float32).astype(jnp.bfloat16)),
        np.asarray(s),
    )
