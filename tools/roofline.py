"""Roofline microbenchmarks for the column-tracer event (docs/PERF.md).

Measures, on the real TPU, the per-event cost of the load-bearing pieces
of the trace kernel so design decisions are made against hardware numbers
instead of guesses (VERDICT round 1, next #2):

  cur   — the round-1 extraction: one-hot-over-x bf16 matmul against the
          FULL (nc*gz, gx) table + per-chunk z-masked f32 reduce.  Cost
          scales with the whole scene's table size.
  win   — the windowed extraction: the world pre-tiled into 32x32-column
          windows, each stored as a (nc*8, 128) block (contraction dim =
          4 z-blocks x 32 x = 128, MXU-shaped); the kernel dynamic-slices
          its tile's current window from VMEM and the z-reduce shrinks to
          8 rows.  Cost is scene-size INDEPENDENT.
  event — the full production kernel's per-event cost (extraction + scan
          logic), via the slope of runtime vs max_events with termination
          disabled.

Timing honesty: per-iteration cost is the SLOPE between two iteration
counts (dispatch and readback overheads cancel), and completion is forced
through a dependent scalar readback (block_until_ready returns early on
this platform; docs/PERF.md).

Usage:  python tools/roofline.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32
_F32 = jnp.float32


# ---------------------------------------------------------------- timing

def _run_scalar(fn, *args):
    out = fn(*args)
    return float(jnp.sum(out))  # dependent scalar readback = completion


def time_slope(make_fn, iters_lo, iters_hi, reps=6):
    """Per-iteration seconds as the slope between two static trip counts."""
    fn_lo, fn_hi = make_fn(iters_lo), make_fn(iters_hi)
    _run_scalar(fn_lo)  # compile
    _run_scalar(fn_hi)

    def best(fn):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _run_scalar(fn)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = best(fn_hi) - best(fn_lo)
    return dt / (iters_hi - iters_lo)


# ------------------------------------------------- current (global table)

def _cur_kernel(m1_ref, cx_ref, cz_ref, out_ref, *, gx, gz, nc, iters):
    R, T = cx_ref.shape
    n_all = R * T
    m1 = m1_ref[:]
    iota_x = jax.lax.broadcasted_iota(_I32, (gx, n_all), 0)
    iota_z = jax.lax.broadcasted_iota(_I32, (gz, n_all), 0)

    def body(i, carry):
        cx, cz, acc = carry
        vxf = cx.reshape(1, n_all)
        vzf = cz.reshape(1, n_all)
        ohx = (iota_x == vxf).astype(jnp.bfloat16)
        a = jnp.dot(m1, ohx, preferred_element_type=_F32)
        ozf = (iota_z == vzf).astype(_F32)
        s = None
        for c in range(nc):
            blk = a[c * gz:(c + 1) * gz, :]
            v = jnp.sum(blk * ozf, axis=0, keepdims=True)
            v = v.reshape(R, T).astype(_I32)
            s = v if s is None else s ^ v
        # un-hoistable data dependency; in practice always cx+1
        cx = jnp.where(s == -123456, cz, (cx + 1) % gx)
        return cx, cz, acc + s

    cx, cz, acc = jax.lax.fori_loop(
        0, iters, body, (cx_ref[:], cz_ref[:], jnp.zeros((R, T), _I32))
    )
    out_ref[:] = acc


def bench_cur(gx, gz, nc, rows=8, lo=512, hi=4096):
    m1 = jnp.asarray(
        np.random.randint(0, 255, (nc * gz, gx)).astype(np.float32),
        jnp.bfloat16,
    )
    cx = jnp.asarray(np.random.randint(0, gx, (rows, 128)), _I32)
    cz = jnp.asarray(np.random.randint(0, gz, (rows, 128)), _I32)

    def make(iters):
        kern = functools.partial(_cur_kernel, gx=gx, gz=gz, nc=nc, iters=iters)
        spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            kern,
            in_specs=[spec] * 3,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), _I32),
        )
        return jax.jit(lambda: f(m1, cx, cz))

    return time_slope(make, lo, hi)


# ------------------------------------------------- windowed (32x32 blocks)

def _win_kernel(tw_ref, cx_ref, cz_ref, out_ref, *, nwx, nwz, nc, iters,
                dtype, inner=8):
    R, T = cx_ref.shape
    n_all = R * T
    iota_code = jax.lax.broadcasted_iota(_I32, (128, n_all), 0)
    iota_zl = jax.lax.broadcasted_iota(_I32, (8, n_all), 0)

    def outer_body(carry):
        i, cx, cz, acc = carry
        w = jnp.min((cx >> 5) * nwz + (cz >> 5))       # consensus window
        blk = tw_ref[w]                                # (nc*8, 128) slice
        x0 = (w // nwz) * 32
        z0 = (w % nwz) * 32

        def body(j, c2):
            cx, cz, acc = c2
            xl = cx - x0
            zrel = cz - z0
            # out-of-window lanes get code -1 -> all-zero one-hot
            inw = (xl >= 0) & (xl < 32) & (zrel >= 0) & (zrel < 32)
            code = jnp.where(
                inw, jax.lax.shift_left((zrel >> 3), 5) + xl, -1
            )
            oh = (iota_code == code.reshape(1, n_all)).astype(dtype)
            a = jnp.dot(blk.astype(dtype), oh, preferred_element_type=_F32)
            ozl = (iota_zl == (zrel & 7).reshape(1, n_all)).astype(_F32)
            s = None
            for c in range(nc):
                v = jnp.sum(a[c * 8:(c + 1) * 8] * ozl, axis=0,
                            keepdims=True)
                v = v.reshape(R, T).astype(_I32)
                s = v if s is None else s ^ v
            cx = jnp.where(s == -123456, cz, (cx + 1) % (nwx * 32))
            return cx, cz, acc + s

        cx, cz, acc = jax.lax.fori_loop(0, inner, body, (cx, cz, acc))
        return i + inner, cx, cz, acc

    def cond(c):
        return c[0] < iters

    _, cx, cz, acc = jax.lax.while_loop(
        cond, outer_body,
        (jnp.int32(0), cx_ref[:], cz_ref[:], jnp.zeros((R, T), _I32)),
    )
    out_ref[:] = acc


def bench_win(nwx, nwz, nc, rows=8, dtype=jnp.bfloat16, lo=512, hi=8192,
              spread=32):
    tw = jnp.asarray(
        np.random.randint(0, 255, (nwx * nwz, nc * 8, 128)).astype(
            np.float32),
        dtype if dtype != jnp.int8 else jnp.float32,
    ).astype(dtype)
    # lanes clustered in one window (the presorted-coherent case)
    base_x = np.random.randint(0, nwx * 32 - spread)
    base_z = np.random.randint(0, nwz * 32 - spread)
    cx = jnp.asarray(
        base_x + np.random.randint(0, spread, (rows, 128)), _I32)
    cz = jnp.asarray(
        base_z + np.random.randint(0, spread, (rows, 128)), _I32)

    def make(iters):
        kern = functools.partial(
            _win_kernel, nwx=nwx, nwz=nwz, nc=nc, iters=iters, dtype=dtype)
        spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            kern,
            in_specs=[spec] * 3,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), _I32),
        )
        return jax.jit(lambda: f(tw, cx, cz))

    return time_slope(make, lo, hi)


# ------------------------------------------------- full production event

def bench_event(rows=8, lo=512, hi=2048, gx=160, gy=32, gz=160):
    """Slope of the production window_trace vs max_events with all lanes
    forced through the full event body (direction=0 rays never terminate
    when _force_events, so every iteration runs every op)."""
    from wavefront_tpu.kernels.window_trace import (
        build_window_pack, window_trace,
    )

    rng = np.random.default_rng(0)
    grid = (rng.random((gx, gy, gz)) < 0.15).astype(np.uint8) * 4
    transparent = np.ones(256, bool)
    transparent[4] = False
    pack = build_window_pack(grid, transparent, transparent.copy())
    n = rows * 128
    origin = jnp.asarray(rng.random((n, 3)) * [gx, gy, gz], _F32)
    direction = jnp.zeros((n, 3), _F32)

    def make(iters):
        def f():
            hit = window_trace(
                pack, jnp.zeros(3, _I32), origin, direction,
                max_events=iters, tile=n, presort=False,
                _force_events=True,
            )
            return hit.t

        return jax.jit(f)

    return time_slope(make, lo, hi)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    res = {}

    res["cur_extract_160"] = bench_cur(160, 160, 6)
    res["cur_extract_416"] = (
        None if args.quick else bench_cur(416, 416, 7, lo=256, hi=1024))
    res["win_extract_bf16"] = bench_win(5, 5, 8)
    res["win_extract_bf16_nw169"] = (
        None if args.quick else bench_win(13, 13, 8))
    try:
        res["win_extract_int8"] = bench_win(5, 5, 8, dtype=jnp.int8)
    except Exception as e:  # int8 matmul may not lower
        res["win_extract_int8"] = f"unsupported: {type(e).__name__}"
    for rows in (8, 16, 32):
        res[f"win_extract_bf16_rows{rows}"] = bench_win(5, 5, 8, rows=rows)
    res["full_event_win_160"] = bench_event()
    res["full_event_win_416"] = (
        None if args.quick else bench_event(gx=416, gy=96, gz=416))

    for k, v in res.items():
        if isinstance(v, float):
            print(f"{k:32s} {v * 1e6:8.3f} us/event")
        else:
            print(f"{k:32s} {v}")
    print(json.dumps({k: (v if not isinstance(v, float) else round(v * 1e6, 4))
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
