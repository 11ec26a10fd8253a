"""Event-body laboratory: isolates the windowed tracer's per-event cost
components and times candidate replacements on the real TPU.

Round-3 mandate (VERDICT #1): cut the event from ~2.4 us toward the
0.23 us extraction bound.  The event is ~700 single-vreg VPU ops issuing
~3x below peak (docs/PERF.md roofline); this tool answers, with hardware
numbers, WHICH of those ops cost what and which replacements lower:

  support    — does Mosaic lower i16/i8 vector compares, bf16 muls,
               sublane dynamic gathers?  (bf16 cmpf is known-rejected.)
  onehot     — one-hot build variants: i32 compare (current), i16
               compare, bf16 outer product (16-cmp x 8-cmp + mul)
  issue      — raw VPU issue rate: chained i32 adds at (8..32, 128)
               to calibrate "peak" for the op-count model
  zsel       — z-row select variants: 3-stage binary tree (current)
               vs weighted-mask mul+sum vs f32->bf16 tree
  event      — the production kernel's per-event slope (the headline
               number the variants must move)

Usage: python tools/event_lab.py [--only support,onehot,...]
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
_BF16 = jnp.bfloat16


def _run_scalar(fn):
    return float(jnp.sum(fn()))


def time_slope(make_fn, lo, hi, reps=6):
    fn_lo, fn_hi = make_fn(lo), make_fn(hi)
    _run_scalar(fn_lo)
    _run_scalar(fn_hi)

    def best(fn):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _run_scalar(fn)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fn_hi) - best(fn_lo)) / (hi - lo)


def _loop_kernel(body, n_state, rows=16, extra=()):
    """pallas_call wrapper: fori_loop(iters) over `body` on (rows,128) i32
    states; body(extra_vals..., i, tuple(states)) -> tuple(states) when
    extra arrays are given, else body(i, states)."""
    def make(iters):
        def kern(*refs):
            ex_refs = refs[:len(extra)]
            in_refs, out_ref = refs[len(extra):-1], refs[-1]
            st = tuple(r[:] for r in in_refs)
            ex = tuple(r[:] for r in ex_refs)
            fn = (functools.partial(body, *ex)) if extra else body
            st = jax.lax.fori_loop(0, iters, fn, st)
            out_ref[:] = st[0]

        spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            kern,
            in_specs=[spec] * (n_state + len(extra)),
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), _I32),
        )
        args = list(extra) + [
            jnp.asarray(
                np.random.randint(0, 100, (rows, 128)), _I32)
            for _ in range(n_state)
        ]
        return jax.jit(lambda: f(*args))

    return make


# ------------------------------------------------------------- support

def probe_support():
    """Compile-probe small kernels for primitive support."""
    res = {}

    def try_compile(name, kern, in_shapes, out_shape):
        try:
            spec = pl.BlockSpec(memory_space=pltpu.VMEM)
            f = pl.pallas_call(
                kern,
                in_specs=[spec] * len(in_shapes),
                out_specs=spec,
                out_shape=out_shape,
            )
            args = [jnp.zeros(s, d) for s, d in in_shapes]
            jax.jit(lambda: f(*args))().block_until_ready()
            res[name] = "ok"
        except Exception as e:
            msg = str(e)
            key = "unsupported"
            for pat in ("does not support", "Not implemented",
                        "NotImplemented", "failed to compile",
                        "Unsupported"):
                if pat in msg:
                    key = f"unsupported ({pat})"
                    break
            res[name] = key

    def k_i16cmp(a_ref, o_ref):
        a = a_ref[:].astype(jnp.int16)
        i = jax.lax.broadcasted_iota(jnp.int16, a.shape, 0)
        o_ref[:] = (i == a).astype(_I32)

    try_compile("i16_cmp", k_i16cmp, [((128, 128), _I32)],
                jax.ShapeDtypeStruct((128, 128), _I32))

    def k_i8cmp(a_ref, o_ref):
        a = a_ref[:].astype(jnp.int8)
        i = jax.lax.broadcasted_iota(jnp.int8, a.shape, 0)
        o_ref[:] = (i == a).astype(_I32)

    try_compile("i8_cmp", k_i8cmp, [((128, 128), _I32)],
                jax.ShapeDtypeStruct((128, 128), _I32))

    def k_bf16mul(a_ref, o_ref):
        a = a_ref[:].astype(_BF16)
        o_ref[:] = (a * a).astype(_I32)

    try_compile("bf16_mul", k_bf16mul, [((128, 128), _I32)],
                jax.ShapeDtypeStruct((128, 128), _I32))

    def k_sublane_gather(a_ref, idx_ref, o_ref):
        # per-lane sublane pick: out[0, j] = a[idx[0, j], j]
        a = a_ref[:]                       # (8, 128) f32
        idx = idx_ref[:]                   # (8, 128) i32 (row 0 used)
        g = jnp.take_along_axis(a, idx % 8, axis=0)
        o_ref[:] = g.astype(_I32)

    try_compile(
        "sublane_take_along_axis",
        k_sublane_gather,
        [((8, 128), _F32), ((8, 128), _I32)],
        jax.ShapeDtypeStruct((8, 128), _I32),
    )

    def k_lane_roll(a_ref, o_ref):
        o_ref[:] = pltpu.roll(a_ref[:], shift=1, axis=1).astype(_I32)

    try_compile("lane_roll", k_lane_roll, [((8, 128), _F32)],
                jax.ShapeDtypeStruct((8, 128), _I32))
    return res


# ------------------------------------------------------------- issue rate

def bench_issue(rows=16, ops_per_iter=64):
    """Chained i32 adds: cycles/vreg-op calibration."""
    def body(i, st):
        (a,) = st
        for _ in range(ops_per_iter):
            a = a + 1
        return (a,)

    make = _loop_kernel(body, 1, rows=rows)
    s = time_slope(make, 512, 4096)
    return s / ops_per_iter  # seconds per (rows,128) op


# ------------------------------------------------------------- one-hot

def bench_onehot(variant, rows=16, n_all=None):
    n_all = n_all or rows * 128

    blk = jnp.asarray(
        np.random.randint(0, 255, (64, 128)).astype(np.float32), _BF16)

    def body_i32(blk, i, st):
        code, acc = st
        c = code.reshape(1, n_all)
        iota = jax.lax.broadcasted_iota(_I32, (128, n_all), 0)
        oh = (iota == c).astype(_BF16)
        a = jnp.dot(blk, oh, preferred_element_type=_F32)
        s = jnp.sum(
            a.reshape(8, 8, -1).sum(1)[:8], axis=0
        ).reshape(rows, 128).astype(_I32)
        code = (code + s % 2 + 1) % 128
        return code, acc + s

    def body_i16(blk, i, st):
        code, acc = st
        c = code.astype(jnp.int16).reshape(1, n_all)
        iota = jax.lax.broadcasted_iota(jnp.int16, (128, n_all), 0)
        oh = (iota == c).astype(_BF16)
        a = jnp.dot(blk, oh, preferred_element_type=_F32)
        s = jnp.sum(a[:8], axis=0).reshape(rows, 128).astype(_I32)
        code = (code + s % 2 + 1) % 128
        return code, acc + s

    def body_outer(blk, i, st):
        code, acc = st
        hi = (code >> 3).reshape(1, n_all)
        lo = (code & 7).reshape(1, n_all)
        ih = jax.lax.broadcasted_iota(_I32, (16, n_all), 0)
        il = jax.lax.broadcasted_iota(_I32, (8, n_all), 0)
        ohh = (ih == hi).astype(_BF16)                    # (16, n)
        ohl = (il == lo).astype(_BF16)                    # (8, n)
        # expand: oh[r] = ohh[r>>3] * ohl[r&7]
        ohh_e = jnp.repeat(ohh, 8, axis=0)                # (128, n)
        ohl_e = jnp.tile(ohl, (16, 1))                    # (128, n)
        oh = ohh_e * ohl_e
        a = jnp.dot(blk, oh, preferred_element_type=_F32)
        s = jnp.sum(
            a.reshape(8, 8, -1).sum(1)[:8], axis=0
        ).reshape(rows, 128).astype(_I32)
        code = (code + s % 2 + 1) % 128
        return code, acc + s

    body = {"i32": body_i32, "i16": body_i16, "outer": body_outer}[variant]
    make = _loop_kernel(body, 2, rows=rows, extra=(blk,))
    return time_slope(make, 8192, 65536)


# ------------------------------------------------------------- z-select

def bench_zsel(variant, rows=16, n_ch=8):
    n_all = rows * 128

    def mk_a(code):
        # stand-in extraction result (dependency on code, cheap)
        base = jnp.broadcast_to(
            code.reshape(1, n_all).astype(_F32), (n_ch * 8, n_all))
        return base

    def body_tree(i, st):
        code, acc = st
        a = mk_a(code)
        zlr = (code & 7).reshape(1, n_all)
        sel = a.reshape(n_ch, 8, n_all)
        h = 8
        while h > 1:
            h //= 2
            bit = (zlr & h) != 0
            sel = jnp.where(bit.reshape(1, 1, n_all),
                            sel[:, h:2 * h], sel[:, :h])
        s = sum(
            sel[c, 0].reshape(rows, 128).astype(_I32) for c in range(n_ch)
        )
        code = (code + s % 2 + 1) % 128
        return code, acc + s

    def body_mask(i, st):
        code, acc = st
        a = mk_a(code)
        zlr = (code & 7).reshape(1, n_all)
        iz = jax.lax.broadcasted_iota(_I32, (8, n_all), 0)
        m = (iz == zlr).astype(_F32)                     # (8, n)
        s = None
        for c in range(n_ch):
            v = jnp.sum(a[c * 8:(c + 1) * 8] * m, axis=0)
            v = v.reshape(rows, 128).astype(_I32)
            s = v if s is None else s + v
        code = (code + s % 2 + 1) % 128
        return code, acc + s

    def body_gather(i, st):
        code, acc = st
        a = mk_a(code)
        zlr = (code & 7).reshape(1, n_all)
        zb = jnp.broadcast_to(zlr, (1, n_all))
        s = None
        for c in range(n_ch):
            g = jnp.take_along_axis(a[c * 8:(c + 1) * 8], zb, axis=0)
            v = g.reshape(rows, 128).astype(_I32)
            s = v if s is None else s + v
        code = (code + s % 2 + 1) % 128
        return code, acc + s

    body = {"tree": body_tree, "mask": body_mask,
            "gather": body_gather}[variant]
    make = _loop_kernel(body, 2, rows=rows)
    return time_slope(make, 8192, 65536)


# ------------------------------------------------------------- event

def bench_event(rows=16, lo=4096, hi=32768, gx=160, gy=32, gz=160,
                **kw):
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
                max_events=iters, tile=n, presort=False, windows=1,
                _force_events=True, **kw,
            )
            return hit.t

        return jax.jit(f)

    return time_slope(make, lo, hi)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--rows", type=int, default=16)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(k):
        return only is None or k in only

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    res = {}

    def guard(key, fn):
        # lab variants probe Mosaic's frontier; a variant the compiler
        # rejects must not kill the sections after it (round 5: a zsel
        # relayout rejection aborted the whole lab and cost a session's
        # event-slope measurement)
        try:
            res[key] = fn()
        except Exception as e:
            res[key] = f"unsupported: {type(e).__name__}"

    if want("support"):
        guard("support", probe_support)
        print("support:", res["support"], file=sys.stderr)
    if want("issue"):
        for r in (8, 16, 32):
            guard(f"issue_rows{r}_us", lambda r=r: bench_issue(rows=r) * 1e6)
    if want("onehot"):
        sup = res.get("support", {})
        guard("onehot_i32_us",
              lambda: bench_onehot("i32", rows=args.rows) * 1e6)
        if isinstance(sup, dict) and sup.get("i16_cmp") == "ok":
            guard("onehot_i16_us",
                  lambda: bench_onehot("i16", rows=args.rows) * 1e6)
        guard("onehot_outer_us",
              lambda: bench_onehot("outer", rows=args.rows) * 1e6)
    if want("zsel"):
        guard("zsel_tree_us", lambda: bench_zsel("tree", rows=args.rows) * 1e6)
        guard("zsel_mask_us", lambda: bench_zsel("mask", rows=args.rows) * 1e6)
        guard("zsel_gather_us",
              lambda: bench_zsel("gather", rows=args.rows) * 1e6)
    if want("event"):
        res["event_full_us"] = bench_event(rows=args.rows) * 1e6
        res["event_noskips_us"] = bench_event(
            rows=args.rows, skips=False) * 1e6
        res["event_unroll4_us"] = bench_event(
            rows=args.rows, unroll=4) * 1e6
        res["event_unroll4_stride2_us"] = bench_event(
            rows=args.rows, unroll=4, skip_stride=2) * 1e6
        res["event_rows8_us"] = bench_event(rows=8) * 1e6
        res["event_rows32_us"] = bench_event(
            rows=32, unroll=4, skip_stride=2) * 1e6

    out = {
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in res.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
