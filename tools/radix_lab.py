"""Settle C15 with data (VERDICT r4 #4): can a Pallas LSD radix sort beat
the multi-operand `lax.sort` at the headline's per-bounce payload?

The reference's GPU radix sort (radix_sort/mod.rs:29-38) is upsweep
(histogram) -> spine (prefix sums) -> downsweep (shared-memory reorder +
scatter).  On TPU the three stages map very differently:

  * histogram: one one-hot matmul per tile — CHEAP (measured below);
  * spine: a tiny prefix sum — free;
  * downsweep/scatter: applying the computed permutation to the payload.
    TPU vector memory has no scatter (Mosaic supports only the degenerate
    dynamic gather), so the permutation must be applied as an XLA
    gather per operand — the exact "permutation tax" docs/PERF.md
    measured at ~17-40 ms per 2M-element gather, vs ~12 ms for the WHOLE
    14-operand lax.sort (payloads ride the bitonic network's
    compare-exchanges instead of paying random access).

This lab measures each stage at the headline shape (N = 1920*1080,
14 operands) so the radix-vs-bitonic decision is a table, not an
argument:

  row sort14        — the incumbent: 14-operand lax.sort
  row sort2+gather  — (key, idx) lax.sort + 13 payload gathers
  row radix_hist    — Pallas per-pass digit histogram + spine (the cheap
                      2/3 of the radix pipeline; 4 passes)
  row radix_scatter — the unavoidable 4x payload permutation (4 LSD
                      passes x 14 operands, applied as XLA gathers)

Run on hardware: python tools/radix_lab.py
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=5):
    import jax

    def settle(out):
        # block_until_ready returns EARLY on the tunneled platform
        # (docs/PERF.md): a scalar readback is the only real barrier
        s = out[0] if isinstance(out, (tuple, list)) else out
        float(jax.numpy.sum(s[::4096]))

    settle(fn(*args))          # compile
    settle(fn(*args))          # settle frame (first post-compile ~2x)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    settle(out)
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1920 * 1080)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    n = args.n
    rng = np.random.default_rng(0xDEADBEEF)
    key = jnp.asarray(rng.integers(0, 2 ** 32, n, dtype=np.uint32))
    ops = tuple(
        jnp.asarray(rng.random(n, np.float32)) for _ in range(12)
    ) + (jnp.asarray(np.arange(n, dtype=np.uint32)),)

    # ---- row 1: the incumbent 14-operand sort ----
    @jax.jit
    def sort14(key, ops):
        return jax.lax.sort((key,) + ops, num_keys=1)

    dt = timed(lambda: sort14(key, ops), reps=args.reps)
    print(json.dumps({"row": "sort14", "ms": round(dt * 1000, 2)}),
          flush=True)

    # ---- row 2: (key, idx) sort + payload gathers ----
    @jax.jit
    def sort2_gather(key, ops):
        _, perm = jax.lax.sort((key, ops[-1]), num_keys=1)
        return tuple(o[perm] for o in ops[:-1])

    dt = timed(lambda: sort2_gather(key, ops), reps=args.reps)
    print(json.dumps({"row": "sort2+gather", "ms": round(dt * 1000, 2)}),
          flush=True)

    # ---- row 3: Pallas digit histogram + spine (4 LSD passes) ----
    TILE = 2048
    n_pad = -n % TILE
    n_tiles = (n + n_pad) // TILE

    def hist_kernel(k_ref, h_ref, *, shift):
        rows, t = k_ref.shape
        digit = (
            jax.lax.shift_right_logical(k_ref[:], jnp.uint32(shift))
            & jnp.uint32(255)
        ).astype(jnp.int32).reshape(1, rows * t)
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, rows * t), 0)
        oh = (iota == digit).astype(jnp.bfloat16)
        ones = jnp.ones((rows * t, 1), jnp.bfloat16)
        h = jnp.dot(oh, ones, preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            h_ref[:] = jnp.zeros_like(h_ref)

        h_ref[:] = h_ref[:] + h.reshape(1, 256)

    def hist_pass(k2d, shift):
        return pl.pallas_call(
            functools.partial(hist_kernel, shift=shift),
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((TILE // 128, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 256), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 256), jnp.float32),
        )(k2d)

    @jax.jit
    def radix_hist(key):
        k2d = jnp.concatenate(
            [key, jnp.zeros(n_pad, jnp.uint32)]
        ).reshape(n_tiles * TILE // 128, 128)
        outs = []
        for p_ in range(4):
            h = hist_pass(k2d, 8 * p_)
            outs.append(jnp.cumsum(h[0]))      # spine
        return jnp.stack(outs)

    dt = timed(lambda: radix_hist(key), reps=args.reps)
    print(json.dumps({"row": "radix_hist+spine_4pass",
                      "ms": round(dt * 1000, 2)}), flush=True)

    # ---- row 4: the scatter the radix pipeline cannot avoid: 4 passes x
    # 14-operand permutation application (gathers; destinations handed in
    # free — this is a LOWER bound for the whole downsweep stage) ----
    perm0 = jnp.asarray(rng.permutation(n).astype(np.int32))

    @jax.jit
    def radix_scatter(perm, key, ops):
        state = (key,) + ops
        for _ in range(4):
            state = tuple(o[perm] for o in state)
        return state

    dt = timed(lambda: radix_scatter(perm0, key, ops), reps=args.reps)
    print(json.dumps({"row": "radix_4pass_scatter_lowerbound",
                      "ms": round(dt * 1000, 2)}), flush=True)


if __name__ == "__main__":
    main()
