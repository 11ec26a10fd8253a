"""TPU availability probe + first-contact microbenchmark.

The TPU is reached through a tunneled platform that is sometimes down for
long stretches (round-1 judging saw multi-hour outages).  This probe makes
one bounded attempt to initialize the backend and run a trivial program.
On success it appends a JSON line to --log and (with --micro) runs the
microbenchmark suite whose numbers drive the perf cost model in
docs/PERF.md.

Exit codes: 0 = TPU up, 1 = TPU down/timeout.
Usage: timeout 180 python tools/tpu_probe.py [--micro] [--log PATH]
"""

import argparse
import json
import sys
import time


def micro_suite():
    import jax
    import jax.numpy as jnp
    import numpy as np

    out = {}

    def timeit(fn, *args, reps=5, warmup=2):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps

    # 1. dispatch overhead: trivial program
    f_triv = jax.jit(lambda x: x + 1.0)
    x = jnp.ones((8, 128))
    out["dispatch_ms"] = timeit(f_triv, x, reps=20) * 1e3

    # 2. while_loop iteration cost (trivial body, 256 iters)
    def loop(n0):
        def body(c):
            i, a = c
            return i + 1, a + 1.0
        return jax.lax.while_loop(lambda c: c[0] < 256, body, (n0, jnp.float32(0)))[1]
    f_loop = jax.jit(loop)
    t_loop = timeit(f_loop, jnp.int32(0), reps=5)
    out["while_iter_us"] = t_loop / 256 * 1e6

    # 3. fori_loop with a fat body (1M-elem elementwise x 8 ops), 64 iters
    def fat(x):
        def body(i, a):
            for _ in range(8):
                a = a * 1.000001 + 0.5
            return a
        return jax.lax.fori_loop(0, 64, body, x)
    xb = jnp.ones((1024, 1024))
    out["fat_fori_64x8_ms"] = timeit(jax.jit(fat), xb) * 1e3

    # 4. gather: 1M random indices from a 1M-entry table
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal(1 << 20), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 1 << 20, 1 << 20), jnp.int32)
    f_g = jax.jit(lambda t, i: t[i].sum())
    out["gather_1M_ms"] = timeit(f_g, table, idx) * 1e3

    # 4b. gather from a small (819K-entry, grid-sized) int32 table
    table_s = jnp.asarray(rng.integers(0, 127, 819200), jnp.int32)
    idx_s = jnp.asarray(rng.integers(0, 819200, 1 << 20), jnp.int32)
    f_gs = jax.jit(lambda t, i: t[i].sum())
    out["gather_1M_small_table_ms"] = timeit(f_gs, table_s, idx_s) * 1e3

    # 5. MXU: 4096^3 bf16 matmul
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    f_mm = jax.jit(lambda a: (a @ a).sum())
    t_mm = timeit(f_mm, a)
    out["matmul4k_bf16_tflops"] = 2 * 4096**3 / t_mm / 1e12

    # 6. elementwise bandwidth: 64MB triad
    big = jnp.ones((1 << 24,), jnp.float32)
    f_ew = jax.jit(lambda x: x * 1.5 + 2.0)
    t_ew = timeit(f_ew, big)
    out["triad_gbps"] = (2 * 4 * (1 << 24)) / t_ew / 1e9

    # 7. pallas: trivial kernel w/ internal fori_loop of 4096 iters
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k(i_ref, o_ref):
            def body(i, a):
                return a + i_ref[:]
            o_ref[:] = jax.lax.fori_loop(0, 4096, body, jnp.zeros_like(i_ref))

        def f_p(x):
            return pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
        xp = jnp.ones((512, 128), jnp.float32)
        t_p = timeit(jax.jit(f_p), xp)
        out["pallas_fori_iter_ns"] = t_p / 4096 * 1e9
    except Exception as e:  # pragma: no cover
        out["pallas_error"] = str(e)[:200]

    # 8. pallas dynamic_gather (sublane gather, same-shape (R,128) int32)
    # at several table heights R — decides the Pallas DDA table budget.
    # 64 gathers per call to amortize dispatch.
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        for R in (8, 512, 2048, 4096):
            def kg(t_ref, i_ref, o_ref):
                def body(k, acc):
                    g = jnp.take_along_axis(
                        t_ref[:], (i_ref[:] + k) % R, axis=0
                    )
                    return acc + g
                o_ref[:] = jax.lax.fori_loop(
                    0, 64, body, jnp.zeros_like(t_ref)
                )

            def f_g2(t, i):
                return pl.pallas_call(
                    kg,
                    out_shape=jax.ShapeDtypeStruct(t.shape, t.dtype),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(t, i)

            tt = jnp.asarray(
                rng.integers(0, 100, (R, 128)), jnp.int32
            )
            ii = jnp.asarray(rng.integers(0, R, (R, 128)), jnp.int32)
            t_g = timeit(jax.jit(f_g2), tt, ii, reps=3)
            # per-lookup cost in ns: 64 gathers x R x 128 lookups
            out[f"pallas_dyngather_R{R}_ns_per_lookup"] = (
                t_g / (64 * R * 128) * 1e9
            )
            out[f"pallas_dyngather_R{R}_us_per_op"] = t_g / 64 * 1e6
    except Exception as e:  # pragma: no cover
        out["pallas_gather_error"] = str(e)[:200]

    # 9. VMEM capacity probe: largest single VMEM scratch that compiles+runs
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        ok_mb = 0
        for mb in (8, 16, 24, 32, 48, 64, 96):
            rows = mb * 1024 * 1024 // (128 * 4)

            def kv(i_ref, o_ref, scratch):
                scratch[0:8, :] = i_ref[:]
                o_ref[:] = scratch[0:8, :]

            def f_v(x):
                return pl.pallas_call(
                    kv,
                    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
                )(x)
            try:
                jax.block_until_ready(jax.jit(f_v)(jnp.ones((8, 128))))
                ok_mb = mb
            except Exception:
                break
        out["vmem_scratch_max_mb"] = ok_mb
    except Exception as e:  # pragma: no cover
        out["vmem_probe_error"] = str(e)[:200]

    # 10. XLA gather with table resident-in-VMEM-sized + fat unrolled loop:
    # 16 dependent gathers of 2M from a 102400-entry table inside one jit
    table2 = jnp.asarray(rng.integers(0, 102399, 102400), jnp.int32)
    idx2 = jnp.asarray(rng.integers(0, 102400, 1 << 21), jnp.int32)

    def chain(t, i):
        for _ in range(16):
            i = t[i]
        return i.sum()
    t_c = timeit(jax.jit(chain), table2, idx2, reps=3)
    out["xla_chained_gather_ns_per_lookup"] = t_c / (16 * (1 << 21)) * 1e9

    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro", action="store_true")
    ap.add_argument("--log", default="/tmp/tpu_probe.jsonl")
    args = ap.parse_args()

    t0 = time.time()
    rec = {"ts": t0}
    try:
        import os

        import jax

        # the axon site wrapper ignores the JAX_PLATFORMS env var (it
        # pre-imports jax); honor it explicitly so CPU smoke runs work
        if os.environ.get("JAX_PLATFORMS"):
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

        devs = jax.devices()
        rec["devices"] = [str(d) for d in devs]
        rec["platform"] = jax.default_backend()
        import jax.numpy as jnp

        y = (jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
        rec["up"] = True
        rec["init_s"] = time.time() - t0
        if args.micro and rec["platform"] == "tpu":
            rec["micro"] = micro_suite()
    except Exception as e:
        rec["up"] = False
        rec["error"] = str(e)[:300]

    with open(args.log, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=2))
    sys.exit(0 if rec.get("up") else 1)


if __name__ == "__main__":
    main()
