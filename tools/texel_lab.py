"""Isolated texel-fetch cost on the real TPU: Pallas kernel vs XLA gather.

Times `kernels/texel.texel_fetch` and the gather it replaces on a
headline-shaped workload (2,073,600 rays, the bench atlas shape), with
the chained-scalar-readback timing discipline (bench.py notes: never
trust block_until_ready on the tunneled platform).

Run: python tools/texel_lab.py [--n 2073600] [--iters 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters):
    import jax
    import jax.numpy as jnp

    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(out))  # settle/compile
    acc = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
        acc = out if acc is None else acc + out
    float(jnp.sum(acc))
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2073600)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--tiles", type=int, nargs="+", default=[2048])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    from wavefront_tpu.kernels.texel import texel_fetch

    rng = np.random.default_rng(0)
    S, size, nch = 42, 16, 12
    atlas = jnp.asarray(rng.random((S, size, size, nch), np.float32))
    tex = jnp.asarray(rng.integers(0, S, args.n, dtype=np.int32))
    u = jnp.asarray(rng.random(args.n, dtype=np.float32))
    v = jnp.asarray(rng.random(args.n, dtype=np.float32))

    def gather(atlas, tex, u, v):
        ti = jnp.clip((u * size).astype(jnp.int32), 0, size - 1)
        tj = jnp.clip((v * size).astype(jnp.int32), 0, size - 1)
        return atlas[tex, tj, ti]

    dt = timeit(gather, (atlas, tex, u, v), args.iters)
    print(f"xla gather (N,{nch}):            {dt * 1000:8.2f} ms")

    chans = (0, 1, 2, 3, 4, 5, 6, 8)
    for tile in args.tiles:
        for label, kw in [
            ("12ch", {}),
            (" 8ch", {"channels": chans}),
        ]:
            def kern(atlas, tex, u, v, kw=kw, tile=tile):
                return texel_fetch(atlas, tex, u, v, tile=tile, **kw)

            dt = timeit(kern, (atlas, tex, u, v), args.iters)
            print(f"pallas {label} tile={tile:5d}:       "
                  f"{dt * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
