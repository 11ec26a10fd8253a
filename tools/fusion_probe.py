"""Phase-C (bounce fusion) go/no-go probe — measures the plan's named
killer risk (docs/PERF.md "path to >=300"): in-tile occupancy decay
without global compaction.

A fused trace+shade+trace kernel keeps each 2048-ray tile VMEM-resident
through all bounces: no per-bounce global sort, no HBM round trips — but
also no cross-tile repacking, so a tile's bounce-2 cost is set by ITS OWN
scattered rays: the alive fraction (dead lanes still burn VPU slots) and
the distinct-window spread (each extra resident window is an extra
extraction matmul per event, or an extra serial visit).

This probe runs the PRODUCTION bounce-0 (presorted windowed trace + XLA
shade) and reports, per presorted 2048-ray tile:
  * alive fraction after the bounce-0 scatter (in-tile occupancy ceiling)
  * distinct 32^3 windows containing the scattered rays' next positions
    (the fused bounce-1 extraction multiplier)
  * the same two after ONE MORE staged bounce (decay trend)

Combined with tools/sort_sweep.py's `none` row (the frame cost of
tracing bounce 1+ in stale bounce-0 order — exactly the fused regime's
ray order) this grounds the Phase-C decision without building the fused
kernel first.

Run (TPU): python tools/fusion_probe.py [--tile 2048]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tile", type=int, default=2048)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp

    from bench import headline_setup
    from wavefront_tpu.core.rng import murmur3_combine
    from wavefront_tpu.kernels.window_trace import _coherence_key
    from wavefront_tpu.render.renderer import _shade
    from wavefront_tpu.render.wavefront import raygen_soa
    from wavefront_tpu.core import vec3

    scene, settings, basis, prefs = headline_setup(args.width, args.height)
    arr = scene.get_arrays()
    pack = arr.winpack
    o, d, rid = raygen_soa(
        np.asarray(basis.eye, np.float32),
        np.asarray(basis.front, np.float32),
        np.asarray(basis.right, np.float32),
        np.asarray(basis.up, np.float32),
        args.width, args.height,
    )
    go = arr.grid_origin

    @jax.jit
    def bounce(o, d, rid, b):
        seed = murmur3_combine(jnp.uint32(b), rid)
        no, nd, *_rest = _shade(
            arr, settings, prefs.nee_type, jnp.int32(b), o, d, seed,
            use_entities=False,
        )
        return no, nd

    @jax.jit
    def order_and_stats(o, d):
        """Presort by the bounce's coherence key, then per-tile stats of
        the NEXT segment's start windows."""
        key = _coherence_key(
            pack, o.x - go[0], o.y - go[1], o.z - go[2], d.x, d.y, d.z
        )
        idx = jnp.argsort(key)
        return idx

    def win_of(o, d):
        ox = np.asarray(o.x) - float(go[0])
        oy = np.asarray(o.y) - float(go[1])
        oz = np.asarray(o.z) - float(go[2])
        alive = (np.asarray(d.x) != 0) | (np.asarray(d.y) != 0) \
            | (np.asarray(d.z) != 0)
        # advance just inside the grid like the tracer's entry logic; for
        # this statistic the START cell is enough (scattered rays start on
        # their hit surface, inside the grid)
        cx = np.clip(np.floor(ox).astype(np.int64), 0, pack.gx - 1)
        cy = np.clip(np.floor(oy).astype(np.int64), 0, pack.gy - 1)
        cz = np.clip(np.floor(oz).astype(np.int64), 0, pack.gz - 1)
        w = ((cy >> 5) * pack.nwx + (cx >> 5)) * pack.nwz + (cz >> 5)
        return w, alive

    def tile_stats(wins, alive, order, tag):
        w = wins[order].reshape(-1, args.tile)
        a = alive[order].reshape(-1, args.tile)
        nw = np.array([
            len(np.unique(w[i][a[i]])) if a[i].any() else 0
            for i in range(w.shape[0])
        ])
        occ = a.mean(axis=1)
        live = nw > 0
        rec = {
            "stage": tag,
            "tiles": int(w.shape[0]),
            "live_tiles": int(live.sum()),
            "alive_frac_mean": round(float(occ.mean()), 4),
            "alive_frac_p50": round(float(np.median(occ)), 4),
            "windows_per_tile_mean": round(float(nw[live].mean()), 2),
            "windows_per_tile_p95": int(np.percentile(nw[live], 95)),
            "windows_per_tile_max": int(nw.max()),
        }
        print(json.dumps(rec), flush=True)

    # bounce 0: primary rays, presorted (the fused kernel's tile layout)
    idx0 = np.asarray(order_and_stats(o, d))
    no, nd = bounce(o, d, rid, 0)
    w1, a1 = win_of(no, nd)
    tile_stats(w1, a1, idx0, "after-b0-scatter (fused b1 trace layout)")

    # one more staged bounce in the SAME stale order (fused b2 layout)
    no2, nd2 = bounce(no, nd, rid, 1)
    w2, a2 = win_of(no2, nd2)
    tile_stats(w2, a2, idx0, "after-b1-scatter (fused b2 trace layout)")

    # reference point: what a re-sort would recover at b1
    no_v3 = no
    idx1 = np.asarray(order_and_stats(no_v3, nd))
    tile_stats(w1, a1, idx1, "after-b0-scatter, RE-SORTED (wavefront)")


if __name__ == "__main__":
    main()
