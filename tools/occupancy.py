"""Windowed-tracer occupancy diagnostics (docs/PERF.md roofline).

Measures, on real workload ray sets, where the kernel's events go:
  events/tile   — serialized event count (tile time = events x event cost)
  occupancy     — fraction of (events x lanes) that actually marched; the
                  window-consensus loop stalls rays whose window is not
                  resident, so low occupancy = serialization waste
  visits/tile   — outer-loop window switches

Workloads:
  primary    — the bench camera's real raygen rays (coherent fan)
  secondary  — hemisphere rays from the primary hit points (the bounce-1
               regime after the coherence presort)
  streamed   — the same camera over a 13x13-chunk (416-wide) window
               (config 3/4 streamed-world scale)

Usage: python tools/occupancy.py [--tiles 1024,2048] [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ray_sets(span=2):
    import jax.numpy as jnp

    from bench import build_scene
    from wavefront_tpu.core.camera import SphericalCamera
    from wavefront_tpu.core.config import WorldSettings
    from wavefront_tpu.render.wavefront import raygen
    from wavefront_tpu.world.blocks import BlockRegistry

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    registry = BlockRegistry.load(os.path.join(repo, "assets"))
    world = WorldSettings()
    grid, origin = build_scene(registry, world, span=span)

    nb = registry.num_blocks
    transparent = np.zeros(256, bool)
    translucent = np.zeros(256, bool)
    transparent[: nb + 1] = registry.transparent
    translucent[: nb + 1] = registry.translucent
    transparent[nb + 1:] = True
    translucent[nb + 1:] = True

    cam = SphericalCamera()
    cam.set_root_position([0.0, 24.0, 0.0])
    cam.offset = 26.0
    cam.yaw = 0.6
    cam.pitch = -0.55
    basis = cam.eye_front_right_up()
    o, d = raygen(
        jnp.asarray(basis.eye, jnp.float32),
        jnp.asarray(basis.front, jnp.float32),
        jnp.asarray(basis.right, jnp.float32),
        jnp.asarray(basis.up, jnp.float32),
        1920, 1080,
    )[:2]
    return (grid, origin, transparent, translucent), np.asarray(o), np.asarray(d)


def run(pack, go, o, d, tile, max_events, label, windows=4, phases=1,
        phase_events=64):
    import jax
    import jax.numpy as jnp

    from wavefront_tpu.kernels.window_trace import window_trace

    f = jax.jit(
        lambda o_, d_: window_trace(
            pack, go, o_, d_, max_events=max_events, tile=tile,
            windows=windows, phases=phases, phase_events=phase_events,
            presort=True, with_truncated=True,
            with_stats=True,
        )
    )
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    # block_until_ready returns EARLY on the tunneled platform: a scalar
    # readback is the only real completion barrier (docs/PERF.md)
    t0 = time.perf_counter()
    hit, tr, st = f(oj, dj)
    float(jnp.sum(hit.t))
    print(f"  [{label} k={windows} tile={tile}] compile+first "
          f"{time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    dt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        hit, tr, st = f(oj, dj)
        float(jnp.sum(hit.t) + jnp.sum(st["events"]))
        dt = min(dt, time.perf_counter() - t0)
    ev = np.asarray(st["events"], np.int64)
    ml = np.asarray(st["march_lanes"], np.int64)
    vis = np.asarray(st["visits"], np.int64)
    pfh = np.asarray(st["pf_hits"], np.int64)
    occ = ml.sum() / max(ev.sum() * tile, 1)
    # prefetch predictor quality (hbm n_win=1 double-buffer): hits over
    # the visits that HAD a prediction outstanding (= visits - 1 per tile)
    pf_den = max(int((vis - 1).clip(min=0).sum()), 1)
    n = o.shape[0]
    print(
        f"{label:22s} k={windows} tile={tile:5d} {dt*1e3:7.1f} ms"
        f" {n/dt/1e6:6.1f} Mray/s"
        f" | events/tile mean {ev.mean():6.1f} p95 {np.percentile(ev,95):6.0f}"
        f" max {ev.max():5d} | occ {occ:.2f} | visits mean {vis.mean():5.1f}"
        f" | pf_hit {pfh.sum()/pf_den:.2f} | trunc {int(jnp.sum(tr))}"
    )
    return hit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="1024,2048")
    ap.add_argument("--windows", default="4")
    ap.add_argument("--phases", default="1",
                    help="phases:phase_events pairs, e.g. 1,2:48,3:24")
    ap.add_argument("--only", default="",
                    help="substring filter: primary/secondary/streamed")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    tiles = [int(t) for t in args.tiles.split(",")]
    windows = [int(k) for k in args.windows.split(",")]
    phase_cfgs = []
    for spec in args.phases.split(","):
        if ":" in spec:
            a, b = spec.split(":")
            phase_cfgs.append((int(a), int(b)))
        else:
            phase_cfgs.append((int(spec), 64))

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from wavefront_tpu.kernels.window_trace import auto_events, build_window_pack

    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)

    (grid, origin, transparent, translucent), o, d = ray_sets()
    pack = build_window_pack(grid, transparent, translucent)
    go = jnp.asarray(origin, jnp.int32)
    me = auto_events(pack)

    hit = None
    if not args.only or "primary" in args.only:
        for tile in tiles:
            for k in windows:
                for ph, pe in phase_cfgs:
                    hit = run(pack, go, o, d, tile, me, "primary 1080p",
                              windows=k, phases=ph, phase_events=pe)
    else:
        hit = run(pack, go, o, d, tiles[0], me, "primary (for secondary)",
                  windows=windows[0])

    # secondary: hemisphere rays from the primary hit points
    rng = np.random.default_rng(0)
    hmask = np.asarray(hit.hit)
    hp = o + d * np.asarray(hit.t)[:, None]
    axis = np.asarray(hit.face) >> 1
    sgn = (np.asarray(hit.face) & 1) * 2 - 1
    nrm = np.zeros_like(o)
    nrm[np.arange(len(o)), axis] = sgn
    v = rng.standard_normal(o.shape).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    flip = np.sum(v * nrm, axis=-1) < 0
    v[flip] -= 2 * np.sum(v[flip] * nrm[flip], axis=-1, keepdims=True) * nrm[flip]
    o2 = (hp + nrm * 1e-3).astype(np.float32)
    d2 = np.where(hmask[:, None], v, 0.0).astype(np.float32)
    if not args.only or "secondary" in args.only:
        for tile in tiles:
            for k in windows:
                for ph, pe in phase_cfgs:
                    run(pack, go, o2, d2, tile, me, "secondary hemi",
                        windows=k, phases=ph, phase_events=pe)

    if not args.quick:
        # THE REAL STREAMED WINDOW (config 6/8): the ChunkManager's
        # 416x96x416 game window + the ladder camera, 1024x1024 raygen —
        # not the old 32-tall span-6 approximation.  Tables are ~21 MB so
        # window_trace auto-selects the HBM per-visit-DMA path; k=1 runs
        # the cross-visit prefetch double-buffer (pf_hit column).
        from tools.bench_ladder import streamed_setup
        from wavefront_tpu.render.wavefront import raygen
        from wavefront_tpu.world.blocks import BlockRegistry

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        registry = BlockRegistry.load(os.path.join(repo, "assets"))
        scene, cm, settings, basis = streamed_setup(registry, 1024, 1024, 6)
        arrays = scene.get_arrays()
        pack = arrays.winpack
        print(f"streamed pack: {pack.tw.shape[0]} uniq windows of "
              f"{pack.wmap.shape[0]}; grid {pack.gx}x{pack.gy}x{pack.gz}; "
              f"tables {(pack.tw.size + pack.twid.size) * 2 / 2**20:.1f} MB",
              file=sys.stderr)
        go = arrays.grid_origin
        me = auto_events(pack)
        o, d = raygen(
            jnp.asarray(basis.eye, jnp.float32),
            jnp.asarray(basis.front, jnp.float32),
            jnp.asarray(basis.right, jnp.float32),
            jnp.asarray(basis.up, jnp.float32),
            1024, 1024,
        )[:2]
        o, d = np.asarray(o), np.asarray(d)
        hit = None
        for tile in tiles:
            for k in windows:
                for ph, pe in phase_cfgs:
                    hit = run(pack, go, o, d, tile, me,
                              "streamed96 primary", windows=k, phases=ph,
                              phase_events=pe)
        # streamed secondary: hemisphere fan off the primary hits — the
        # bounce population that makes configs 6/8 5.4x the flat headline
        rng = np.random.default_rng(0)
        hmask = np.asarray(hit.hit)
        hp = o + d * np.asarray(hit.t)[:, None]
        axis = np.asarray(hit.face) >> 1
        sgn = (np.asarray(hit.face) & 1) * 2 - 1
        nrm = np.zeros_like(o)
        nrm[np.arange(len(o)), axis] = sgn
        v = rng.standard_normal(o.shape).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        flip = np.sum(v * nrm, axis=-1) < 0
        v[flip] -= (
            2 * np.sum(v[flip] * nrm[flip], axis=-1, keepdims=True)
            * nrm[flip]
        )
        o2 = (hp + nrm * 1e-3).astype(np.float32)
        d2 = np.where(hmask[:, None], v, 0.0).astype(np.float32)
        for tile in tiles:
            for k in windows:
                for ph, pe in phase_cfgs:
                    run(pack, go, o2, d2, tile, me, "streamed96 hemi",
                        windows=k, phases=ph, phase_events=pe)


if __name__ == "__main__":
    main()
