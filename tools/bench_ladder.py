"""The benchmark ladder (BASELINE.md configs 1-5 + streamed-window rows).

Prints one JSON line per config with frame ms and Mrays/sec.  The headline
driver metric stays in bench.py; this tool is for profiling the full ladder.

Configs:
  1  256^2 x1, single 16^3 chunk (also reports the k=8 BATCHED effective
     frame time — config 1 is dispatch-floor bound, docs/PERF.md)
  2  512^2 x2, one 32^3 chunk
  3  the headline program (bench.headline_setup: 1080p x4, NEE)
  4  config 3 + one block edit per frame (incremental scene updates)
  5  1440p x8 + accumulation (in-device k=8 batch accumulation)
  6  config 3's workload on the GAME-LAYER STREAMED window: load_radius 6
     -> 13x3x13 chunks = 416x96x416 voxels (chunk_manager.rs:29-37)
  7  config 6 + one block edit per frame (PackBuilder incremental edits)
  8  the reference's default workload: 1024x1024 x6 on the streamed
     window (main.rs:801, interactive_rendering.rs:652-653)

Run: python tools/bench_ladder.py [--configs 1 2 3] [--frames 5]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def streamed_setup(registry, width, height, bounces):
    """Game-layer streamed window at the reference scale: ChunkManager
    with load_radius 6 (13x3x13 chunks of 32^3 = 416x96x416), generated
    synchronously, recentered on the ego chunk — the scene class the
    reference actually plays in (chunk_manager.rs:29-37,165-315)."""
    from wavefront_tpu.core.camera import SphericalCamera
    from wavefront_tpu.core.config import RenderSettings, WorldSettings
    from wavefront_tpu.render.scene import VoxelScene
    from wavefront_tpu.world.chunk_manager import ChunkManager

    world = WorldSettings(load_radius=6, evict_radius=8)
    scene = VoxelScene(
        registry,
        np.zeros((1, 1, 1), np.uint8),
        (0, 0, 0),
        max_light_prims=1024,
    )
    cm = ChunkManager(world, registry, scene, window_chunks=None,
                      synchronous=True)
    for key in cm._window_keys((0, 0, 0)):
        cm._request_chunk(key)
    cm._rebuild_window()

    settings = RenderSettings(
        width=width, height=height, num_bounces=bounces,
        max_trace_steps=192, trace_audit=True,
        # mirror bench.headline_setup's tuned config.  Compaction is back
        # ON for the streamed window: its ~21 MB device table now lives in
        # HBM (window_trace auto-switches tables beyond 10 MB to per-visit
        # DMA), so the compaction lax.switch no longer blows the 16 MB
        # scoped-VMEM stack it hit on the 2026-08-18 ladder run.
        compaction=True,
        # round-5 streamed tune (docs/PERF.md occupancy tables): tile
        # 1024 beats 2048 by ~18% on the streamed hemisphere fan
        # (straggler granularity), phases 2:16 another ~7%; scheduled on
        # the two hottest diffuse bounces.  The round-5 in-frame audit
        # also raised auto_events 3x -> 6x grid diameter (86.5k silently
        # truncated rays/frame at the old cap).
        trace_unroll=4, trace_tile=1024,
        trace_skip_stride=2, trace_phases=2, trace_phase_events=16,
        # (1,2,3,4) measured 1952.1 vs 2014.3 ms on config 8 vs (1,2)
        # (same-session 3-frame A/B, 2026-08-21) — every diffuse bounce
        # pays for its straggler re-sort in this regime
        trace_phases_at=(1, 2, 3, 4),
    )
    cam = SphericalCamera()
    cam.set_root_position([0.0, 14.0, 0.0])
    cam.offset = 26.0
    cam.yaw = 0.35
    cam.pitch = -0.55
    return scene, cm, settings, cam.eye_front_right_up()


def build(config, registry):
    """Configs 3/4 ARE the headline program (bench.headline_setup: same
    scene, pose, settings — one trace budget, VERDICT round 1 weak #1);
    config 5 reuses its scene+pose at 1440p x8; configs 6-8 run the
    game-layer streamed window."""
    from wavefront_tpu.core.config import RenderSettings, WorldSettings
    from wavefront_tpu.render.scene import VoxelScene
    from wavefront_tpu.world.worldgen import WorldGenerator

    from bench import headline_setup

    world = WorldSettings()
    if config == 1:
        gen = WorldGenerator(WorldSettings(chunk_size=16), registry)
        grid, origin = gen.generate_chunk((0, 0, 0)), (0, 0, 0)
        settings = RenderSettings(width=256, height=256, num_bounces=1,
                                  max_trace_steps=64)
        nee = 0
    elif config == 2:
        gen = WorldGenerator(world, registry)
        grid, origin = gen.generate_chunk((0, 0, 0)), (0, 0, 0)
        settings = RenderSettings(width=512, height=512, num_bounces=2,
                                  max_trace_steps=96)
        nee = 0
    elif config in (3, 4):
        scene, settings, basis, _prefs = headline_setup()
        return scene, None, settings, 1, basis
    elif config == 5:
        scene, settings, basis, _prefs = headline_setup(
            width=2560, height=1440, bounces=8, cache_primary=True
        )
        return scene, None, settings, 1, basis
    elif config in (6, 7):
        scene, cm, settings, basis = streamed_setup(
            registry, 1920, 1080, 4
        )
        return scene, cm, settings, 1, basis
    elif config == 8:
        scene, cm, settings, basis = streamed_setup(
            registry, 1024, 1024, 6
        )
        return scene, cm, settings, 1, basis
    else:
        raise SystemExit(f"unknown config {config}")
    scene = VoxelScene(registry, grid, origin, max_light_prims=1024)
    return scene, None, settings, nee, None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--batch", type=int, default=8,
                   help="batch size for the config 1/5 batched rows")
    p.add_argument("--platform", default=None,
                   help="force a jax platform, e.g. cpu")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from wavefront_tpu.core.camera import SphericalCamera
    from wavefront_tpu.core.config import RenderingPreferences
    from wavefront_tpu.render.accumulate import TemporalAccumulator
    from wavefront_tpu.render.renderer import Renderer
    from wavefront_tpu.world.blocks import BlockRegistry

    registry = BlockRegistry.load(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")
    )

    cam = SphericalCamera()
    cam.set_root_position([0.0, 12.0, 0.0])
    cam.offset = 28.0
    cam.yaw = 0.6
    cam.pitch = -0.35
    default_basis = cam.eye_front_right_up()

    for config in args.configs:
        scene, cm, settings, nee, basis = build(config, registry)
        if basis is None:
            basis = default_basis
        renderer = Renderer(settings)
        prefs = RenderingPreferences(nee_type=nee)
        accum = TemporalAccumulator() if config == 5 else None

        t_compile = time.perf_counter()
        img = renderer.render(scene, basis, prefs, frame_count=0)
        if settings.cache_primary:
            # the primary-cached frame is a SECOND jit variant — warm it
            # too, or the timed loop absorbs a full compile
            renderer.render(scene, basis, prefs, frame_count=0)
        compile_s = time.perf_counter() - t_compile
        assert np.all(np.isfinite(img))

        stone = 5                      # solid place/break (the gameplay
        air = registry.air             # case; glass into a glass-free
        #                                pack full-rebuilds by design)
        import jax.numpy as jnp

        # settle frame: the first post-compile frame measures ~2x slow on
        # the tunneled platform (stage_table warmup finding)
        out = renderer.render(scene, basis, prefs, frame_count=0,
                              as_numpy=False)
        float(jnp.sum(out))
        acc = None
        t0 = time.perf_counter()
        for f in range(1, args.frames + 1):
            if config == 4:
                # dynamic edit each frame (incremental pack update); the
                # bench grid spans y 0..31 — the old y=40 edit was a
                # silent out-of-grid no-op
                scene.set_block((8 + f % 16, 20, 3),
                                stone if f % 2 else air)
            elif config == 7 and cm is not None:
                # edit through the game layer (chunk clone + scene mirror)
                cm.set_block((8 + f % 16, 30, 3),
                             stone if f % 2 else air)
            out = renderer.render(scene, basis, prefs, frame_count=f,
                                  as_numpy=False)
            if accum is not None:
                out = accum.add(out, key="static")
            acc = out if acc is None else acc + out
            if config in (4, 7):
                # edit configs sync per frame: interleaving host->device
                # edit uploads with in-flight renders measured 1.49 s/frame
                # vs 0.57 s synced (the tunnel serializes the uploads
                # against the running program) — an interactive loop syncs
                # anyway when it reads the image, so this is the realistic
                # cadence
                float(jnp.sum(out))
        # force EVERY frame via a chained scalar readback (a full-image
        # np.asarray costs ~240 ms at 1080p over the tunnel and was
        # inflating the per-frame mean)
        float(jnp.sum(acc))
        dt = (time.perf_counter() - t0) / args.frames

        rays = settings.n_rays * settings.num_bounces
        rec = {
            "config": config,
            "frame_ms": round(dt * 1000, 1),
            "mrays_per_sec": round(rays / dt / 1e6, 2),
            "compile_s": round(compile_s, 1),
        }
        if settings.trace_audit:
            # exhaustive-traversal audit on a ladder frame (round 5: the
            # streamed rows silently truncated 86.5k rays at the old
            # 3x-diameter budget — the audit is now row-visible)
            _, aux = renderer.render(scene, basis, prefs, frame_count=1,
                                     as_numpy=False, with_aux=True)
            rec["truncated_rays"] = int(aux["truncated"])
            rec["nee_overflow_rays"] = int(aux["nee_overflow"])

        if config in (6, 8) and cm is not None:
            # recenter row (VERDICT r3 #4): move the center one chunk +x
            # and measure the streamed recenter BOTH ways — frames served
            # while the background job runs (stale window), and the
            # adoption frame (reshift + device writes + lights + render).
            # "Done" bar: adoption frame <= 2x a steady frame.
            cx0, cy0, cz0 = cm.center_chunk
            cm.center_chunk = (cx0 + 1, cy0, cz0)
            for key in cm._window_keys(cm.center_chunk):
                cm._request_chunk(key)          # synchronous gen
            cm._window_dirty = True
            cm._async_rebuild_opt = True
            t_rec0 = time.perf_counter()
            cm._submit_rebuild()
            stale_frames = 0
            stale_ms = []
            while (cm._rebuild_job is not None
                   and not cm._rebuild_job.done()):
                tf = time.perf_counter()
                out = renderer.render(scene, basis, prefs,
                                      frame_count=90 + stale_frames,
                                      as_numpy=False)
                float(jnp.sum(out))
                stale_ms.append((time.perf_counter() - tf) * 1000)
                stale_frames += 1
            t_adopt0 = time.perf_counter()
            cm._adopt_rebuild()
            out = renderer.render(scene, basis, prefs, frame_count=89,
                                  as_numpy=False)
            float(jnp.sum(out))
            rec["recenter_total_s"] = round(
                time.perf_counter() - t_rec0, 2)
            rec["recenter_adopt_frame_ms"] = round(
                (time.perf_counter() - t_adopt0) * 1000, 1)
            rec["recenter_stale_frames"] = stale_frames
            if stale_ms:
                rec["recenter_stale_frame_ms"] = round(
                    float(np.mean(stale_ms)), 1)

        if config in (1, 5) and args.batch > 1:
            # dispatch amortization: k frames per program (VERDICT r1 #5)
            k = args.batch
            kw = dict(k=k, accumulate=config == 5, as_numpy=False)
            out = renderer.render_batch(scene, basis, prefs, 0, **kw)
            float(jnp.sum(out))              # warm the batch variant
            t0 = time.perf_counter()
            out = renderer.render_batch(scene, basis, prefs, k, **kw)
            float(jnp.sum(out))
            bdt = (time.perf_counter() - t0) / k
            rec["batched_frame_ms"] = round(bdt * 1000, 2)
            rec["batched_mrays_per_sec"] = round(rays / bdt / 1e6, 2)
            rec["batch_k"] = k

        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
