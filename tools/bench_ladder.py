"""The 5-config benchmark ladder (BASELINE.md).

Prints one JSON line per config with frame ms and Mrays/sec.  The headline
driver metric stays in bench.py; this tool is for profiling the full ladder.

Run: python tools/bench_ladder.py [--configs 1 2 3] [--frames 5]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(config, registry):
    """Configs 3/4 ARE the headline program (bench.headline_setup: same
    scene, pose, settings — one trace budget, VERDICT round 1 weak #1);
    config 5 reuses its scene+pose at 1440p x8."""
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
        return scene, settings, 1, basis
    else:
        scene, settings, basis, _prefs = headline_setup(
            width=2560, height=1440, bounces=8, cache_primary=True
        )
        return scene, settings, 1, basis
    scene = VoxelScene(registry, grid, origin, max_light_prims=1024)
    return scene, settings, nee, None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    p.add_argument("--frames", type=int, default=5)
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
        scene, settings, nee, basis = build(config, registry)
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

        t0 = time.perf_counter()
        for f in range(1, args.frames + 1):
            if config == 4:
                # dynamic edit each frame (incremental grid + light rebuild)
                scene.set_block((f % 16, 40, 3), f % 7)
            out = renderer.render(scene, basis, prefs, frame_count=f,
                                  as_numpy=False)
            if accum is not None:
                accum.add(out, key="static")
        np.asarray(out).ravel()[0]
        dt = (time.perf_counter() - t0) / args.frames

        rays = settings.n_rays * settings.num_bounces
        print(json.dumps({
            "config": config,
            "frame_ms": round(dt * 1000, 1),
            "mrays_per_sec": round(rays / dt / 1e6, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
