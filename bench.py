"""Benchmark harness: Mrays/sec on the BASELINE headline config.

Runs the full wavefront frame (1080p, 4 bounces, multi-chunk voxel scene
with NEE) on the available accelerator and prints ONE JSON line:
  {"metric": "Mrays_per_sec", "value": N, "unit": "Mray/s", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
1 Grays/sec/chip (the reference itself publishes no numbers; BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def build_scene(registry, world, span=2):
    """(2*span+1)^2 x 1 chunk neighborhood around the origin, assembled into
    one device grid — the multi-chunk scene of BASELINE config 3."""
    from wavefront_tpu.world.worldgen import WorldGenerator

    gen = WorldGenerator(world, registry)
    cs = world.chunk_size
    nx = nz = 2 * span + 1
    grid = np.zeros((nx * cs, cs, nz * cs), np.uint8)
    for cx in range(-span, span + 1):
        for cz in range(-span, span + 1):
            chunk = gen.generate_chunk((cx, 0, cz))
            grid[
                (cx + span) * cs : (cx + span + 1) * cs,
                :,
                (cz + span) * cs : (cz + span + 1) * cs,
            ] = chunk
    origin = (-span * cs, 0, -span * cs)
    return grid, origin


def main():
    import jax

    # persistent compile cache: repeated benchmark runs skip the multi-minute
    # XLA compile of the full wavefront program
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from wavefront_tpu.core.camera import SphericalCamera
    from wavefront_tpu.core.config import (
        RenderSettings,
        RenderingPreferences,
        WorldSettings,
    )
    from wavefront_tpu.render.renderer import Renderer
    from wavefront_tpu.render.scene import VoxelScene
    from wavefront_tpu.world.blocks import BlockRegistry

    assets = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")
    registry = BlockRegistry.load(assets)
    world = WorldSettings()
    grid, origin = build_scene(registry, world)

    scene = VoxelScene(registry, grid, origin, max_light_prims=1024)

    width, height, bounces = 1920, 1080, 4
    # 128 steps bounds the worst-case straggler; the distance-field skips
    # cover the 160-voxel-wide window in far fewer iterations
    settings = RenderSettings(
        width=width, height=height, num_bounces=bounces, max_trace_steps=128
    )
    renderer = Renderer(settings)

    cam = SphericalCamera()
    cam.set_root_position([0.0, 12.0, 0.0])
    cam.offset = 28.0
    cam.yaw = 0.6
    cam.pitch = -0.35
    basis = cam.eye_front_right_up()
    prefs = RenderingPreferences(nee_type=1)

    # warmup / compile, with retries against transient TPU-service outages
    last_err = None
    for attempt in range(4):
        try:
            img = renderer.render(scene, basis, prefs, frame_count=0)
            break
        except Exception as e:  # jax.errors.JaxRuntimeError: UNAVAILABLE ...
            last_err = e
            print(f"warmup attempt {attempt} failed: {e}", file=sys.stderr)
            time.sleep(90)
    else:
        raise last_err
    assert np.all(np.isfinite(img)), "benchmark produced NaNs"

    frames = 5
    t0 = time.perf_counter()
    for f in range(1, frames + 1):
        out = renderer.render(scene, basis, prefs, frame_count=f, as_numpy=False)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / frames

    rays = width * height * bounces
    mrays = rays / dt / 1e6
    baseline_mrays = 1000.0  # BASELINE.json north star: 1 Grays/s/chip
    print(
        json.dumps(
            {
                "metric": "Mrays_per_sec",
                "value": round(mrays, 2),
                "unit": "Mray/s",
                "vs_baseline": round(mrays / baseline_mrays, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
