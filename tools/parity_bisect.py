"""Bisect the config-1 TPU parity failure (2026-08-20): which stage
diverges on REAL hardware (the CPU suite is green in interpret mode)?

Checks, in one TPU process:
  1. texel kernel bit-exactness on the REAL MXU (the tests only ran
     interpret mode).
  2. config-1 frame: texel kernel ON vs OFF (XLA gather) — isolates the
     texel stage inside the production program.
  3. config-1 frame (gather arm) vs the stored oracle golden — isolates
     the windowed tracer / event-diet changes.
  4. window_trace vs dda_trace on the config-1 grid over a dense ray fan,
     both compiled on TPU.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "axon,cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import dataclasses

    import jax.numpy as jnp

    from wavefront_tpu.core.camera import SphericalCamera
    from wavefront_tpu.core.config import RenderSettings, RenderingPreferences
    from wavefront_tpu.kernels.texel import texel_fetch
    from wavefront_tpu.render.renderer import Renderer
    from wavefront_tpu.render.scene import VoxelScene
    from wavefront_tpu.world.blocks import BlockRegistry

    # ---- 1. texel bit-exactness on hardware ----
    rng = np.random.default_rng(0)
    S, size, nch = 42, 16, 12
    atlas = rng.random((S, size, size, nch), np.float32)
    n = 50000
    tex = rng.integers(-2, S + 2, n, dtype=np.int32)
    u = rng.random(n, dtype=np.float32) * 1.2 - 0.1
    v = rng.random(n, dtype=np.float32) * 1.2 - 0.1
    chans = (0, 1, 2, 3, 4, 5, 6, 8)
    got = np.asarray(texel_fetch(
        jnp.asarray(atlas), jnp.asarray(tex), jnp.asarray(u),
        jnp.asarray(v), channels=chans))
    ti = np.clip((u * size).astype(np.int32), 0, size - 1)
    tj = np.clip((v * size).astype(np.int32), 0, size - 1)
    tc = np.clip(tex, 0, S - 1)
    want = atlas[tc, tj, ti][:, list(chans)].T
    print(json.dumps({
        "check": "texel_hw_bitexact",
        "mismatches": int((got != want).sum()),
        "max_abs": float(np.abs(got - want).max()),
    }), flush=True)

    # ---- config-1 scene ----
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    registry = BlockRegistry.load(os.path.join(root, "assets"))
    blob = np.load(os.path.join(root, "tests", "golden", "config1_256.npz"))
    gold = blob["image"]
    w, h, bounces, nee_type, frame = (int(x) for x in blob["meta"])
    air = registry.air
    grid = np.full((16, 16, 16), air, np.uint8)
    grid[:, :4, :] = registry.block_idx("stone")
    grid[:, 4, :] = registry.block_idx("grass")
    grid[6:9, 5:8, 6:9] = registry.block_idx("lamp")
    grid[2, 5:7, 3] = registry.block_idx("mirror")
    grid[12, 5:7, 12] = registry.block_idx("glass")
    cam = SphericalCamera()
    cam.set_root_position([8.0, 8.0, 8.0])
    cam.offset = 14.0
    cam.yaw = 0.7
    cam.pitch = -0.45
    basis = cam.eye_front_right_up()
    prefs = RenderingPreferences(nee_type=nee_type)
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=256)

    settings = RenderSettings(
        width=w, height=h, num_bounces=bounces, max_trace_steps=96
    )

    def frame_with(**kw):
        s = dataclasses.replace(settings, **kw)
        return np.asarray(Renderer(s).render(
            scene, basis, prefs, frame_count=frame))

    img_kernel = frame_with()                       # texel kernel (default)
    img_gather = frame_with(shade_texel_kernel=False)

    def cmp(a, b):
        diff = np.abs(a - b).max(axis=-1)
        agree = diff < 1e-3
        return {
            "divergent": int((~agree).sum()),
            "max_abs": float(diff.max()),
        }

    print(json.dumps({"check": "c1 kernel_vs_gather",
                      **cmp(img_kernel, img_gather)}), flush=True)
    print(json.dumps({"check": "c1 gather_vs_golden",
                      **cmp(img_gather, gold)}), flush=True)
    print(json.dumps({"check": "c1 kernel_vs_golden",
                      **cmp(img_kernel, gold)}), flush=True)

    # ---- 4. tracer vs DDA on hardware ----
    from wavefront_tpu.kernels.window_trace import window_trace
    from wavefront_tpu.render.intersect import dda_trace

    m = 40000
    rng = np.random.default_rng(1)
    o = (rng.random((m, 3)) * 22 - 3).astype(np.float32)
    d = rng.standard_normal((m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ref = dda_trace(
        jnp.asarray(scene.grid), scene.transparent, scene.translucent,
        registry.air, jnp.asarray(o), jnp.asarray(d), max_steps=96,
        aux_grid=scene.aux_grid,
    )
    got_hit = window_trace(
        scene.winpack, scene.transparent, scene.translucent, registry.air,
        jnp.asarray(o), jnp.asarray(d),
    )
    fields = {}
    for f in ("hit", "t", "owner", "face", "vx", "vy", "vz"):
        a = np.asarray(getattr(ref, f))
        b = np.asarray(getattr(got_hit, f))
        bad = (np.abs(a.astype(np.float64) - b.astype(np.float64)) > 2e-4)
        fields[f] = int(bad.sum())
    print(json.dumps({"check": "window_trace_vs_dda_hw", **fields}),
          flush=True)


if __name__ == "__main__":
    main()
