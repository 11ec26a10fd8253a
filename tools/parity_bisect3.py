"""Stage-3 bisect: bisect2 proved the texel kernel agrees with the XLA
gather on the EXACT bounce-0 inputs (all 65536 lanes, incl. 3e38-uv miss
lanes), yet the in-frame arms diverge on 1312 HIT lanes (grass top,
tex=15, near-constant ~0.317 diff, mid-texel uv).  So the two in-frame
programs must disagree about the INPUTS (ray order / trace results /
uv), not the fetch.  Isolate which program feature carries it:

  arm pairs (kernel vs gather), each feature set:
    A. defaults             (presort inside tracer; no bounce sort)
    B. trace_presort=False  (pixel order END TO END)
    C. audit on             (read truncated counts per arm)
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

    from wavefront_tpu.core.camera import SphericalCamera
    from wavefront_tpu.core.config import RenderSettings, RenderingPreferences
    from wavefront_tpu.render.renderer import Renderer
    from wavefront_tpu.render.scene import VoxelScene
    from wavefront_tpu.world.blocks import BlockRegistry

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
        r = Renderer(s)
        img, aux = r.render(scene, basis, prefs, frame_count=frame,
                            with_aux=True)
        extra = {}
        for k in ("truncated", "nee_overflow"):
            if k in aux:
                extra[k] = int(np.asarray(aux[k]))
        return np.asarray(img), extra

    def cmp(tag, a, b):
        diff = np.abs(a - b).max(axis=-1)
        print(json.dumps({
            "check": tag,
            "divergent": int((diff >= 1e-3).sum()),
            "max_abs": float(diff.max()),
        }), flush=True)

    # A. defaults
    ka, _ = frame_with()
    ga, _ = frame_with(shade_texel_kernel=False)
    cmp("A default kernel_vs_gather", ka, ga)
    cmp("A gather_vs_golden", ga, gold)

    # B. pixel order end to end
    kb, _ = frame_with(trace_presort=False)
    gb, _ = frame_with(trace_presort=False, shade_texel_kernel=False)
    cmp("B nopresort kernel_vs_gather", kb, gb)
    cmp("B nopresort gather_vs_golden", gb, gold)
    cmp("B kernel: nopresort_vs_presort", kb, ka)
    cmp("B gather: nopresort_vs_presort", gb, ga)

    # C. audit counts per arm
    kc, ax_k = frame_with(trace_audit=True)
    gc, ax_g = frame_with(trace_audit=True, shade_texel_kernel=False)
    print(json.dumps({"check": "C audit",
                      "kernel": ax_k, "gather": ax_g}), flush=True)
    cmp("C kernel audit_vs_default", kc, ka)


if __name__ == "__main__":
    main()
