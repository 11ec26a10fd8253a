"""Stage-2 bisect of the config-1 texel-kernel in-frame divergence.

parity_bisect.py established (2026-08-20, /tmp/bisect.log):
  - texel kernel bit-exact standalone on HW (0/50k mismatches)
  - gather arm == golden (tracer clean)
  - kernel arm: 1312 divergent pixels, max 0.51 — AT BOUNCES=1 (golden
    meta), i.e. primary rays; miss lanes are fully where()-masked after
    the fetch, so the leak must be hit lanes.

Two live hypotheses:
  (A) the kernel mishandles some real-input pattern the standalone
      random test missed;
  (B) u/v themselves differ between the two compiled programs (fusion /
      FMA jitter in hit_point -> lx -> u), flipping texels at texel
      boundaries; the kernel is innocent.

Decisive test: recompute bounce-0 (u, v, tex) in a THIRD fixed program
(raygen + dda_trace + the renderer's face-attr math), then
  1. run texel kernel vs XLA gather on those EXACT inputs on TPU;
  2. render both arms, find divergent pixels;
  3. cross-reference: are divergent pixels (a) lanes where step-1
     differs (-> hypothesis A: print their u/v/tex), or (b) lanes where
     step-1 agrees but u*16 sits within an ulp of an integer
     (-> hypothesis B)?
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
    from wavefront_tpu.render.intersect import dda_trace
    from wavefront_tpu.render.renderer import Renderer
    from wavefront_tpu.render.scene import VoxelScene
    from wavefront_tpu.render.wavefront import raygen_soa
    from wavefront_tpu.world.blocks import BlockRegistry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    registry = BlockRegistry.load(os.path.join(root, "assets"))
    blob = np.load(os.path.join(root, "tests", "golden", "config1_256.npz"))
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
    arrays = scene.get_arrays()
    settings = RenderSettings(
        width=w, height=h, num_bounces=bounces, max_trace_steps=96
    )

    # ---- fixed-program bounce-0 attributes ----
    @jax.jit
    def attrs():
        o, d, _ = raygen_soa(
            jnp.asarray(basis.eye, jnp.float32),
            jnp.asarray(basis.front, jnp.float32),
            jnp.asarray(basis.right, jnp.float32),
            jnp.asarray(basis.up, jnp.float32),
            w, h,
        )
        vox = dda_trace(
            arrays.grid, arrays.grid_origin, arrays.transparent,
            arrays.translucent, 255, o.stack(), d.stack(),
            max_steps=96, aux_grid=arrays.aux_grid,
        )
        t = vox.t
        hx = o.x + d.x * t
        hy = o.y + d.y * t
        hz = o.z + d.z * t
        go = arrays.grid_origin
        lx = hx - (vox.vx + go[0]).astype(jnp.float32)
        ly = hy - (vox.vy + go[1]).astype(jnp.float32)
        lz = hz - (vox.vz + go[2]).astype(jnp.float32)
        f = vox.face
        u = jnp.where(
            f == 0, 1.0 - lz,
            jnp.where(f == 1, lz,
            jnp.where(f == 2, lx,
            jnp.where(f == 3, 1.0 - lx,
            jnp.where(f == 4, lx, 1.0 - lx)))))
        v = jnp.where((f == 2) | (f == 3), lz, 1.0 - ly)
        tex = jnp.clip(vox.owner.astype(jnp.int32) * 6 + f, 0,
                       arrays.atlas_packed.shape[0] - 1)
        return u, v, tex, vox.hit, vox.owner, f, t

    u, v, tex, hit, owner, face, t = (np.asarray(x) for x in attrs())
    print(json.dumps({
        "check": "attr_ranges",
        "hit": int(hit.sum()), "n": int(hit.size),
        "u_hit": [float(u[hit].min()), float(u[hit].max())],
        "v_hit": [float(v[hit].min()), float(v[hit].max())],
        "u_miss_nonfinite": int((~np.isfinite(u[~hit])).sum()),
        "u_miss": [float(np.nanmin(u[~hit])), float(np.nanmax(u[~hit]))],
        "t_miss": [float(t[~hit].min()), float(t[~hit].max())],
    }), flush=True)

    # ---- 1. kernel vs gather on the EXACT bounce-0 inputs ----
    chans = (0, 1, 2, 3, 4, 5, 6, 8)
    ju, jv, jtex = jnp.asarray(u), jnp.asarray(v), jnp.asarray(tex)
    got = np.asarray(texel_fetch(
        arrays.atlas_packed, jtex, ju, jv,
        tile=settings.trace_tile, channels=chans))

    @jax.jit
    def gather():
        size = arrays.atlas_packed.shape[1]
        ti = jnp.clip((ju * size).astype(jnp.int32), 0, size - 1)
        tj = jnp.clip((jv * size).astype(jnp.int32), 0, size - 1)
        return arrays.atlas_packed[jtex, tj, ti][:, list(chans)].T

    want = np.asarray(gather())
    lane_bad = (got != want).any(axis=0)
    print(json.dumps({
        "check": "fixed_input_kernel_vs_gather",
        "bad_lanes": int(lane_bad.sum()),
        "bad_hit": int((lane_bad & hit).sum()),
        "bad_miss": int((lane_bad & ~hit).sum()),
    }), flush=True)
    if lane_bad.any():
        idx = np.flatnonzero(lane_bad)[:12]
        for i in idx:
            print(json.dumps({
                "lane": int(i), "hit": bool(hit[i]), "u": float(u[i]),
                "v": float(v[i]), "tex": int(tex[i]),
                "face": int(face[i]), "owner": int(owner[i]),
                "t": float(t[i]),
                "got": [float(x) for x in got[:, i]],
                "want": [float(x) for x in want[:, i]],
            }), flush=True)

    # ---- 2. in-frame arm comparison ----
    def frame_with(**kw):
        s = dataclasses.replace(settings, **kw)
        return np.asarray(Renderer(s).render(
            scene, basis, prefs, frame_count=frame))

    img_kernel = frame_with()
    img_gather = frame_with(shade_texel_kernel=False)
    diff = np.abs(img_kernel - img_gather).max(axis=-1)
    div = diff.reshape(-1) >= 1e-3
    print(json.dumps({
        "check": "inframe_divergence",
        "divergent": int(div.sum()),
        "max_abs": float(diff.max()),
    }), flush=True)

    # ---- 3. cross-reference ----
    # pixel id = y*width + x; raygen lane order is the same y*w + x
    frac_u = np.abs(u * 16 - np.round(u * 16))
    frac_v = np.abs(v * 16 - np.round(v * 16))
    near_edge = np.minimum(frac_u, frac_v)
    print(json.dumps({
        "check": "crossref",
        "div_lanes": int(div.sum()),
        "div_and_fixed_bad": int((div & lane_bad).sum()),
        "div_hit": int((div & hit).sum()),
        "div_miss": int((div & ~hit).sum()),
        "div_near_edge_1e3": int((div & (near_edge < 1e-3)).sum()),
        "div_near_edge_1e2": int((div & (near_edge < 1e-2)).sum()),
        "median_near_edge_div": float(np.median(near_edge[div]))
        if div.any() else None,
        "median_near_edge_all_hit": float(np.median(near_edge[hit])),
    }), flush=True)
    if div.any():
        idx = np.flatnonzero(div)[:12]
        for i in idx:
            print(json.dumps({
                "lane": int(i), "hit": bool(hit[i]),
                "u16": float(u[i] * 16), "v16": float(v[i] * 16),
                "tex": int(tex[i]), "face": int(face[i]),
                "owner": int(owner[i]), "t": float(t[i]),
                "diff": float(diff.reshape(-1)[i]),
            }), flush=True)


if __name__ == "__main__":
    main()
