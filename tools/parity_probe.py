"""One-stop TPU parity probe: renders the config-1 golden scene on the
real TPU under selectable program arms and bit-compares images, packed
primary hits, and tracer fields.  Replaces the round-4 one-off bisection
harnesses (parity_bisect{,2,3}.py, arm_probe.py, trace_probe.py), whose
findings it encodes:

  * texel Pallas kernel is bit-exact standalone AND on the exact in-frame
    bounce-0 inputs.
  * windowed tracer vs exhaustive DDA, both Mosaic-compiled: hit/face/t/
    owner/entered EXACT on the config-1 primary fan (the only per-lane
    diffs are the -2 voxel sentinels on miss lanes, which no consumer
    reads).  Reference guarantee matched: exact hardware traversal,
    raytrace.rs:366-400.
  * the config-1 hardware-golden divergence (1312 px, max 0.51) is NOT in
    NEE (identical with nee_type=0), NOT arm-specific (every TPU arm
    bit-identical), and sits on the LAMP-face pixels (CPU radiance
    400-660, so the diffs are ~1e-3 RELATIVE — the magnitude of one
    secondary-bounce contribution); hunt state in docs/PERF.md round 4.

Subcommands:
  arms     render {xla shade, fused shade} x {texel kernel, gather} and
           compare vs the stored golden and pairwise
  trace    window_trace vs dda_trace field-level compare on the primary fan
  cache    cache_primary=True frames 0/1 vs the uncached frame (must be
           bit-identical; golden tests pin this on CPU, this pins Mosaic)
  split    TPU-vs-CPU same-program image compare, nee on/off (subprocesses)
  nee      TPU-vs-CPU bit-compare of dense-NEE sampling intermediates
  scatter  TPU-vs-CPU bit-compare of bounce-0 scatter outputs + segment-2
           trace fields

Run (needs the TPU tunnel, one TPU user at a time):
  python tools/parity_probe.py arms|trace|cache|split|nee|scatter
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup():
    import jax

    # split's subprocesses pick their backend via JAX_PLATFORMS; default
    # to the TPU tunnel otherwise
    jax.config.update(
        "jax_platforms", os.environ.get("JAX_PLATFORMS", "axon,cpu")
    )
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache")
    )
    return jax


def _scene():
    """The deterministic golden scene (tests/test_golden.py::make_grid)."""
    from wavefront_tpu.core.camera import SphericalCamera
    from wavefront_tpu.core.config import (
        RenderSettings, RenderingPreferences,
    )
    from wavefront_tpu.render.scene import VoxelScene
    from wavefront_tpu.world.blocks import BlockRegistry

    registry = BlockRegistry.load(os.path.join(ROOT, "assets"))
    blob = np.load(os.path.join(ROOT, "tests", "golden", "config1_256.npz"))
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
    scene = VoxelScene(registry, grid, (0, 0, 0), max_light_prims=256)
    settings = RenderSettings(
        width=w, height=h, num_bounces=bounces, max_trace_steps=96
    )
    prefs = RenderingPreferences(nee_type=nee_type)
    return (scene, settings, cam.eye_front_right_up(), prefs, gold, frame)


def _cmp(tag, a, b):
    a, b = np.asarray(a), np.asarray(b)
    diff = np.abs(a - b).max(axis=-1)
    # relative for bright pixels (HDR radiance; see tpu_parity._compare)
    scale = np.maximum(1.0, np.abs(b).max(axis=-1))
    rec = {
        "check": tag,
        "divergent": int((diff >= 1e-3 * scale).sum()),
        "max_abs": float(diff.max()),
        "max_rel": float((diff / scale).max()),
    }
    print(json.dumps(rec), flush=True)
    return rec


def cmd_arms():
    import dataclasses

    from wavefront_tpu.render.renderer import Renderer

    scene, settings, basis, prefs, gold, frame = _scene()

    def render(**kw):
        r = Renderer(dataclasses.replace(settings, **kw))
        return np.asarray(r.render(scene, basis, prefs, frame_count=frame))

    arms = {
        "xla+texel": render(shade_fused=False),
        "xla+gather": render(shade_fused=False, shade_texel_kernel=False),
        "fused": render(shade_fused=True),
    }
    for name, img in arms.items():
        _cmp(f"{name} vs_golden", img, gold)
    _cmp("xla+texel vs xla+gather", arms["xla+texel"], arms["xla+gather"])
    _cmp("fused vs xla+texel", arms["fused"], arms["xla+texel"])


def cmd_trace():
    from wavefront_tpu.kernels.window_trace import window_trace
    from wavefront_tpu.render.intersect import dda_trace
    from wavefront_tpu.render.wavefront import raygen_soa

    scene, settings, basis, prefs, gold, frame = _scene()
    arr = scene.get_arrays()
    o, d, rid = raygen_soa(
        np.asarray(basis.eye, np.float32),
        np.asarray(basis.front, np.float32),
        np.asarray(basis.right, np.float32),
        np.asarray(basis.up, np.float32),
        settings.width, settings.height,
    )
    win = window_trace(
        arr.winpack, arr.grid_origin, o, d, max_events=384, presort=True
    )
    dda = dda_trace(
        arr.grid, arr.grid_origin, arr.transparent, arr.translucent, 255,
        o.stack(), d.stack(), max_steps=512, aux_grid=arr.aux_grid,
    )
    out = {}
    both_hit = np.asarray(win.hit) & np.asarray(dda.hit)
    for f in ("hit", "face", "owner", "entered"):
        a, b = np.asarray(getattr(win, f)), np.asarray(getattr(dda, f))
        out[f] = int((a != b).sum())
    # voxel coords only mean anything on hit lanes (miss sentinels differ
    # by convention: -2 in the kernel, 0 in the DDA; no consumer reads
    # them — shade masks on hit)
    for f in ("vx", "vy", "vz"):
        a, b = np.asarray(getattr(win, f)), np.asarray(getattr(dda, f))
        out[f + "_hitlanes"] = int(((a != b) & both_hit).sum())
    tw, td = np.asarray(win.t), np.asarray(dda.t)
    out["t_maxdiff_bothhit"] = float(
        np.abs(tw - td)[both_hit].max() if both_hit.any() else 0.0
    )
    out["n"] = int(tw.shape[0])
    print(json.dumps(out), flush=True)


def cmd_cache():
    import dataclasses

    from wavefront_tpu.render.renderer import Renderer

    scene, settings, basis, prefs, gold, frame = _scene()
    base = Renderer(settings)
    plain0 = np.asarray(base.render(scene, basis, prefs, frame_count=0))
    plain1 = np.asarray(base.render(scene, basis, prefs, frame_count=1))
    rc = Renderer(dataclasses.replace(settings, cache_primary=True))
    c0 = np.asarray(rc.render(scene, basis, prefs, frame_count=0))
    c1 = np.asarray(rc.render(scene, basis, prefs, frame_count=1))
    _cmp("cache frame0 vs plain frame0", c0, plain0)
    _cmp("cache frame1(cached) vs plain frame1", c1, plain1)


def cmd_render():
    """Internal: render config-1 on THIS process's backend and save the
    image (split runs it under JAX_PLATFORMS=cpu and under axon)."""
    import dataclasses

    from wavefront_tpu.render.renderer import Renderer

    out = sys.argv[sys.argv.index("--out") + 1]
    nee = int(sys.argv[sys.argv.index("--nee") + 1]) \
        if "--nee" in sys.argv else None
    scene, settings, basis, prefs = _scene()[:4]
    if nee is not None:
        prefs = dataclasses.replace(prefs, nee_type=nee)
    img = Renderer(settings).render(scene, basis, prefs, frame_count=0)
    np.save(out, np.asarray(img))


def cmd_split():
    """Split the config-1 divergence along its two axes: renderer-vs-
    oracle (CPU render vs stored golden) and TPU-vs-CPU (same program,
    Mosaic vs interpret), for nee on and off."""
    import subprocess

    gold = _scene()[4]
    me = os.path.abspath(__file__)

    def render(platform, nee, out):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = platform
        subprocess.run(
            [sys.executable, me, "_render", "--out", out, "--nee",
             str(nee)],
            check=True, env=env, cwd=ROOT,
        )
        return np.load(out)

    for nee in (1, 0):
        cpu = render("cpu", nee, f"/tmp/cfg1_cpu_nee{nee}.npy")
        tpu = render("axon,cpu", nee, f"/tmp/cfg1_tpu_nee{nee}.npy")
        if nee == 1:
            _cmp("nee1 cpu vs golden", cpu, gold)
            _cmp("nee1 tpu vs golden", tpu, gold)
        _cmp(f"nee{nee} tpu vs cpu", tpu, cpu)


def cmd_nee_dump():
    """Internal: run the dense-NEE sampling machinery on a synthetic
    but frame-realistic input set (grass-top shading points of the
    config-1 scene, arange seeds) and dump every intermediate array."""
    import jax.numpy as jnp

    from wavefront_tpu.core.vec3 import V3
    from wavefront_tpu.render.wavefront import (
        dense_node_importance, dense_prim_importance, dense_prim_probs,
        dense_sample_light, EPSILON_BLOCK,
    )

    out = sys.argv[sys.argv.index("--out") + 1]
    scene = _scene()[0]
    lights = scene.get_arrays().lights
    # grass-top points (y = 5.0 exactly, the divergent class) + jittered
    # heights, normals up
    n_side = 96
    xs, zs = np.meshgrid(
        np.linspace(0.25, 15.75, n_side, dtype=np.float32),
        np.linspace(0.25, 15.75, n_side, dtype=np.float32),
    )
    pts = np.stack([xs.ravel(), np.full(n_side * n_side, 5.0, np.float32),
                    zs.ravel()], 1)
    point = V3(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
               jnp.asarray(pts[:, 2]))
    normal = V3(jnp.zeros(len(pts)), jnp.ones(len(pts)),
                jnp.zeros(len(pts)))
    seed = jnp.arange(len(pts), dtype=jnp.uint32) * jnp.uint32(2654435761)
    active = jnp.ones(len(pts), bool)

    import jax

    @jax.jit
    def run(point, normal, seed, active):
        nimp = dense_node_importance(lights, point, normal, EPSILON_BLOCK)
        pimp = dense_prim_importance(lights, point, normal, EPSILON_BLOCK)
        probs = dense_prim_probs(lights, point, normal)
        samp, _ = dense_sample_light(lights, point, normal, seed, active)
        return dict(nimp=nimp, pimp=pimp, probs=probs,
                    prim=samp.prim, prob=samp.probability,
                    importance=samp.importance,
                    success=samp.success)

    res = {k: np.asarray(v) for k, v in run(
        point, normal, seed, active).items()}
    np.savez(out, **res)


def cmd_nee():
    """Bit-compare the dense-NEE sampling intermediates TPU vs CPU on
    identical inputs (the discrete-flip hunt)."""
    import subprocess

    me = os.path.abspath(__file__)

    def run(platform, out):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = platform
        subprocess.run([sys.executable, me, "_nee_dump", "--out", out],
                       check=True, env=env, cwd=ROOT)
        return np.load(out)

    cpu = run("cpu", "/tmp/nee_cpu.npz")
    tpu = run("axon,cpu", "/tmp/nee_tpu.npz")
    for k in cpu.files:
        a, b = cpu[k], tpu[k]
        neq = (a != b)
        rec = {"field": k, "mismatch": int(neq.sum()),
               "of": int(a.size)}
        if neq.any() and a.dtype.kind == "f":
            rec["max_abs"] = float(np.abs(a - b).max())
        print(json.dumps(rec), flush=True)


def cmd_scatter_dump():
    """Internal: bounce-0 shade outputs (scatter origin/direction) plus
    the segment-2 trace fields, dumped for a platform bit-compare."""
    import jax
    import jax.numpy as jnp

    from wavefront_tpu.render.renderer import _shade
    from wavefront_tpu.render.wavefront import raygen_soa
    from wavefront_tpu.core.rng import murmur3_combine

    out = sys.argv[sys.argv.index("--out") + 1]
    scene, settings, basis, prefs, gold, frame = _scene()
    arr = scene.get_arrays()
    o, d, rid = raygen_soa(
        np.asarray(basis.eye, np.float32),
        np.asarray(basis.front, np.float32),
        np.asarray(basis.right, np.float32),
        np.asarray(basis.up, np.float32),
        settings.width, settings.height,
    )

    @jax.jit
    def run(o, d, rid):
        seed = murmur3_combine(jnp.uint32(0), rid)
        (no, nd, normal, emis, refl, mis, bpdf, dp, hits,
         tc) = _shade(
            arr, settings, prefs.nee_type, jnp.int32(0), o, d, seed,
            use_entities=False,
        )
        vox2 = hits[0]
        from wavefront_tpu.kernels.window_trace import window_trace
        v2 = window_trace(
            arr.winpack, arr.grid_origin, no, nd, max_events=384,
            presort=True,
            interpret=jax.default_backend() != "tpu",
        )
        # replicate the renderer's face-local uv / texel-index derivation
        # (renderer.py ~315-358) on THIS platform's hit fields
        hp = o + d * vox2.t
        f = vox2.face
        go = arr.grid_origin
        lx = hp.x - (vox2.vx + go[0]).astype(jnp.float32)
        ly = hp.y - (vox2.vy + go[1]).astype(jnp.float32)
        lz = hp.z - (vox2.vz + go[2]).astype(jnp.float32)
        uu = jnp.where(
            f == 0, 1.0 - lz,
            jnp.where(f == 1, lz,
                      jnp.where(f == 2, lx,
                                jnp.where(f == 3, 1.0 - lx,
                                          jnp.where(f == 4, lx,
                                                    1.0 - lx)))))
        vv = jnp.where(f == 2, lz, jnp.where(f == 3, lz, 1.0 - ly))
        size = arr.atlas.shape[-2]
        ti = jnp.clip((uu * size).astype(jnp.int32), 0, size - 1)
        tj = jnp.clip((vv * size).astype(jnp.int32), 0, size - 1)
        tex = jnp.clip(vox2.owner * 6 + f, 0, arr.atlas.shape[0] - 1)
        return dict(
            nox=no.x, noy=no.y, noz=no.z,
            ndx=nd.x, ndy=nd.y, ndz=nd.z,
            emis=emis.x, emis_g=emis.y, emis_b=emis.z, refl=refl.x,
            h1_vx=vox2.vx, h1_vy=vox2.vy, h1_vz=vox2.vz,
            h1_face=vox2.face, h1_t=vox2.t, h1_owner=vox2.owner,
            uv_u=uu, uv_v=vv, uv_ti=ti, uv_tj=tj, uv_tex=tex,
            h2_hit=v2.hit, h2_face=v2.face, h2_owner=v2.owner,
            h2_vx=v2.vx, h2_vy=v2.vy, h2_vz=v2.vz, h2_t=v2.t,
        )

    res = {k: np.asarray(v) for k, v in run(o, d, rid).items()}
    np.savez(out, **res)


def cmd_scatter():
    """Bit-compare bounce-0 scatter outputs + segment-2 trace fields
    TPU vs CPU (the config-1 divergence hunt, stage 2)."""
    import subprocess

    me = os.path.abspath(__file__)

    def run(platform, out):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = platform
        subprocess.run([sys.executable, me, "_scatter_dump", "--out", out],
                       check=True, env=env, cwd=ROOT)
        return np.load(out)

    cpu = run("cpu", "/tmp/scatter_cpu.npz")
    tpu = run("axon,cpu", "/tmp/scatter_tpu.npz")
    for k in cpu.files:
        a, b = cpu[k], tpu[k]
        neq = a != b
        rec = {"field": k, "mismatch": int(neq.sum()), "of": int(a.size)}
        if neq.any():
            idx = np.nonzero(neq)[0][:4]
            rec["examples"] = [
                [int(i), float(a[i]), float(b[i])] for i in idx
            ]
        print(json.dumps(rec), flush=True)


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "arms"
    if cmd in ("split", "nee", "scatter"):  # subprocess orchestrators
        {"split": cmd_split, "nee": cmd_nee,
         "scatter": cmd_scatter}[cmd]()
        return
    _setup()
    {"arms": cmd_arms, "trace": cmd_trace, "cache": cmd_cache,
     "_render": cmd_render, "_nee_dump": cmd_nee_dump,
     "_scatter_dump": cmd_scatter_dump}[cmd]()


if __name__ == "__main__":
    main()
