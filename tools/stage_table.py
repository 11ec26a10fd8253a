"""Frame stage-cost table on the real TPU (VERDICT r1 #4 'Done' check).

Differential timing on the headline scene: each row renders the headline
program with one stage varied, so stage costs come out as deltas of
whole-frame times (the tunneled platform cannot time kernels in
isolation; docs/PERF.md timing-honesty notes).

Rows:
  full          headline as benched (b4, nee=1, presort, compaction)
  nee0          nee_type=0            -> delta = NEE sampling + pdf sweep
  b1            num_bounces=1         -> marginal bounce cost
  b2            num_bounces=2
  nosort        presort+compaction off -> sort/compaction cost
  dda           use_column_trace=False (512-step exhaustive DDA reference)

Run: python tools/stage_table.py [--frames 3] [--width 1920 --height 1080]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_frames(renderer, scene, basis, prefs, frames):
    import jax.numpy as jnp

    img = renderer.render(scene, basis, prefs, frame_count=0)
    assert np.all(np.isfinite(img))
    # settle run: the first timed frame after a compile was measured ~2x
    # slow (platform warmup); force it outside the timing window
    out = renderer.render(scene, basis, prefs, frame_count=0,
                          as_numpy=False)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    acc = None
    for f in range(1, frames + 1):
        out = renderer.render(scene, basis, prefs, frame_count=f,
                              as_numpy=False)
        acc = out if acc is None else acc + out
    # force EVERY frame through a scalar readback (block_until_ready lies
    # on the tunneled platform; bench.py timing-honesty notes)
    float(jnp.sum(acc))
    return (time.perf_counter() - t0) / frames


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--rows", nargs="+",
                   default=["full", "nee0", "b1", "b2", "nosort",
                            "freetrace", "notex", "nonee_pdf"])
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    from bench import headline_setup
    from wavefront_tpu.core.config import RenderingPreferences
    from wavefront_tpu.render.renderer import Renderer

    scene, settings, basis, prefs = headline_setup(
        args.width, args.height, 4
    )

    variants = {
        "full": (settings, prefs),
        # non-trace itemization (VERDICT r3 #2): timing-only variants
        "freetrace": (
            dataclasses.replace(settings, debug_stage="freetrace"), prefs),
        "notex": (
            dataclasses.replace(settings, debug_stage="notex"), prefs),
        # texel A/B: the XLA gather vs the Pallas kernel (same session)
        "gtex": (
            dataclasses.replace(settings, shade_texel_kernel=False), prefs),
        "nonee_pdf": (
            dataclasses.replace(settings, debug_stage="nonee_pdf"), prefs),
        "nee0": (settings, RenderingPreferences(nee_type=0)),
        "b1": (dataclasses.replace(settings, num_bounces=1), prefs),
        "b2": (dataclasses.replace(settings, num_bounces=2), prefs),
        "nosort": (
            dataclasses.replace(settings, trace_presort=False,
                                compaction=False),
            prefs,
        ),
        "dda": (
            dataclasses.replace(settings, use_column_trace=False,
                                max_trace_steps=512, trace_audit=False),
            prefs,
        ),
    }
    out = {}
    for name in args.rows:
        s, pr = variants[name]
        dt = time_frames(Renderer(s), scene, basis, pr, args.frames)
        out[name] = round(dt * 1000, 1)
        print(json.dumps({"row": name, "frame_ms": out[name]}), flush=True)
    if "full" in out and "nee0" in out:
        print(json.dumps({"derived": "nee_cost_ms",
                          "value": round(out["full"] - out["nee0"], 1)}))
    if "b1" in out and "b2" in out:
        print(json.dumps({"derived": "bounce_marginal_ms",
                          "value": round(out["b2"] - out["b1"], 1)}))
    if "freetrace" in out:
        print(json.dumps({"derived": "non_trace_floor_ms_upper",
                          "value": out["freetrace"]}))
    if "full" in out and "notex" in out:
        print(json.dumps({"derived": "texel_gather_ms",
                          "value": round(out["full"] - out["notex"], 1)}))
    if "full" in out and "nonee_pdf" in out:
        print(json.dumps({"derived": "nee_pdf_sweep_ms",
                          "value": round(out["full"] - out["nonee_pdf"],
                                         1)}))


if __name__ == "__main__":
    main()
