"""One-session A/B of the fused Pallas shade vs the XLA shade chain at the
headline config (Phase B 'Done' check, VERDICT r4 #1).

Run: python tools/fused_ab.py [--frames 3] [--width 1920 --height 1080]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--bounces", type=int, default=4)
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    from bench import headline_setup
    from tools.stage_table import time_frames
    from wavefront_tpu.render.renderer import Renderer

    scene, settings, basis, prefs = headline_setup(
        args.width, args.height, args.bounces
    )
    for name, s in (
        ("fused", dataclasses.replace(settings, shade_fused=True)),
        ("xla", dataclasses.replace(settings, shade_fused=False)),
    ):
        dt = time_frames(Renderer(s), scene, basis, prefs, args.frames)
        print(json.dumps({"row": name, "frame_ms": round(dt * 1000, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
