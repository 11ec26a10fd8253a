"""Sweep inter-bounce sort schedules at the headline config (VERDICT r4
item 1: kill/slim the per-bounce 14-operand sort — measure the coherence
decay instead of assuming it).

Each row renders the headline with sort_bounces=<schedule>; None is the
legacy every-bounce sort.  Images are bit-identical across schedules
(tests/test_golden.py::test_sort_schedule_matches_full_sort) so frame time
is the only output.

Run: python tools/sort_sweep.py [--frames 3]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEDULES = [
    ("all", None),
    ("b1-b2", (1, 2)),
    ("b1-b3", (1, 3)),
    ("b1", (1,)),
    ("none", ()),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--rows", nargs="+", default=None,
                   choices=[n for n, _ in SCHEDULES],
                   help="subset of schedule names to run (compile time "
                        "is the scarce resource on cold caches)")
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
    rows = SCHEDULES if args.rows is None else [
        (n, s) for n, s in SCHEDULES if n in args.rows
    ]
    for name, sched in rows:
        s = dataclasses.replace(settings, sort_bounces=sched)
        dt = time_frames(Renderer(s), scene, basis, prefs, args.frames)
        print(json.dumps({"row": name, "frame_ms": round(dt * 1000, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
