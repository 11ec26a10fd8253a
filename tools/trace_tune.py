"""Frame-level trace-parameter sweep on the real TPU headline program.

Times WHOLE headline frames (bench.headline_setup) over a grid of
windowed-tracer parameters — the numbers that matter are frame times,
not standalone kernel times (tile homogeneity depends on the real
presorted bounce populations).  Prints one JSON line per combo; run the
winner back through bench.py + tools/tpu_parity.py --bench.

Run: python tools/trace_tune.py [--frames 2]
     [--tiles 1024 2048] [--windows 1 2 4] [--phases 1 2 3]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=2)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--tiles", type=int, nargs="+", default=[1024, 2048])
    p.add_argument("--windows", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--windows-hot", type=int, nargs="+", default=[0],
                   help="resident windows for the SCHEDULED bounces "
                        "only (0 = same as --windows)")
    p.add_argument("--phases", type=int, nargs="+", default=[1, 2])
    p.add_argument("--phase-events", type=int, nargs="+", default=[64])
    p.add_argument("--phases-at", type=int, nargs="*", default=None,
                   help="bounce indices that trace phased (all others "
                        "single-shot); omit for legacy all-bounce phasing")
    p.add_argument("--unroll", type=int, nargs="+", default=[1])
    p.add_argument("--skip-strides", type=int, nargs="+", default=[1],
                   help="lean/full event alternation over unrolled copies "
                        "(trace_skip_stride); only meaningful with "
                        "unroll > 1")
    p.add_argument("--skips", type=int, nargs="+", default=[1])
    p.add_argument("--wskips", type=int, nargs="+", default=[1])
    p.add_argument("--shade-bf16", type=int, nargs="+", default=[0])
    p.add_argument("--compaction", type=int, nargs="+", default=[0, 1],
                   help="0 = internal presort; 1 = compaction + hoisted "
                        "bounce-sort presort (one sort network per bounce)")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    from bench import headline_setup
    from wavefront_tpu.render.renderer import Renderer

    scene, settings, basis, prefs = headline_setup(
        args.width, args.height, 4
    )

    best = (None, 1e30)
    for comp in args.compaction:
      for tile in args.tiles:
       for un in args.unroll:
        for ss in args.skip_strides:
         for sk in args.skips:
          for wsk in args.wskips:
           for sb in args.shade_bf16:
            for win in args.windows:
             for ph in args.phases:
               for wh in args.windows_hot:
                for pe in args.phase_events if ph > 1 else [64]:
                    s = dataclasses.replace(
                        settings, trace_tile=tile, trace_windows=win,
                        trace_windows_hot=wh,
                        trace_phases=ph, trace_phase_events=pe,
                        compaction=bool(comp), trace_unroll=un,
                        trace_skip_stride=ss,
                        trace_skips=bool(sk), trace_wskip=bool(wsk),
                        shade_bf16=bool(sb),
                        trace_phases_at=(
                            tuple(args.phases_at)
                            if args.phases_at and ph > 1 else ()
                        ),
                    )
                    r = Renderer(s)
                    img, aux = r.render(
                        scene, basis, prefs, frame_count=0, with_aux=True
                    )
                    if not np.all(np.isfinite(img)):
                        print(json.dumps({"tile": tile, "windows": win,
                                          "phases": ph, "error": "nonfinite"}))
                        continue
                    t0 = time.perf_counter()
                    for f in range(1, args.frames + 1):
                        out, aux = r.render(
                            scene, basis, prefs, frame_count=f,
                            as_numpy=False, with_aux=True,
                        )
                    trunc = int(aux["truncated"])
                    dt = (time.perf_counter() - t0) / args.frames
                    rec = {
                        "tile": tile, "windows": win, "windows_hot": wh,
                        "phases": ph,
                        "phases_at": args.phases_at if ph > 1 else None,
                        "phase_events": pe, "compaction": comp,
                        "unroll": un, "skip_stride": ss,
                        "skips": sk, "wskips": wsk,
                        "shade_bf16": sb,
                        "frame_ms": round(dt * 1000, 1),
                        "truncated": trunc,
                    }
                    print(json.dumps(rec), flush=True)
                    if trunc == 0 and dt < best[1]:
                        best = (rec, dt)
    if best[0]:
        print(json.dumps({"best": best[0]}))


if __name__ == "__main__":
    main()
