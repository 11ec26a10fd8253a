"""One-stop TPU measurement queue: run everything worth measuring in one
serialized session the moment the TPU tunnel is up (it has multi-hour
outages; only ONE process may touch the TPU).

Stages (each prints JSON lines; use --stages to select):
  gates    tools/tpu_parity.py (config-1 golden) + --bench (exhaustive
           traversal + DDA pixel compare on the headline program)
  bench    python bench.py (the headline; appends BENCH_HISTORY)
  ladder   tools/bench_ladder.py over --configs
  occ      windowed-tracer occupancy sweep over (tile, windows, phases,
           phase_events) on primary + secondary-bounce ray populations
           (tools/occupancy.py run() grid)

Run: python tools/tpu_sweep.py [--stages gates bench ladder] [--configs ...]
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(timeout=90) -> bool:
    """True iff the TPU answers a tiny matmul within `timeout` seconds."""
    code = (
        "import jax; jax.config.update('jax_platforms','axon');"
        "import jax.numpy as jnp; x=jnp.ones((128,128));"
        "print(float((x@x).sum()))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout,
            capture_output=True, text=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def run(cmd, timeout):
    print(f"=== {' '.join(cmd)}", flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, timeout=timeout)
    print(f"=== exit {r.returncode} in {time.time() - t0:.0f}s", flush=True)
    return r.returncode


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", nargs="+",
                   default=["gates", "bench", "ladder"])
    p.add_argument("--configs", type=int, nargs="+",
                   default=[1, 2, 3, 4, 5, 6, 7, 8])
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--wait", action="store_true",
                   help="poll the probe until the TPU answers")
    args = p.parse_args()

    while not probe():
        if not args.wait:
            print("TPU unavailable (probe timed out)", flush=True)
            sys.exit(2)
        print("TPU down; retrying in 120s", flush=True)
        time.sleep(120)
    print("TPU up", flush=True)

    py = sys.executable
    if "gates" in args.stages:
        run([py, "tools/tpu_parity.py"], timeout=1200)
        run([py, "tools/tpu_parity.py", "--bench"], timeout=3600)
    if "bench" in args.stages:
        run([py, "bench.py"], timeout=3600)
    if "ladder" in args.stages:
        run(
            [py, "tools/bench_ladder.py", "--configs",
             *map(str, args.configs), "--frames", str(args.frames)],
            timeout=4 * 3600,
        )
    if "occ" in args.stages:
        run([py, "tools/occupancy.py"], timeout=3600)


if __name__ == "__main__":
    main()
