"""A/B the extract() one-hot build forms (window_trace._OH_MODE) on the
real TPU: standalone production-kernel trace timing on the bench scene's
primary and secondary-hemisphere ray sets.  Each mode runs in a fresh
subprocess (the mode is baked at import)."""

import json
import os
import subprocess
import sys

MODES = ["cmp", "outer3d", "concat"]

INNER = r"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) if "__file__" in dir() else "/root/repo")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from tools.occupancy import ray_sets
from wavefront_tpu.kernels.window_trace import auto_events, build_window_pack, window_trace, _OH_MODE

(grid, origin, tr, tl), o, d = ray_sets()
pack = build_window_pack(grid, tr, tl)
go = jnp.asarray(origin, jnp.int32)
me = auto_events(pack)

def run(o_, d_, label):
    f = jax.jit(lambda a, b: window_trace(
        pack, go, a, b, max_events=me, tile=2048, windows=1,
        presort=True, unroll=4, skip_stride=2))
    oj, dj = jnp.asarray(o_), jnp.asarray(d_)
    hit = f(oj, dj); float(jnp.sum(hit.t))
    hit = f(oj, dj); float(jnp.sum(hit.t))
    t0 = time.perf_counter()
    for _ in range(3):
        hit = f(oj, dj)
    float(jnp.sum(hit.t))
    dt = (time.perf_counter() - t0) / 3
    print(json.dumps({"mode": _OH_MODE, "ray_set": label,
                      "ms": round(dt * 1000, 2)}), flush=True)

import json
run(o, d, "primary")
rng = np.random.default_rng(0)
f0 = jax.jit(lambda a, b: window_trace(pack, go, a, b, max_events=me,
                                       tile=2048, windows=1, presort=True))
hit = f0(jnp.asarray(o), jnp.asarray(d)); float(jnp.sum(hit.t))
hm = np.asarray(hit.hit)
hp = o + d * np.asarray(hit.t)[:, None]
axis = np.asarray(hit.face) >> 1
sgn = (np.asarray(hit.face) & 1) * 2 - 1
nrm = np.zeros_like(o); nrm[np.arange(len(o)), axis] = sgn
v = rng.standard_normal(o.shape).astype(np.float32)
v /= np.linalg.norm(v, axis=-1, keepdims=True)
flip = np.sum(v * nrm, axis=-1) < 0
v[flip] -= 2 * np.sum(v[flip] * nrm[flip], axis=-1, keepdims=True) * nrm[flip]
o2 = (hp + nrm * 1e-3).astype(np.float32)
d2 = np.where(hm[:, None], v, 0.0).astype(np.float32)
run(o2, d2, "secondary")
"""


def main():
    for mode in MODES:
        env = dict(os.environ, WT_OH_MODE=mode)
        p = subprocess.run([sys.executable, "-u", "-c", INNER], env=env,
                           capture_output=True, text=True, timeout=2400)
        for line in p.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if p.returncode != 0:
            print(json.dumps({"mode": mode, "error":
                              (p.stderr or "")[-300:]}), flush=True)


if __name__ == "__main__":
    main()
