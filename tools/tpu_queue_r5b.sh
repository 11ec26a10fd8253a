#!/bin/bash
# Round-5 TPU queue 2: event diet validation + streamed diagnosis.
cd /root/repo
echo "== event_lab ($(date)) =="
timeout 2400 python -u tools/event_lab.py 2>&1 | tail -12
echo "== hbm prefetch hardware parity ($(date)) =="
timeout 1200 python -u - << 'PYEOF' 2>&1 | tail -6
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from wavefront_tpu.kernels.window_trace import build_window_pack, window_trace
from wavefront_tpu.render.intersect import dda_trace
from wavefront_tpu.render.intersect import make_aux_grid
rng = np.random.default_rng(5)
grid = np.zeros((96, 64, 96), np.uint8)
h = (6 + 10 * rng.random((96, 96))).astype(int)
for x in range(96):
    for z in range(96):
        grid[x, :h[x, z], z] = 1
grid[40:44, 20:30, 40:44] = 3
tr = np.ones(256, bool); tr[1] = False; tr[3] = False
tl = tr.copy()
pack = build_window_pack(grid, tr, tl)
o = np.tile(np.array([48., 40., 48.], np.float32), (4096, 1))
d = rng.standard_normal((4096, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
aux = make_aux_grid(grid, tr, tl)
ref = dda_trace(jnp.asarray(grid), jnp.zeros(3, jnp.int32), jnp.asarray(tr), jnp.asarray(tl), 255,
                jnp.asarray(o), jnp.asarray(d), aux_grid=jnp.asarray(aux), max_steps=512)
for k in (1, 2, 4):
    got = window_trace(pack, jnp.zeros(3, jnp.int32), jnp.asarray(o), jnp.asarray(d),
                       tile=1024, windows=k, presort=True, tables_in_hbm=True)
    ok = (np.array_equal(np.asarray(got.hit), np.asarray(ref.hit))
          and np.allclose(np.asarray(got.t)[np.asarray(ref.hit)],
                          np.asarray(ref.t)[np.asarray(ref.hit)], atol=2e-4))
    print(f"hbm k={k} (prefetch={'yes' if k==1 else 'no'}): {'OK' if ok else 'MISMATCH'}")
PYEOF
echo "== occupancy streamed ($(date)) =="
timeout 5400 python -u tools/occupancy.py --only streamed --tiles 2048 --windows 1,2,4 --phases 1,2:32,3:16 2>&1 | tail -30
echo "== ladder config 8 ($(date)) =="
timeout 3600 python -u tools/bench_ladder.py --configs 8 --frames 3 2>&1 | tail -6
echo "== queue 2 done ($(date)) =="
echo "== radix_lab rerun ($(date)) =="
timeout 2400 python -u tools/radix_lab.py 2>&1 | tail -6
echo "== queue 2b done ($(date)) =="
