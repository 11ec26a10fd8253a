#!/bin/bash
# Round-5 TPU queue 3: one-hot decision, streamed tile/phase rows,
# config-8 truncation audit, flat phase budgets, bf16 A/B.
cd /root/repo
echo "== onehot_ab ($(date)) =="
timeout 4800 python -u tools/onehot_ab.py 2>&1 | grep -E "^\{"
echo "== config-8 truncation audit ($(date)) =="
timeout 2400 python -u - << 'PYEOF' 2>&1 | tail -4
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import os
from tools.bench_ladder import streamed_setup
from wavefront_tpu.render.renderer import Renderer
from wavefront_tpu.core.config import RenderingPreferences
from wavefront_tpu.world.blocks import BlockRegistry
registry = BlockRegistry.load("/root/repo/assets")
scene, cm, settings, basis = streamed_setup(registry, 1024, 1024, 6)
r = Renderer(settings)
img, aux = r.render(scene, basis, RenderingPreferences(nee_type=1),
                    frame_count=1, with_aux=True)
print("config8 truncated rays:", int(aux["truncated"]),
      "nee_overflow:", int(aux["nee_overflow"]),
      "finite:", bool(np.isfinite(img).all()))
PYEOF
echo "== occupancy streamed tiles ($(date)) =="
timeout 4800 python -u tools/occupancy.py --only streamed --tiles 512,1024 --windows 1 --phases 1,2:16 2>&1 | grep -E "streamed96"
echo "== trace_tune phase budgets ($(date)) =="
timeout 5400 python -u tools/trace_tune.py --frames 2 --tiles 2048 --windows 1 \
  --compaction 1 --unroll 4 --skip-strides 2 --phases 2 --phase-events 8 16 \
  --phases-at 1 2>&1 | grep -E "^\{"
echo "== shade_bf16 headline A/B ($(date)) =="
timeout 3600 python -u tools/trace_tune.py --frames 2 --tiles 2048 --windows 1 \
  --compaction 1 --unroll 4 --skip-strides 2 --phases 2 --phase-events 32 \
  --phases-at 1 --shade-bf16 0 1 2>&1 | grep -E "^\{"
echo "== queue 3 done ($(date)) =="
