#!/bin/bash
# Round-4 serialized TPU measurement queue (ONE TPU user at a time).
# Logs inline; keep this order:
#   1. sort_sweep   — pick the inter-bounce sort schedule default
#   2. trace_tune   — tile granularity A/B at the fused frame (straggler
#                     granularity: post event-diet the tile=2048 choice
#                     may be stale)
#   3. bench_ladder — configs 6/7/8 + recenter row (VERDICT #3)
#   4. stage_table  — post-fusion frame attribution
#   5. occupancy    — post-fusion straggler profile (repack design input)
cd /root/repo
echo "== tunnel ping =="
timeout 300 python -c "
import jax
jax.config.update('jax_platforms', 'axon,cpu')
import jax.numpy as jnp
print('ping:', jax.jit(lambda x: x + 1)(jnp.ones(8)).sum(), jax.devices()[0])
" 2>&1 | tail -2
echo "== config-1 gate (post split fix) =="
timeout 2400 python tools/tpu_parity.py 2>&1 | tail -3
echo "== sort_sweep =="
timeout 2400 python tools/sort_sweep.py --frames 3 2>&1 | tail -8
echo "== trace_tune tiles =="
timeout 2400 python tools/trace_tune.py --tiles 512 1024 2048 \
    --windows 1 --compaction 1 --frames 3 2>&1 | tail -8
echo "== ladder 6 7 8 =="
timeout 5400 python tools/bench_ladder.py --configs 6 7 8 --frames 3 2>&1 | tail -30
echo "== stage_table =="
timeout 2400 python tools/stage_table.py --rows full b1 b2 nosort freetrace 2>&1 | tail -30
echo "== occupancy =="
timeout 2400 python tools/occupancy.py 2>&1 | tail -30
echo "== fusion_probe =="
timeout 2400 python tools/fusion_probe.py 2>&1 | tail -8
echo "== queue done =="
