#!/bin/bash
# Round-5 serialized TPU measurement queue (ONE TPU user at a time).
# Order: correctness gates first (they also warm the compile cache the
# later timed runs reuse), then the headline capture, then attribution.
cd /root/repo
echo "== tunnel ping ($(date)) =="
timeout 300 python -c "
import jax
jax.config.update('jax_platforms', 'axon,cpu')
import jax.numpy as jnp
print('ping:', jax.jit(lambda x: x + 1)(jnp.ones(8)).sum(), jax.devices()[0])
" 2>&1 | tail -2
echo "== config-1 golden gate ($(date)) =="
timeout 3000 python -u tools/tpu_parity.py 2>&1 | tail -4
echo "== headline bench gate ($(date)) =="
timeout 3600 python -u tools/tpu_parity.py --bench 2>&1 | tail -6
echo "== bench ($(date)) =="
BENCH_ATTEMPT_TIMEOUT=3000 timeout 3600 python -u bench.py 2>&1 | tail -3
echo "== stage_table ($(date)) =="
timeout 3600 python -u tools/stage_table.py --frames 3 2>&1 | tail -30
echo "== radix_lab ($(date)) =="
timeout 2400 python -u tools/radix_lab.py 2>&1 | tail -6
echo "== queue done ($(date)) =="
