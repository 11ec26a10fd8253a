#!/bin/bash
# Round-4 serialized TPU measurement queue (ONE TPU user at a time).
# Each step bounded; logs to /tmp/r4_*.log; keep this order:
#   1. sort_sweep    — pick the inter-bounce sort schedule default
#   2. bench_ladder  — configs 6/7/8 + recenter row (VERDICT #3)
#   3. stage_table   — post-fusion frame attribution
#   4. occupancy     — post-fusion straggler profile (repack design input)
cd /root/repo
echo "== sort_sweep =="
timeout 2400 python tools/sort_sweep.py --frames 3 2>&1 | tail -20
echo "== ladder 6 7 8 =="
timeout 5400 python tools/bench_ladder.py --configs 6 7 8 --frames 3 2>&1 | tail -30
echo "== stage_table =="
timeout 2400 python tools/stage_table.py --rows full b1 b2 nosort freetrace 2>&1 | tail -30
echo "== occupancy =="
timeout 2400 python tools/occupancy.py 2>&1 | tail -30
echo "== queue done =="
