#!/bin/bash
# Round-5 TPU queue 6: 10x-budget streamed re-audit + config-4 rerun
# (the 914 ms capture ran against a CPU-contended host) + queue-5 items.
cd /root/repo
echo "== ladder 6 8 at 10x budget ($(date)) =="
timeout 7200 python -u tools/bench_ladder.py --configs 6 8 --frames 3 2>&1 | grep -E "^\{"
echo "== ladder 4 rerun ($(date)) =="
timeout 3600 python -u tools/bench_ladder.py --configs 4 --frames 3 2>&1 | grep -E "^\{"
echo "== occupancy flat secondary, adopted schedule ($(date)) =="
timeout 3600 python -u tools/occupancy.py --quick --only secondary --tiles 2048 --windows 1 --phases 1,2:16 2>&1 | grep -E "Mray/s"
echo "== production event slope ($(date)) =="
timeout 1800 python -u tools/event_lab.py --only event 2>&1 | tail -8
echo "== queue 6 done ($(date)) =="
