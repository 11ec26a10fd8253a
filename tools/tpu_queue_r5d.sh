#!/bin/bash
# Round-5 TPU queue 4: FINAL captures — headline bench, the whole ladder
# (VERDICT r4 #5: all 8 rows, one session, dated), parity gates on the
# final tree.
cd /root/repo
echo "== bench ($(date)) =="
BENCH_ATTEMPT_TIMEOUT=3000 timeout 3600 python -u bench.py 2>&1 | tail -3
echo "== parity gates on the final tree ($(date)) =="
timeout 3000 python -u tools/tpu_parity.py 2>&1 | tail -3
timeout 3600 python -u tools/tpu_parity.py --bench 2>&1 | tail -4
echo "== ladder 1-5 ($(date)) =="
timeout 7200 python -u tools/bench_ladder.py --configs 1 2 3 4 5 --frames 3 2>&1 | grep -E "^\{"
echo "== ladder 6-8 ($(date)) =="
timeout 9000 python -u tools/bench_ladder.py --configs 6 7 8 --frames 3 2>&1 | grep -E "^\{"
echo "== queue 4 done ($(date)) =="
