#!/bin/bash
# Round-5 TPU queue 3: one-hot decision + phase-budget tune + bf16 A/B.
cd /root/repo
echo "== onehot_ab ($(date)) =="
timeout 4800 python -u tools/onehot_ab.py 2>&1 | grep -E "^\{" 
echo "== event slope (production kernel) ($(date)) =="
timeout 1800 python -u tools/event_lab.py --only event 2>&1 | tail -6
echo "== trace_tune phase budgets ($(date)) =="
timeout 7200 python -u tools/trace_tune.py --frames 2 --tiles 2048 --windows 1 \
  --compaction 1 --unroll 4 --skip-strides 2 --phases 2 3 --phase-events 8 16 \
  --phases-at 1 2>&1 | grep -E "^\{"
echo "== shade_bf16 headline A/B ($(date)) =="
timeout 3600 python -u tools/trace_tune.py --frames 2 --tiles 2048 --windows 1 \
  --compaction 1 --unroll 4 --skip-strides 2 --phases 2 --phase-events 32 \
  --phases-at 1 --shade-bf16 0 1 2>&1 | grep -E "^\{"
echo "== queue 3 done ($(date)) =="
