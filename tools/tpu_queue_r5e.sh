#!/bin/bash
# Round-5 TPU queue 5 (post-captures): flat-fan occupancy with the
# adopted phase schedule + the production event slope.
cd /root/repo
echo "== occupancy flat secondary, adopted schedule ($(date)) =="
timeout 3600 python -u tools/occupancy.py --quick --only secondary --tiles 2048 --windows 1 --phases 1,2:16 2>&1 | grep -E "Mray/s"
echo "== production event slope ($(date)) =="
timeout 1800 python -u tools/event_lab.py --only event 2>&1 | tail -8
echo "== queue 5 done ($(date)) =="
