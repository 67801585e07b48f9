#!/bin/bash
# Round-5 queue 2: post-compaction window sweep (VERDICT item 4) and the
# BS=8 batched-step measurement (item 6).  Serial (CLAUDE.md rule 6).
cd "$(dirname "$0")/.."
set -x
# w64k_ctl first: a same-session control (the shipped 1.06 s config) so
# the sweep is comparable even if the relay's speed drifted since r4.
for a in w64k_ctl w32k w128k w16k b17_w64k; do
  timeout 1200 python experiments/exp_r25_window_compact.py "$a"
  sleep 10
done
for a in scan singles vmap; do
  timeout 1800 python experiments/exp_r24_scan_bs8.py "$a"
  sleep 10
done
echo QUEUE2_DONE
