#!/bin/bash
# Round-5 phase B: settle the 512^3 blockwise discrepancy (VERDICT r4
# item 3) — re-run r12 (uncompacted blockwise, N warm steps) and retry
# r18 (compacted blockwise) with a second attempt on error.  Then phase C:
# the r24 batched-step measurement (item 6).
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> experiments/r5_phaseB.log; }

log "=== r25 w32k (timed out during phase A congestion) ==="
timeout 1800 python experiments/exp_r25_window_compact.py w32k >> experiments/r5_phaseB.log 2>&1
sleep 10

log "=== r12 re-run (512^3 blockwise, uncompacted) ==="
timeout 1800 python experiments/exp_r12_bw512_steps.py >> experiments/r5_phaseB.log 2>&1
sleep 20

log "=== r18 retry (512^3 blockwise + compaction, b64 ca2) ==="
BW_BLOCK=64 BW_CA=2 timeout 1800 python experiments/exp_r18_bw512_compact.py >> experiments/r5_phaseB.log 2>&1
if tail -3 experiments/r5_sorted512_results.jsonl | grep -q '"error"'; then
  log "r18 had an error row; settling 90 s and retrying once"
  sleep 90
  BW_BLOCK=64 BW_CA=2 timeout 1800 python experiments/exp_r18_bw512_compact.py >> experiments/r5_phaseB.log 2>&1
fi
sleep 20

log "=== r24 batched gradient step (singles/scan/vmap) ==="
for a in singles scan vmap; do
  log "r24 $a"
  timeout 1800 python experiments/exp_r24_scan_bs8.py "$a" >> experiments/r5_phaseB.log 2>&1
  sleep 10
done
log "=== phase B/C done ==="
