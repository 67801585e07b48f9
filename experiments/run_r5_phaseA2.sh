#!/bin/bash
# Phase A2: re-run the r20 depth-sorted x compaction arms with the ONE-JIT
# step (the r14 form; the host-level form RESOURCE_EXHAUSTs — see
# exp_r20_ds_compact.py).
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> experiments/r5_phaseA.log; }
log "=== r20 re-run (jitted step) ==="
for a in ds4_ctl ds4_c2_8 ds4_c2_4 ds8_ctl ds8_c2_8 ds4_c1_4; do
  log "r20 $a"
  timeout 1500 python experiments/exp_r20_ds_compact.py "$a" >> experiments/r5_phaseA.log 2>&1
  sleep 5
done
log "=== phase A2 done ==="
