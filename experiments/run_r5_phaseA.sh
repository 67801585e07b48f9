#!/bin/bash
# Round-5 phase A: the experiments VERDICT r4 items 2/4/6 ask for, one arm
# per process (r15 lesson), sequential, bounded.  Headline-moving first.
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> experiments/r5_phaseA.log; }

log "=== r21 stride-2 headline ==="
for a in s2_ctl s2_c2_16; do
  log "r21 $a"
  timeout 1200 python experiments/exp_r21_s2_headline.py "$a" >> experiments/r5_phaseA.log 2>&1
  sleep 5
done

log "=== r25 window/box under compaction ==="
for a in w64k_ctl w32k w128k w16k b17_w64k; do
  log "r25 $a"
  timeout 1200 python experiments/exp_r25_window_compact.py "$a" >> experiments/r5_phaseA.log 2>&1
  sleep 5
done

log "=== r20 depth-sorted x compaction (phantom) ==="
for a in ds4_ctl ds4_c2_8 ds4_c2_4 ds8_ctl ds8_c2_8 ds4_c1_4; do
  log "r20 $a"
  timeout 1200 python experiments/exp_r20_ds_compact.py "$a" >> experiments/r5_phaseA.log 2>&1
  sleep 5
done

log "=== phase A done ==="
