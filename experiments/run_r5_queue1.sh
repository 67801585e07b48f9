#!/bin/bash
# Round-5 queue 1: the two never-run verdict experiments, then the 512^3
# discrepancy rerun + compacted-blockwise retry.  Serial — one TPU
# process at a time (CLAUDE.md rule 6).
cd "$(dirname "$0")/.."
set -x
for a in s2_ctl s2_c2_16; do
  timeout 1200 python experiments/exp_r21_s2_headline.py "$a"
  sleep 10
done
for a in ds4_ctl ds4_c2_8 ds4_c2_4 ds8_ctl ds8_c2_8; do
  timeout 1200 python experiments/exp_r20_ds_compact.py "$a"
  sleep 10
done
# 512^3 blockwise rerun (settle the 8.8 vs 9.8 discrepancy)
timeout 1800 python experiments/exp_r12_bw512_steps.py
sleep 30
# compacted blockwise retry (r18 crashed on a transient HTTP 500)
timeout 1800 python experiments/exp_r18_bw512_compact.py
echo QUEUE1_DONE
