"""CPU smoke test for bench.py's incremental-emission flow (round 5).

Patches the workload constants down to toy shapes and runs bench.main()
on the CPU platform — validates every rung's Python path, the budget
gating, the BENCH_SKIP env, and that stdout is a sequence of complete
JSON lines (last line wins).  Not a performance measurement.
"""
import json
import os
import sys

os.environ.setdefault("BENCH_BUDGET_S", "100000")
os.environ.setdefault("BENCH_SKIP", "bw512")

import jax
jax.config.update("jax_platforms", "cpu")

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)
import bench

bench.VOL, bench.IMG, bench.MAX_SAMPLES, bench.BLOCK = 32, 64, 64, 16
bench.main()
