#!/bin/bash
# Round-5 TPU measurement queue.  Fire once the axon relay is back.
# Logs to /tmp/round5_runbook.log; safe to re-run (persistent compile
# cache makes later passes cheap).
#
# ORDER RATIONALE (1h round budget): the FULL default-family sweep runs
# FIRST — it both produces every BENCH_r05 number the driver needs and
# warms the persistent cache so the driver's own bench.py run is cheap.
# The risky scale-ceiling maxcut500000 attempt (which crashed the
# relay/worker in round 4) runs ONLY AFTER the sweep is banked, and the
# confirmatory segsum shoot-out last.
set -u
LOG=/tmp/round5_runbook.log
R5ENV="PYTHONPATH=/root/.axon_site:/root/repo"
cd /root/repo
exec >>"$LOG" 2>&1
echo "=== runbook start $(date)"

echo "--- 1. sanity"
timeout 600 env $R5ENV python -u -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float(jnp.sum(jnp.ones((8,8)) @ jnp.ones((8,8)))))" || exit 1

echo "--- 2. FULL default-family sweep (warms cache + banks BENCH numbers)"
timeout 7200 env $R5ENV python -u bench.py
echo "sweep rc=$?"

echo "--- 3. maxcut500000 attempt $(date)"
timeout 2400 env $R5ENV BENCH_N=500000 BENCH_BUDGET_S=2000 \
    python -u bench.py
echo "maxcut500000 rc=$?"

echo "--- 4. segsum variant shoot-out (confirmatory)"
timeout 1800 env $R5ENV python -u tools/probes/microbench_segsum_variants.py

echo "--- 5. final quick warm pass (LAST TPU action: re-warm anything evicted)"
timeout 3600 env $R5ENV python -u bench.py
echo "=== runbook done $(date)"
