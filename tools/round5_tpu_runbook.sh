#!/bin/bash
# Round-5 TPU measurement queue.  Fire once the axon relay is back.
# Logs to /tmp/round5_runbook.log; safe to re-run (persistent compile
# cache makes later passes cheap).
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

echo "--- 2. segsum variant shoot-out (2d+3d, f32+f64)"
timeout 3600 env $R5ENV python -u tools/probes/microbench_segsum_variants.py

echo "--- 3. matcomp2000 + maxcut100000 families"
timeout 3600 env $R5ENV BENCH_FAMILIES=matcomp2000,maxcut100000 \
    python -u bench.py

echo "--- 4. maxcut500000 attempt $(date)"
timeout 2400 env $R5ENV BENCH_N=500000 BENCH_BUDGET_S=2000 \
    python -u bench.py
echo "maxcut500000 rc=$?"

echo "--- 5. gset_torus10000 family"
timeout 1800 env $R5ENV \
    BENCH_FAMILIES=tests/fixtures/gset_torus10000.rudy python -u bench.py

echo "--- 6. FULL warm bench sweep (must be the LAST TPU action)"
timeout 7200 env $R5ENV python -u bench.py
echo "=== runbook done $(date)"
