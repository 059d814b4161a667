#!/bin/bash
# Final cache-seeding + bench with the frozen round-5 programs.
mkdir -p /tmp/tpu_results
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/tpu_results/queue.log; }
probe() { timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(1024).sum()))" >/dev/null 2>&1; }
wait_healthy() { while ! probe; do log "wedged; wait 120s"; sleep 120; done; log "TPU healthy"; }
run() { local name=$1 t=$2; shift 2; wait_healthy; log "start $name"; PYTHONUNBUFFERED=1 timeout "$t" "$@" > "/tmp/tpu_results/$name.log" 2>&1; log "end $name rc=$?"; }

run warm6_headline 900 env PBRT_TPU_NSPECTRUM=8 python bench.py --worker c1_fwd8 --budget 800
run warm6_fwdbwd 1200 env PBRT_TPU_NSPECTRUM=8 python bench.py --worker c1_fwdbwd8 --budget 1100
run warm6_killeroo 1500 env PBRT_TPU_NSPECTRUM=8 python bench.py --worker c2_killeroo --budget 1400
run warm6_manylight 1200 env PBRT_TPU_NSPECTRUM=8 python bench.py --worker c3_manylight --budget 1100
run warm6_cloud 1200 env PBRT_TPU_NSPECTRUM=8 python bench.py --worker c4_cloud --budget 1100
run warm6_fwd32 1200 env PBRT_TPU_NSPECTRUM=32 python bench.py --worker c1_fwd32 --budget 1100
run bench6_final 900 python bench.py
log ALLDONE6
