#!/bin/bash
# Autonomous TPU measurement queue: waits for the chip to unwedge, then
# runs the round-5 measurement battery, logging to /tmp/tpu_results/.
mkdir -p /tmp/tpu_results
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/tpu_results/queue.log; }

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(1024).sum()))" >/dev/null 2>&1
}

wait_healthy() {
  while ! probe; do log "wedged; wait 120s"; sleep 120; done
  log "TPU healthy"
}

run() {  # run <name> <timeout> <cmd...>
  local name=$1 t=$2; shift 2
  wait_healthy
  log "start $name"
  timeout "$t" "$@" > "/tmp/tpu_results/$name.log" 2>&1
  log "end $name rc=$?"
}

run breakdown_cluster 1800 python scripts/profile_breakdown.py --scene killeroo
run breakdown_sweep 1800 env PBRT_TPU_ACCEL=sweep python scripts/profile_breakdown.py --scene killeroo
run cornell_breakdown 900 python scripts/profile_breakdown.py --scene cornell
log ALLDONE
