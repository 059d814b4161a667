#!/bin/bash
mkdir -p /tmp/tpu_results
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/tpu_results/queue.log; }
probe() { timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(1024).sum()))" >/dev/null 2>&1; }
wait_healthy() { while ! probe; do log "wedged; wait 120s"; sleep 120; done; log "TPU healthy"; }
run() { local name=$1 t=$2; shift 2; wait_healthy; log "start $name"; PYTHONUNBUFFERED=1 timeout "$t" "$@" > "/tmp/tpu_results/$name.log" 2>&1; log "end $name rc=$?"; }
run bench8_final 1100 python bench.py
log ALLDONE8
