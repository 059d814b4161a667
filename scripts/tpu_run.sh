#!/bin/bash
# Wedge-tolerant TPU runner: waits for the (single-tenant, occasionally
# wedged) chip to answer a trivial-op probe, then runs the given command
# under a timeout, logging to /tmp/tpu_results/<name>.log.
#
#   scripts/tpu_run.sh <name> <timeout_s> <cmd...>
#
# Round-5 measurement provenance (sort keys, sorted-shading break-even,
# per-mode bench cache warming) was produced with sequences of these runs;
# see scripts/micro_sortkeys.py and scripts/measure_sorted_shading.py.
mkdir -p /tmp/tpu_results
cd "$(dirname "$0")/.."
name=$1; t=$2; shift 2
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/tpu_results/queue.log; }
probe() { timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(1024).sum()))" >/dev/null 2>&1; }
while ! probe; do log "wedged; wait 120s"; sleep 120; done
log "start $name"
PYTHONUNBUFFERED=1 timeout "$t" "$@" > "/tmp/tpu_results/$name.log" 2>&1
log "end $name rc=$?"
