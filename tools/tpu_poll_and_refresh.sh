#!/bin/bash
# Poll the axon TPU tunnel; when it answers, run the round-3 refresh battery.
# Detach with:  setsid nohup tools/tpu_poll_and_refresh.sh >/tmp/tpupoll.log 2>&1 &
# Status lands in /tmp/tpupoll.log; battery logs in out/tpu_refresh_r3/.
set -u
cd "$(dirname "$0")/.."
while true; do
  echo "[$(date +%H:%M:%S)] probing tunnel..."
  if timeout 240 python -c "import jax; print(jax.devices())"; then
    echo "[$(date +%H:%M:%S)] TUNNEL ALIVE — running refresh battery"
    bash tools/tpu_refresh_r3.sh
    echo "[$(date +%H:%M:%S)] battery done"
    touch /tmp/tpu_refresh_done
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] wedged; sleeping 600s"
  sleep 600
done
