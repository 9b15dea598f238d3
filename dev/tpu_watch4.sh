#!/bin/bash
# Round-4 watcher: run the evidence queue until every artifact exists
# (dev/queue_done4.sh). Idempotent per step; a tunnel death costs only the
# step in flight. jax.devices() HANGS while the tunnel is down, so probes
# get hard timeouts. Usage: bash dev/tpu_watch4.sh &
LOG=/tmp/tpu_watch4.log
QLOG=/tmp/tpu_queue_r4.log
cd /root/repo
echo "$(date -u +%FT%TZ) watcher start" >> "$LOG"
while true; do
  if bash dev/queue_done4.sh >> "$LOG" 2>&1; then
    echo "$(date -u +%FT%TZ) all artifacts present — watcher done" >> "$LOG"
    exit 0
  fi
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" \
      >> "$LOG" 2>&1; then
    echo "$(date -u +%FT%TZ) TPU UP — running queue" >> "$LOG"
    bash dev/round4_tpu_queue.sh >> "$QLOG" 2>&1
    echo "$(date -u +%FT%TZ) queue pass finished" >> "$LOG"
  else
    echo "$(date -u +%FT%TZ) tpu down, retry in 120s" >> "$LOG"
    sleep 120
  fi
done
