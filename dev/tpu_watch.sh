#!/bin/bash
# Watch for the axon TPU tunnel to come (back) up, then run the round-3
# evidence queue exactly once. The tunnel lives outside the container and
# jax.devices() HANGS (not errors) while it is down, so every probe gets a
# hard timeout. Probe every 120s; log heartbeats.
LOG=/tmp/tpu_watch.log
QLOG=/tmp/tpu_queue_r3.log
cd /root/repo
echo "$(date -u +%FT%TZ) watcher start" >> "$LOG"
while true; do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" \
      >> "$LOG" 2>&1; then
    echo "$(date -u +%FT%TZ) TPU UP — starting queue" >> "$LOG"
    bash dev/round3_tpu_queue.sh >> "$QLOG" 2>&1
    echo "$(date -u +%FT%TZ) queue finished" >> "$LOG"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) tpu down, retry in 120s" >> "$LOG"
  sleep 120
done
