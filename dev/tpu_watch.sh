#!/bin/bash
# Watch for the axon TPU tunnel and run the round-3 evidence queue until
# EVERY artifact exists (dev/queue_done.sh). The queue is idempotent, so a
# tunnel death mid-queue costs only the step in flight — this watcher keeps
# retrying instead of exiting after one pass. jax.devices() HANGS (not
# errors) while the tunnel is down, so every probe gets a hard timeout.
LOG=/tmp/tpu_watch.log
QLOG=/tmp/tpu_queue_r3.log
cd /root/repo
echo "$(date -u +%FT%TZ) watcher start" >> "$LOG"
while true; do
  if bash dev/queue_done.sh; then
    echo "$(date -u +%FT%TZ) all artifacts present — watcher done" >> "$LOG"
    exit 0
  fi
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" \
      >> "$LOG" 2>&1; then
    echo "$(date -u +%FT%TZ) TPU UP — running queue" >> "$LOG"
    bash dev/round3_tpu_queue.sh >> "$QLOG" 2>&1
    echo "$(date -u +%FT%TZ) queue pass finished" >> "$LOG"
  else
    echo "$(date -u +%FT%TZ) tpu down, retry in 120s" >> "$LOG"
    sleep 120
  fi
done
