#!/bin/bash
# Relay-stall supervisor for long TPU runs (PERF.md "relay reliability").
#
# The axon relay has two observed failure modes:
#   (r4) H2D staging leak  -> handled in-process by --rss_restart_gb
#   (r5) TCP send-buffer wedge (sk_stream_wait_memory; the relay end stops
#        draining) -> the trainer freezes mid-step, invisible to rc codes.
# This wrapper watches the run's scalars.jsonl mtime (flushed every print,
# ~25 s cadence at the soak config) and, on >STALL_S of staleness, kills the
# trainer and relaunches it with --continue_train so it resumes from the
# periodic `latest` checkpoint.  Neither failure mode exists on non-relay
# TPU hardware; there this wrapper never fires.
#
# Usage: scripts/soak_guard.sh <name> <checkpoints_dir> <logfile> \
#            -- python train.py --name <name> --checkpoints_dir <ck> ...
set -u
NAME=$1; CK=$2; LOG=$3; shift 3
[ "$1" = "--" ] && shift
SC="$CK/$NAME/scalars.jsonl"
STALL_S=${STALL_S:-360}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-8}

attempt=0
while true; do
  attempt=$((attempt+1))
  RESUME=""
  [ -d "$CK/$NAME/latest" ] && [ $attempt -gt 1 ] && RESUME="--continue_train"
  echo "=== attempt $attempt $RESUME ===" >> "$LOG"
  PYTHONUNBUFFERED=1 "$@" $RESUME >> "$LOG" 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    if [ -f "$SC" ]; then
      # staleness measured from max(last write, THIS attempt's start):
      # after a kill the file's old mtime would otherwise mark every
      # resumed attempt stale before its recompile+first-print window
      # (the exact failure that burned attempts 3-8 of the r5 soak)
      M=$(stat -c %Y "$SC")
      [ "$M" -lt "$START" ] && M=$START
      age=$(( $(date +%s) - M ))
      if [ "$age" -gt "$STALL_S" ]; then
        echo "=== scalars stale ${age}s: killing wedged trainer $PID ===" >> "$LOG"
        kill -9 $PID
        sleep 10
        break
      fi
    fi
  done
  wait $PID
  rc=$?
  if grep -q "stopping at --max_steps" "$LOG"; then
    echo "=== run complete (rc $rc, $attempt attempts) ===" >> "$LOG"
    exit 0
  fi
  if [ $attempt -ge "$MAX_ATTEMPTS" ]; then
    echo "=== giving up after $attempt attempts ===" >> "$LOG"
    exit 1
  fi
  sleep 20
done
