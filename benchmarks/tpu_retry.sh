#!/bin/bash
# Retry wrapper for axon-tunnel dial hangs: launch the command, kill and
# relaunch if it produces no stdout within GRACE seconds. Usage:
#   tpu_retry.sh GRACE TOTAL_TIMEOUT cmd args...
GRACE=$1; TOTAL=$2; shift 2
for attempt in 1 2 3 4; do
  OUT=$(mktemp)
  timeout "$TOTAL" "$@" >"$OUT" 2>&1 &
  PID=$!
  for i in $(seq 1 "$GRACE"); do
    sleep 1
    if [ -s "$OUT" ]; then break; fi
    if ! kill -0 $PID 2>/dev/null; then break; fi
  done
  if [ -s "$OUT" ] || ! kill -0 $PID 2>/dev/null; then
    wait $PID; RC=$?
    cat "$OUT"; rm -f "$OUT"
    exit $RC
  fi
  echo "[tpu_retry] attempt $attempt produced no output in ${GRACE}s - relaunching" >&2
  kill -9 $PID 2>/dev/null; wait $PID 2>/dev/null
  rm -f "$OUT"
done
echo "[tpu_retry] all attempts hung" >&2
exit 1
