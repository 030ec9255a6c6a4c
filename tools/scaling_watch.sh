#!/bin/bash
# Probe host bandwidth every ~10 min; log every probe; run the confined
# scaling ladder (tools/scaling_ladder.py) in the FIRST healthy window.
# Skips firing while /tmp/fg_busy exists (foreground bench/pytest in
# progress — keeps the ladder legs unpolluted). Exits 0 after a clean
# ladder, 1 after the deadline with no healthy window.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
RND="${WATCH_ROUND:-r4}"
LOG="$ROOT/BENCH/probe_log_${RND}.jsonl"
DEADLINE=$(( $(date +%s) + ${WATCH_SECS:-18000} ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  P=$(cd "$ROOT" && python -c 'import bench,json;print(json.dumps(bench.host_probe()))' 2>/dev/null)
  echo "{\"at\": \"$(date -Is)\", \"probe\": $P}" >> "$LOG"
  THROTTLED=$(echo "$P" | python -c 'import json,sys;print(json.load(sys.stdin)["throttled"])')
  if [ "$THROTTLED" = "False" ] && [ ! -e /tmp/fg_busy ]; then
    echo "{\"at\": \"$(date -Is)\", \"event\": \"healthy window — firing ladder\"}" >> "$LOG"
    cd "$ROOT" && python tools/scaling_ladder.py \
      --out "$ROOT/BENCH/scaling_1b_${RND}.jsonl" >> "$LOG" 2>&1
    RC=$?
    echo "{\"at\": \"$(date -Is)\", \"event\": \"ladder exit $RC\"}" >> "$LOG"
    if [ "$RC" -eq 0 ]; then
      # same healthy window: record a steady-state full bench too
      echo "{\"at\": \"$(date -Is)\", \"event\": \"bench steady run\"}" >> "$LOG"
      SPARK_GRAFT_SCALING=0 python bench.py \
        > "$ROOT/BENCH/bench_${RND}_steady.json" 2>> "$LOG"
      echo "{\"at\": \"$(date -Is)\", \"event\": \"bench done\"}" >> "$LOG"
      exit 0
    fi
  fi
  sleep 600
done
exit 1
