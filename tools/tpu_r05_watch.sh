#!/bin/bash
# Watch for a quiet tunnel window and capture a clean final bench:
# probe, bench, accept when mpix1 spread < 10%; up to 6 attempts,
# 15 min apart. ONE TPU process at a time.
set -u
cd "$(dirname "$0")/.."
for i in 1 2 3 4 5 6; do
  if ! timeout 300 python -c "from guetzli_tpu.runtime import accelerator_reachable as r; import sys; sys.exit(0 if r(timeout_s=280) else 1)" >/dev/null 2>&1; then
    echo "watch $i: tunnel down" >&2; sleep 900; continue
  fi
  echo "watch $i: tunnel live, benching" >&2
  timeout 4000 python bench.py > "tpu_r05_bench_watch$i.json" 2> "tpu_r05_bench_watch$i.log"
  spread=$(python -c "
import json,sys
try: d=json.load(open('tpu_r05_bench_watch$i.json'))
except Exception: sys.exit(print(999))
print(d.get('mpix1_spread_pct', 999))" )
  echo "watch $i: spread=$spread" >&2
  ok=$(python -c "print(1 if float('$spread') < 10 else 0)")
  if [ "$ok" = "1" ]; then
    cp "tpu_r05_bench_watch$i.json" tpu_r05_bench_best.json
    echo "watch: accepted attempt $i" >&2
    break
  fi
  sleep 900
done
echo "watch done" >&2
