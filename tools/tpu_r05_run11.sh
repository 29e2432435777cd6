#!/bin/bash
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $*" >&2
  timeout "$tmo" "$@" > "tpu_r05_${name}.json" 2> "tpu_r05_${name}.log"
  echo "=== $name rc=$? ($(tail -c 250 "tpu_r05_${name}.json" 2>/dev/null))" >&2
}
run cmpprof_1m 2400 python tools/compare_profile2.py 1332x774 --reps 15
run cmpprof_8m 3000 python tools/compare_profile2.py 3456x2304 --reps 8
run bench_final5 4000 python bench.py
echo "r05 window11 done" >&2
