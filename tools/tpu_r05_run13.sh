#!/bin/bash
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1 tmo=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name: env ${envs[*]:-none}: $*" >&2
  timeout "$tmo" env "${envs[@]}" "$@" > "tpu_r05_${name}.json" 2> "tpu_r05_${name}.log"
  echo "=== $name rc=$? ($(tail -c 250 "tpu_r05_${name}.json" 2>/dev/null))" >&2
}
run cmpprof_dot_1m 2400 -- python tools/compare_profile2.py 1332x774 --reps 15
run cmpprof_dot_8m 3000 -- python tools/compare_profile2.py 3456x2304 --reps 8
run goldens_dot 5400 -- python tools/golden_corpus.py run --match 420
run bench_dot 4000 -- python bench.py
run large8k 3600 GUETZLI_TPU_ZEROING_DEBUG=1 -- python tools/large_encode.py --mpix 8
run large8l 3600 GUETZLI_TPU_ZEROING_DEBUG=1 -- python tools/large_encode.py --mpix 8
echo "r05 window13 done" >&2
