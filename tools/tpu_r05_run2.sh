#!/bin/bash
# Round-5 TPU window 2: fused zeroing with the device-gather preamble.
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1 tmo=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name: env ${envs[*]:-none}: $*" >&2
  timeout "$tmo" env "${envs[@]}" "$@" > "tpu_r05_${name}.json" 2> "tpu_r05_${name}.log"
  echo "=== $name rc=$? ($(tail -c 200 "tpu_r05_${name}.json" 2>/dev/null))" >&2
}
run phase_fused2_1m 2400 GUETZLI_TPU_ZEROING_FUSED=1 GUETZLI_TPU_ZEROING_DEBUG=1 -- python tools/phase_split.py 1332x774
run bench_fused 4000 -- python bench.py
echo "r05 window2 done" >&2
