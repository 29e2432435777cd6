#!/bin/bash
# Round-5 TPU window 1: fused greedy-loop zeroing kernel A/B.
# ONE TPU process at a time; fresh process per configuration (flags are
# read at dispatch time but executables cache per process).
set -u
cd "$(dirname "$0")/.."

run() {  # run NAME TIMEOUT ENVVARS... -- CMD...
  local name=$1 tmo=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name: env ${envs[*]:-none}: $*" >&2
  timeout "$tmo" env "${envs[@]}" "$@" > "tpu_r05_${name}.json" 2> "tpu_r05_${name}.log"
  echo "=== $name rc=$? ($(tail -c 200 "tpu_r05_${name}.json" 2>/dev/null))" >&2
}

run phase_staged_1m 2400 GUETZLI_TPU_ZEROING_FUSED=0 -- python tools/phase_split.py 1332x774
run phase_fused_1m  2400 GUETZLI_TPU_ZEROING_FUSED=1 GUETZLI_TPU_ZEROING_DEBUG=1 -- python tools/phase_split.py 1332x774
run phase_staged_bees 1800 GUETZLI_TPU_ZEROING_FUSED=0 -- python tools/phase_split.py 444x258
run phase_fused_bees  1800 GUETZLI_TPU_ZEROING_FUSED=1 -- python tools/phase_split.py 444x258
echo "r05 window1 done" >&2
