#!/bin/bash
# Round-5 TPU window 3: batch-width curve with the fused kernel, 8 MPix,
# in-kernel dot-form contraction A/B.
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
run batch20 2400 GUETZLI_TPU_BENCH_BATCH=20 GUETZLI_TPU_BENCH_1MPIX=0 -- python bench.py
run batch24 2400 GUETZLI_TPU_BENCH_BATCH=24 GUETZLI_TPU_BENCH_1MPIX=0 -- python bench.py
run batch32 2400 GUETZLI_TPU_BENCH_BATCH=32 GUETZLI_TPU_BENCH_1MPIX=0 -- python bench.py
run large8 3600 GUETZLI_TPU_ZEROING_DEBUG=1 -- python tools/large_encode.py --mpix 8
run dot_fused_1m 2400 GUETZLI_TPU_ZEROING_FUSED=1 GUETZLI_TPU_LANES_DOT=1 GUETZLI_TPU_ZEROING_DEBUG=1 -- python tools/phase_split.py 1332x774
echo "r05 window3 done" >&2
