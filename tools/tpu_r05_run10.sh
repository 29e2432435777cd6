#!/bin/bash
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $*" >&2
  timeout "$tmo" "$@" > "tpu_r05_${name}.json" 2> "tpu_r05_${name}.log"
  echo "=== $name rc=$? ($(tail -c 200 "tpu_r05_${name}.json" 2>/dev/null))" >&2
}
run golden420b 5400 python tools/golden_corpus.py run --match 420
run golden_sample 5400 python tools/golden_corpus.py run --sample 60
echo "r05 window10 done" >&2
