#!/bin/bash
# Round-5 TPU window 8: full golden sweep on the final code + leak repro.
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $*" >&2
  timeout "$tmo" "$@" > "tpu_r05_${name}.json" 2> "tpu_r05_${name}.log"
  echo "=== $name rc=$? ($(tail -c 200 "tpu_r05_${name}.json" 2>/dev/null))" >&2
}
run leak_repro 1800 python tools/leak_repro.py
run golden_all 10000 python tools/golden_corpus.py run
echo "r05 window8 done" >&2
