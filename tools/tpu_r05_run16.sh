#!/bin/bash
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $*" >&2
  timeout "$tmo" "$@" > "tpu_r05_${name}.json" 2> "tpu_r05_${name}.log"
  echo "=== $name rc=$? ($(tail -c 200 "tpu_r05_${name}.json" 2>/dev/null))" >&2
}
run probe420c2 2400 python -c "
from guetzli_tpu.runtime import configure
configure()
import json
from guetzli_tpu.kernels import zeroing_loop as zl
print(json.dumps({'444': zl.fused_available('444'), 'y': zl.fused_available('420y'), 'c': zl.fused_available('420c')}))"
run golden420d 5400 python tools/golden_corpus.py run --match 420
echo "r05 window16 done" >&2
