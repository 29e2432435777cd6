#!/bin/bash
# Round-5 TPU window 6: validate cross-entrypoint cache reuse, re-run
# corpus + large8 with hot cache, and sweep the 420 golden rows through
# the new fused 420y path.
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
# 1. Pay each shape's compile ONCE under the new stable keys (cli entry).
run warm_bees 2400 -- python -m guetzli_tpu.cli --quality 95 /root/reference/tests/bees.png /tmp/w1.jpg
run warm_1m 2400 -- python -m guetzli_tpu.cli --quality 95 /tmp/bees_1m.png /tmp/w2.jpg
# 2. Cross-entrypoint reuse check: same shapes via OTHER entrypoints.
run xent_phase 2400 GUETZLI_TPU_ZEROING_DEBUG=1 -- python tools/phase_split.py 444x258
run corpus16c 3600 -- python tools/corpus_encode.py --lockstep --out /tmp/c16out2 /tmp/corpus16/img01.png /tmp/corpus16/img02.png /tmp/corpus16/img03.png /tmp/corpus16/img04.png /tmp/corpus16/img05.png /tmp/corpus16/img06.png /tmp/corpus16/img07.png /tmp/corpus16/img08.png /tmp/corpus16/img09.png /tmp/corpus16/img10.png /tmp/corpus16/img11.png /tmp/corpus16/img12.png /tmp/corpus16/img13.png /tmp/corpus16/img14.png /tmp/corpus16/img15.png /tmp/corpus16/img16.png
run large8d 3600 GUETZLI_TPU_ZEROING_DEBUG=1 -- python tools/large_encode.py --mpix 8
# 3. 420 golden rows through the fused 420y kernel.
run golden420 5400 -- python tools/golden_corpus.py run --match 420
echo "r05 window6 done" >&2
