#!/bin/bash
# Round-5 TPU window 7: 8 MPix with transfer cuts (seed + warm), corpus
# attribution, final bench.
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
run large8e 3600 GUETZLI_TPU_ZEROING_DEBUG=1 -- python tools/large_encode.py --mpix 8
run large8f 3600 GUETZLI_TPU_ZEROING_DEBUG=1 -- python tools/large_encode.py --mpix 8
run corpus16d 3600 GUETZLI_TPU_ZEROING_DEBUG=1 -- python tools/corpus_encode.py --lockstep --verbose --out /tmp/c16out3 /tmp/corpus16/img01.png /tmp/corpus16/img02.png /tmp/corpus16/img03.png /tmp/corpus16/img04.png /tmp/corpus16/img05.png /tmp/corpus16/img06.png /tmp/corpus16/img07.png /tmp/corpus16/img08.png /tmp/corpus16/img09.png /tmp/corpus16/img10.png /tmp/corpus16/img11.png /tmp/corpus16/img12.png /tmp/corpus16/img13.png /tmp/corpus16/img14.png /tmp/corpus16/img15.png /tmp/corpus16/img16.png
run bench_final3 4000 -- python bench.py
echo "r05 window7 done" >&2
