#!/bin/bash
# Round-5 TPU window 4: byte-identity A/B, warm large8 attribution,
# final-code bench, corpus tool.
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
# 1. Byte-identity: staged vs fused on the 1 MPix image via the CLI.
python - <<'PY' > /tmp/mk1m.py.out 2>&1
from PIL import Image
im = Image.open("/root/reference/tests/bees.png").convert("RGB")
im.resize((1332, 774)).save("/tmp/bees_1m.png")
PY
run cli_staged_1m 2400 GUETZLI_TPU_ZEROING_FUSED=0 -- python -m guetzli_tpu.cli --quality 95 /tmp/bees_1m.png /tmp/ab_staged.jpg
run cli_fused_1m 2400 GUETZLI_TPU_ZEROING_FUSED=1 -- python -m guetzli_tpu.cli --quality 95 /tmp/bees_1m.png /tmp/ab_fused.jpg
md5sum /tmp/ab_staged.jpg /tmp/ab_fused.jpg > tpu_r05_ab_md5.txt 2>&1
cat tpu_r05_ab_md5.txt >&2
# 2. Warm 8 MPix with full debug (kernel compile now cached).
run large8b 3600 GUETZLI_TPU_ZEROING_DEBUG=1 -- python tools/large_encode.py --mpix 8
# 3. Final-code bench (validates the zeroing_kernel MFU row).
run bench_final 4000 -- python bench.py
# 4. Corpus tool (16 images, cold process) for the img/min metric.
run corpus16 3600 -- python tools/corpus_encode.py --bench 16
echo "r05 window4 done" >&2
