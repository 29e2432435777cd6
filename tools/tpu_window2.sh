#!/bin/bash
# Round-3 second TPU window queue (run AFTER tools/tpu_capture.py exits;
# ONE TPU process at a time). Most valuable first, each fault-isolated.
set -u
cd "$(dirname "$0")/.."

run() {  # run NAME TIMEOUT CMD...
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $*" >&2
  timeout "$tmo" "$@" > "tpu_r03_${name}.json" 2> "tpu_r03_${name}.log"
  echo "=== $name rc=$? ($(tail -c 120 "tpu_r03_${name}.json" 2>/dev/null))" >&2
}

# 1. Headline bench with the new lockstep corpus path.
run bench2 3600 python bench.py

# 2. Pallas retry with the scoped-VMEM fix + multi_reduction unroll:
#    cheapest stage first to validate the fix class, then the two full
#    kernels, then a timed row vs the XLA wave.
run bisect_idct 1800 python tools/pallas_bisect.py --stage idct
run bisect_lanes 2400 python tools/pallas_bisect.py --stage lanes_full
run bisect_full 2400 python tools/pallas_bisect.py --stage full
run zab_pallas 3600 python tools/zeroing_ab.py --pallas --reps 20

# 3. Zeroing-wave A/B: unrolled vs dot vs quad (fresh process each; the
#    flags are read at trace time).
run zab_plain 2400 python tools/zeroing_ab.py --reps 20
run zab_dot 2400 python tools/zeroing_ab.py --dot --reps 20
run zab_quad 2400 python tools/zeroing_ab.py --quad --reps 20
run zab_dotquad 2400 python tools/zeroing_ab.py --dot --quad --reps 20

echo "window2 done" >&2
