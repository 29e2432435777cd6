#!/bin/bash
# Smoke test, mirroring the reference's tests/smoke_test.sh: run the CLI
# over the {png,jpeg} x {file,stdin} x {file,stdout} x flags matrix,
# validate each output decodes, and assert clean failure on invalid input.
set -u
cd "$(dirname "$0")/.."

TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
PNG=tests/fixtures/bees96x64.png
GUETZLI="python -m guetzli_tpu.cli"
fail=0

check_jpg() {
  python -c "
from PIL import Image
im = Image.open('$1'); im.load()
assert im.size == (96, 64), im.size
" || { echo "FAIL: $2"; fail=1; }
}

# Build a JPEG input from the PNG (the reference uses cjpeg).
python - <<EOF
from PIL import Image
Image.open("$PNG").save("$TMP/in.jpg", quality=90, subsampling=0)
EOF

$GUETZLI --quality 95 "$PNG" "$TMP/o1.jpg" 2>/dev/null && check_jpg "$TMP/o1.jpg" "png file->file"
$GUETZLI --verbose --quality 95 "$PNG" "$TMP/o2.jpg" 2>"$TMP/verbose.log" && check_jpg "$TMP/o2.jpg" "png verbose"
grep -q "Iter" "$TMP/verbose.log" || { echo "FAIL: verbose trace empty"; fail=1; }
$GUETZLI --quality 95 - "$TMP/o3.jpg" < "$PNG" 2>/dev/null && check_jpg "$TMP/o3.jpg" "png stdin"
$GUETZLI --quality 95 "$PNG" - > "$TMP/o4.jpg" 2>/dev/null && check_jpg "$TMP/o4.jpg" "png stdout"
$GUETZLI --quality 85 "$PNG" "$TMP/o5.jpg" 2>/dev/null && check_jpg "$TMP/o5.jpg" "quality 85"
$GUETZLI --nomemlimit --quality 95 "$PNG" "$TMP/o6.jpg" 2>/dev/null && check_jpg "$TMP/o6.jpg" "nomemlimit"
$GUETZLI --memlimit 100 --quality 95 "$PNG" "$TMP/o7.jpg" 2>/dev/null && check_jpg "$TMP/o7.jpg" "memlimit 100"
$GUETZLI --quality 95 "$TMP/in.jpg" "$TMP/o8.jpg" 2>/dev/null && check_jpg "$TMP/o8.jpg" "jpeg file->file"

# Invalid input must fail cleanly.
if $GUETZLI --quality 95 /dev/null "$TMP/bad.jpg" 2>/dev/null; then
  echo "FAIL: /dev/null input did not fail"; fail=1
fi

if [ "$fail" -eq 0 ]; then echo "smoke test OK"; else echo "smoke test FAILED"; fi
exit $fail
