#!/bin/bash
# Golden regression test, mirroring the reference's tests/golden_test.sh.
# The reference compares bit-exact sha256 over a downloaded corpus; float
# TPU kernels can't promise bit-exactness, so this asserts the BASELINE
# semantics instead: output size within 2.5% of the reference encoder's
# output for the same (image, quality), and output decodes. All encodes
# share one process (XLA jit caches).
set -u
cd "$(dirname "$0")/.."
exec python tests/golden_test.py
