#!/bin/bash
# Smoke test, mirroring the reference's tests/smoke_test.sh: the
# {png,jpeg} x {file,stdin} x {file,stdout} x flags matrix. All cases run
# inside one Python process (tests/smoke_test.py) so XLA jit caches are
# shared -- per-process compilation costs minutes on remote-compile TPU
# deployments.
set -u
cd "$(dirname "$0")/.."
exec python tests/smoke_test.py
