#!/bin/bash
set -u
cd "$(dirname "$0")/.."
timeout 4000 python bench.py > tpu_r05_bench_final6.json 2> tpu_r05_bench_final6.log
echo "rc=$? $(tail -c 200 tpu_r05_bench_final6.json)" >&2
