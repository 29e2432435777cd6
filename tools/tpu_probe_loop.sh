#!/bin/bash
# Probe the tunneled TPU every ~15 min; the moment it answers, run the
# one-shot evidence capture (tools/tpu_capture.py) with a fresh prefix,
# then keep probing (a later window can re-capture with newer code).
# One TPU job at a time -- the capture tool is already sequential.
cd /root/repo
N=0
while true; do
  N=$((N+1))
  TS=$(date +%H:%M:%S)
  if timeout 300 python -c "import jax; d=jax.devices()[0]; assert d.platform not in ('', 'cpu'); import jax.numpy as jnp; assert float(jnp.ones((8,8)).sum())==64." >/dev/null 2>&1; then
    echo "[$TS] probe $N: TPU LIVE -- capturing"
    python tools/tpu_capture.py --skip-corpus --out /root/repo/tpu_r02c 2>&1 | tee -a /root/repo/tpu_capture.log
    echo "[$TS] capture done rc=$?"
    sleep 600
  else
    echo "[$TS] probe $N: down"
    sleep 900
  fi
done
