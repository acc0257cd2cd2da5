#!/bin/bash
# One-shot TPU revalidation (run on the tunneled chip after kernel/loss
# changes, and at round end): kernel goldens, the driver's bench metric,
# the BASELINE training configs, and the int8 serving comparison.
# Numbers land in PERF.md by hand after review.
set -ex
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:$PWD
# Tunnel probe: a down tunnel blocks backend init FOREVER, so the probe
# must be killed by timeout; set -e then stops the script (exit 124)
# instead of running five benchmarks against a dead tunnel.
timeout 90 python - <<'PY'
import time, jax, jax.numpy as jnp
t0=time.time(); x=jnp.ones((1024,1024),jnp.bfloat16)
(x@x).block_until_ready(); print("probe ok", time.time()-t0)
PY
python benchmarks/tpu_goldens.py                       # kernel goldens + timing
python bench.py                                        # driver metric
python -m depthvo_tpu.cli bench --mode depth_infer --batch-size 128 --steps 20
python -m depthvo_tpu.cli bench --mode depth_infer --batch-size 128 --steps 20 --int8
python -m depthvo_tpu.cli bench --mode train_step_scan --batch-size 4 --steps 24
python benchmarks/run_all.py --configs 3,4
