#!/bin/bash
# Poll the TPU tunnel with a 90s-timeout sanity matmul; when it answers,
# fire tools/tpu_runbook.sh once and exit. Status in runbook_out/poller.status.
set -u
cd "$(dirname "$0")/.."
mkdir -p runbook_out
while true; do
  if timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, numpy as np
x = jax.numpy.ones((256, 256), dtype=jax.numpy.bfloat16)
np.asarray(x @ x)
EOF
  then
    echo "UP $(date -u +%Y%m%dT%H%M%SZ) — firing runbook" > runbook_out/poller.status
    bash tools/tpu_runbook.sh
    echo "RUNBOOK_FIRED $(date -u +%Y%m%dT%H%M%SZ)" >> runbook_out/poller.status
    exit 0
  fi
  echo "DOWN $(date -u +%Y%m%dT%H%M%SZ)" > runbook_out/poller.status
  sleep 120
done
