#!/bin/bash
# Round-5 battery part C: the six stencil-rewritten halo kernels
# (commit 4d3a3c7) + the eval-only fusion kernels + combos + the
# remaining receipts. Run AFTER measure_r5b.sh completes. Standalone
# per-kernel hardware probes first (cheap fail-fast attribution), then
# in-pipeline A/Bs with relay-health probes between steps.
set -x
LOG=${LOG:-/root/repo/MEASURE_r5c.log}

probe() {
  for i in $(seq 1 20); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jax.jit(lambda a: a*2)(jnp.ones((8,8))))))" >/dev/null 2>&1; then
      echo "relay alive (attempt $i)"; return 0
    fi
    echo "relay wedged (attempt $i), waiting 30s"; sleep 30
  done
  echo "RELAY UNREACHABLE"; return 1
}

B() { timeout 1500 python /root/repo/bench.py 2>&1 | tail -3; }
{
echo "=== $(date) [C0] standalone kernel probes (stencil rewrite) ==="
probe && timeout 1200 python /root/repo/scripts/probe_kernels_hw.py \
  nafblock mlp dwconv hier edge lka
echo "=== $(date) [C1] NAFBLOCK fused in-pipeline ==="
probe && FREQFUSION_NAFBLOCK=1 B
echo "=== $(date) [C2] MLP fused in-pipeline ==="
probe && FREQFUSION_MLP=1 B
echo "=== $(date) [C3] CAB fused in-pipeline ==="
probe && FREQFUSION_CAB=1 B
echo "=== $(date) [C4] DWCONV in-pipeline ==="
probe && FREQFUSION_DWCONV=1 B
echo "=== $(date) [C5] HIER fused in-pipeline (eval-only) ==="
probe && FREQFUSION_HIER=1 B
echo "=== $(date) [C6] EDGE fused in-pipeline (eval-only) ==="
probe && FREQFUSION_EDGE=1 B
echo "=== $(date) [C7] LKA fused in-pipeline (eval-only) ==="
probe && FREQFUSION_LKA=1 B
echo "=== $(date) [C8] all byte-floor kernels together ==="
probe && FREQFUSION_NAFBLOCK=1 FREQFUSION_MLP=1 FREQFUSION_CAB=1 \
  FREQFUSION_HIER=1 FREQFUSION_EDGE=1 FREQFUSION_LKA=1 B
echo "=== $(date) [C9] scan=chainproj (v6) re-run (B1 was corrupted) ==="
probe && FREQFUSION_SCAN=chainproj B
echo "=== done $(date) ==="
} >> "$LOG" 2>&1
