#!/bin/bash
# Round-5 battery part E: in-pipeline A/Bs for the kernels fixed for the
# production Mosaic toolchain (commit ab69a0b: erf-free gelu + legal pool
# blockspecs), gated on the fresh standalone probes in /tmp/probe_c1.txt;
# then the part-B re-runs (TOKEN_ATTN, v6) and part D's receipts
# (training receipt, approx@converted, trace refresh). Probe-gated and
# health-probed between steps — see measure_r5c.sh for the rationale.
set -x
LOG=${LOG:-/root/repo/MEASURE_r5e.log}

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

B() { timeout 1800 python /root/repo/bench.py 2>&1 | tail -3; }
ok() { grep -q "^$1: PASS" /tmp/probe_c1.txt; }
{
echo "=== $(date) [E0] re-probe cab after the 8M budget calibration ==="
probe && timeout 600 python /root/repo/scripts/probe_kernels_hw.py cab \
  2>&1 | tee -a /tmp/probe_c1.txt
echo "=== $(date) [E1] NAFBLOCK fused in-pipeline ==="
ok nafblock && probe && FREQFUSION_NAFBLOCK=1 B
echo "=== $(date) [E2] MLP fused in-pipeline ==="
ok mlp && probe && FREQFUSION_MLP=1 B
echo "=== $(date) [E3] CAB fused in-pipeline ==="
ok cab && probe && FREQFUSION_CAB=1 B
echo "=== $(date) [E4] DWCONV in-pipeline (C4 lost to session end) ==="
probe && FREQFUSION_DWCONV=1 B
echo "=== $(date) [E5] HIER fused in-pipeline (eval-only) ==="
ok hier && probe && FREQFUSION_HIER=1 B
echo "=== $(date) [E6] EDGE fused in-pipeline (eval-only) ==="
ok edge && probe && FREQFUSION_EDGE=1 B
echo "=== $(date) [E7] LKA fused in-pipeline (eval-only) ==="
ok lka && probe && FREQFUSION_LKA=1 B
echo "=== $(date) [E8] TOKEN_ATTN re-run (B5 was a spurious RELAY_DOWN) ==="
probe && FREQFUSION_TOKEN_ATTN=1 B
echo "=== $(date) [E9] scan=chainproj (v6) re-run (B1 was corrupted) ==="
probe && FREQFUSION_SCAN=chainproj B
echo "=== $(date) [D1] hardware training receipt (300 cached steps) ==="
probe && timeout 2400 python /root/repo/scripts/train_receipt.py --steps 300
echo "=== $(date) [D2] approx chain scan @ converted weights, hw ==="
probe && timeout 2400 python /root/repo/scripts/measure_scan_approx.py --converted
echo "=== done $(date) ==="
} >> "$LOG" 2>&1
