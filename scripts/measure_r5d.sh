#!/bin/bash
# Round-5 battery part D: the remaining hardware receipts (VERDICT r4
# item 6/7) — training receipt, approx-scan@converted-weights, and the
# full-pipeline trace that refreshes roofline walls. Run AFTER
# measure_r5c.sh. Relay-health probes between steps (see measure_r5b.sh
# for the rationale).
set -x
LOG=${LOG:-/root/repo/MEASURE_r5d.log}

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

{
echo "=== $(date) [D1] hardware training receipt (300 cached steps) ==="
probe && timeout 2400 python /root/repo/scripts/train_receipt.py --steps 300
echo "=== $(date) [D2] approx chain scan @ converted weights, hw ==="
probe && timeout 2400 python /root/repo/scripts/measure_scan_approx.py --converted
echo "=== $(date) [D3] full-pipeline trace (roofline walls refresh) ==="
probe && timeout 2400 python /root/repo/scripts/trace_pipeline.py --dtype bf16 --top 40
echo "=== done $(date) ==="
} >> "$LOG" 2>&1
