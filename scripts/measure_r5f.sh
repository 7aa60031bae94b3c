#!/bin/bash
# Round-5 battery part F (final): batch-scaling row (VERDICT r4 item 6)
# and a trace of the shipping config for roofline v4 (item 7). The
# TOKEN_ATTN failure diagnosis runs LAST with full stderr capture — if
# its compile wedges the relay it must not poison the useful steps.
# Probe-gated like parts C/E.
set -x
LOG=${LOG:-/root/repo/MEASURE_r5f.log}

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
{
echo "=== $(date) [F0] approx chain-init scan in-pipeline A/B (D2: 61.15 dB @ converted, -18.6% on MambaIR standalone) ==="
probe && FREQFUSION_SCAN_APPROX=1 B
echo "=== $(date) [F1] batch=2 (amortization row) ==="
probe && BENCH_BATCH=2 B
echo "=== $(date) [F2] trace of the shipping config ==="
probe && timeout 1800 python /root/repo/scripts/trace_pipeline.py --top 40
echo "=== $(date) [F3] TOKEN_ATTN diagnosis (full traceback this time) ==="
probe && FREQFUSION_TOKEN_ATTN=1 timeout 1800 python /root/repo/bench.py \
  > /tmp/f3_token.log 2>&1
tail -40 /tmp/f3_token.log
echo "=== done $(date) ==="
} >> "$LOG" 2>&1
