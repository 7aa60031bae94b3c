#!/bin/bash
# Round-5 battery part G: the rewritten token-attention kernel
# (transposed formulation, post-[F3] fix) and the one inconclusive
# part-E step. Approx scan is now the DEFAULT (commit 5966ee3), so the
# baseline these A/Bs compare against is 1.229 MP/s.
# Probe-gated per the part-C discipline: the standalone probe must PASS
# on the relay before any in-pipeline run.
set -x
LOG=${LOG:-/root/repo/MEASURE_r5g.log}

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
echo "=== $(date) [G0] token_attn standalone relay probe (rewritten kernel) ==="
probe && timeout 600 python /root/repo/scripts/probe_kernels_hw.py token_attn
echo "=== $(date) [G1] TOKEN_ATTN in-pipeline A/B (vs 1.229 approx-default baseline) ==="
probe && FREQFUSION_TOKEN_ATTN=1 B
echo "=== $(date) [G2] MLP fused in-pipeline A/B (E2 re-run, was relay-flap inconclusive) ==="
probe && FREQFUSION_MLP=1 B
echo "=== done $(date) ==="
} >> "$LOG" 2>&1
