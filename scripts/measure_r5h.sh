#!/bin/bash
# Round-5 battery part H: the lane-aligned token-attention kernel
# (biases pre-broadcast to [., pb]; no extent-1/unaligned sublane
# slices — the [G0] probe abort's suspects, MEASURE_r5g.log).
# Part G's bug: G1 ran the in-pipeline A/B even though G0's standalone
# probe FAILED (the `probe &&` guard only gates on relay health).
# Here the in-pipeline step is gated on the standalone probe PASSing.
set -x
LOG=${LOG:-/root/repo/MEASURE_r5h.log}

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
echo "=== $(date) [H0] token_attn standalone relay probe (lane-aligned kernel) ==="
probe || exit 1
timeout 600 python /root/repo/scripts/probe_kernels_hw.py token_attn | tee /tmp/h0.out
if grep -q "token_attn: PASS" /tmp/h0.out; then
  echo "=== $(date) [H1] TOKEN_ATTN in-pipeline A/B (baseline 1.229/1.258 approx-default band) ==="
  probe && FREQFUSION_TOKEN_ATTN=1 B
else
  echo "[H1] SKIPPED: standalone probe did not PASS"
fi
echo "=== done $(date) ==="
} >> "$LOG" 2>&1
