#!/bin/bash
# Round-5 manual A/B battery, part B — the steps UNAFFECTED by the
# halo-DMA relay-compile bug (see ops/halo.py): scan routes, the qkv /
# token-attention kernels (BlockSpec-pipelined, no manual halo DMA),
# and the batch sweep. Probes relay health between steps and waits out
# post-hang recovery windows so one bad step can't corrupt the next
# step's record (the failure mode that corrupted measure_r5.sh [2c]-[3b]).
set -x
LOG=${LOG:-/root/repo/MEASURE_r5b.log}

probe() {  # wait until a trivial jit executes (worker may be restarting)
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
echo "=== $(date) [B1] scan=chainproj (v6) in-pipeline ==="
probe && FREQFUSION_SCAN=chainproj B
echo "=== $(date) [B2] scan=chainv5 in-pipeline ==="
probe && FREQFUSION_SCAN=chainv5 B
echo "=== $(date) [B3] ATTN_QKV in-pipeline ==="
probe && FREQFUSION_ATTN_QKV=1 B
echo "=== $(date) [B4] GRL_QKV in-pipeline ==="
probe && FREQFUSION_GRL_QKV=1 B
echo "=== $(date) [B5] TOKEN_ATTN in-pipeline ==="
probe && FREQFUSION_TOKEN_ATTN=1 B
echo "=== $(date) [B6] qkv+token combined ==="
probe && FREQFUSION_ATTN_QKV=1 FREQFUSION_GRL_QKV=1 FREQFUSION_TOKEN_ATTN=1 B
echo "=== $(date) [B7] batch=2 ==="
probe && BENCH_BATCH=2 B
echo "=== $(date) [B8] batch=4 ==="
probe && BENCH_BATCH=4 B
echo "=== done $(date) ==="
} >> "$LOG" 2>&1
