#!/bin/bash
# Round-5 battery part C: the six stencil-rewritten halo kernels
# (commit 4d3a3c7) + the eval-only fusion kernels + combos + the
# re-runs that part B lost to the GRL_QKV wedge. Run AFTER
# measure_r5b.sh completes. Standalone per-kernel hardware probes run
# first; an in-pipeline A/B is attempted ONLY if its kernel's probe
# printed PASS — a kernel the production Mosaic toolchain rejects
# manifests as a relay-wedging hang (see BENCH_NOTES round-5), and the
# probe-gate keeps one bad kernel from burning two recovery windows.
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

B() { timeout 1800 python /root/repo/bench.py 2>&1 | tail -3; }
ok() { grep -q "^$1: PASS" /tmp/probe_c0.txt; }
{
echo "=== $(date) [C0] standalone kernel probes (stencil rewrite) ==="
probe && timeout 3600 python /root/repo/scripts/probe_kernels_hw.py \
  nafblock mlp cab dwconv hier edge lka 2>&1 | tee /tmp/probe_c0.txt
echo "=== $(date) [C1] NAFBLOCK fused in-pipeline ==="
ok nafblock && probe && FREQFUSION_NAFBLOCK=1 B
echo "=== $(date) [C2] MLP fused in-pipeline ==="
ok mlp && probe && FREQFUSION_MLP=1 B
echo "=== $(date) [C3] CAB fused in-pipeline ==="
ok cab && probe && FREQFUSION_CAB=1 B
echo "=== $(date) [C4] DWCONV in-pipeline ==="
ok dwconv && probe && FREQFUSION_DWCONV=1 B
echo "=== $(date) [C5] HIER fused in-pipeline (eval-only) ==="
ok hier && probe && FREQFUSION_HIER=1 B
echo "=== $(date) [C6] EDGE fused in-pipeline (eval-only) ==="
ok edge && probe && FREQFUSION_EDGE=1 B
echo "=== $(date) [C7] LKA fused in-pipeline (eval-only) ==="
ok lka && probe && FREQFUSION_LKA=1 B
echo "=== $(date) [C8] TOKEN_ATTN re-run (B5 was a spurious RELAY_DOWN) ==="
probe && FREQFUSION_TOKEN_ATTN=1 B
echo "=== $(date) [C9] scan=chainproj (v6) re-run (B1 was corrupted) ==="
probe && FREQFUSION_SCAN=chainproj B
echo "=== done $(date) ==="
} >> "$LOG" 2>&1
