#!/bin/bash
# Round-5 PRIORITIZED recovery battery. Supersedes measure_r4_fast.sh:
# same bank-the-anchor-first ordering, plus the three round-5 byte-floor
# kernels (NAFBLOCK / MLP / CAB — projected 362.6 -> 42.9 GB/img across
# NAFNet blocks + all FFNs + all CABs, see scripts/{nafblock,mlp,cab}_bytes.py).
# Ordering logic (the relay has died for 13+ hour stretches mid-run):
#   1. in-pipeline baseline                      <- the BENCH_r05 anchor
#   2. round-5 byte-floor kernels, one at a time <- largest projected wins
#   3. scan route A/B (v6, v5)                   <- v7 has never run on HW
#   4. r3/r4 gated kernels in-pipeline           <- flip decisions
#   5. best-combination run                      <- the number to ship
#   6. batch 2/4
#   7. trace + training receipt + approx@converted
#   8. standalone screening                      <- noisy, least critical
# Flip ONLY measured winners; revert losers; commit the log either way.
set -x
LOG=${LOG:-/root/repo/MEASURE_r5.log}

B() { timeout 2400 python /root/repo/bench.py 2>&1 | tail -4; }
{
echo "=== $(date) [1] baseline (defaults, all gates OFF) ==="
B
echo "=== [2a] NAFBLOCK fused in-pipeline ==="
FREQFUSION_NAFBLOCK=1 B
echo "=== [2b] MLP fused in-pipeline ==="
FREQFUSION_MLP=1 B
echo "=== [2c] CAB fused in-pipeline ==="
FREQFUSION_CAB=1 B
echo "=== [2d] all three round-5 kernels together ==="
FREQFUSION_NAFBLOCK=1 FREQFUSION_MLP=1 FREQFUSION_CAB=1 B
echo "=== [3a] scan=chainproj (v6) in-pipeline ==="
FREQFUSION_SCAN=chainproj B
echo "=== [3b] scan=chainv5 in-pipeline ==="
FREQFUSION_SCAN=chainv5 B
echo "=== [4a] ATTN_QKV in-pipeline ==="
FREQFUSION_ATTN_QKV=1 B
echo "=== [4b] GRL_QKV in-pipeline ==="
FREQFUSION_GRL_QKV=1 B
echo "=== [4c] TOKEN_ATTN in-pipeline ==="
FREQFUSION_TOKEN_ATTN=1 B
echo "=== [4d] DWCONV in-pipeline ==="
FREQFUSION_DWCONV=1 B
echo "=== [5] all candidate gates ON together (r5 + r3b winners) ==="
FREQFUSION_NAFBLOCK=1 FREQFUSION_MLP=1 FREQFUSION_CAB=1 \
  FREQFUSION_ATTN_QKV=1 FREQFUSION_GRL_QKV=1 FREQFUSION_TOKEN_ATTN=1 B
echo "=== [6a] batch=2 one-program pipeline ==="
BENCH_BATCH=2 B
echo "=== [6b] batch=4 one-program pipeline ==="
BENCH_BATCH=4 B
echo "=== [7a] full-pipeline trace (roofline stage walls) ==="
timeout 2400 python /root/repo/scripts/trace_pipeline.py 2>&1 | tail -40
echo "=== [7b] hardware training receipt (300 cached steps) ==="
timeout 2400 python /root/repo/scripts/train_receipt.py 2>&1 | tail -12
echo "=== [7c] approx-scan sensitivity at CONVERTED weights ==="
timeout 2400 python /root/repo/scripts/measure_scan_approx.py --converted \
  2>&1 | tail -8
echo "=== [8] standalone screening battery ==="
LOG=/root/repo/MEASURE_r3b.log bash /root/repo/scripts/measure_r3b.sh
echo "=== done $(date) ==="
} >> "$LOG" 2>&1
