#!/bin/bash
# Round-4 PRIORITIZED recovery battery: same coverage as measure_r4.sh but
# ordered so the highest-value receipts bank first if the relay dies again
# mid-run (it has gone down for 13+ hour stretches):
#   1. in-pipeline baseline (v7 scan default)      <- the BENCH_r04 anchor
#   2. scan route A/B (v6, v5)                      <- v7 has never run on HW
#   3. each gated kernel in-pipeline                <- flip decisions
#   4. batch 2/4 one-program                        <- VERDICT item 8
#   5. trace + training receipt + approx@converted  <- Phase C receipts
#   6. standalone screening (measure_r3b.sh)        <- noisy, least critical
# Each step is timeout-bounded; results append to $LOG as they land.
set -x
LOG=${LOG:-/root/repo/MEASURE_r4.log}

B() { timeout 2400 python /root/repo/bench.py 2>&1 | tail -4; }
{
echo "=== $(date) [1] baseline (v7 scan default, all gates OFF) ==="
B
echo "=== [2a] scan=chainproj (v6) in-pipeline ==="
FREQFUSION_SCAN=chainproj B
echo "=== [2b] scan=chainv5 in-pipeline ==="
FREQFUSION_SCAN=chainv5 B
echo "=== [3a] ATTN_QKV in-pipeline ==="
FREQFUSION_ATTN_QKV=1 B
echo "=== [3b] GRL_QKV in-pipeline ==="
FREQFUSION_GRL_QKV=1 B
echo "=== [3c] TOKEN_ATTN in-pipeline ==="
FREQFUSION_TOKEN_ATTN=1 B
echo "=== [3d] DWCONV in-pipeline ==="
FREQFUSION_DWCONV=1 B
echo "=== [3e] all candidate gates ON together ==="
FREQFUSION_ATTN_QKV=1 FREQFUSION_GRL_QKV=1 FREQFUSION_TOKEN_ATTN=1 \
  FREQFUSION_DWCONV=1 B
echo "=== [4a] batch=2 one-program pipeline ==="
BENCH_BATCH=2 B
echo "=== [4b] batch=4 one-program pipeline ==="
BENCH_BATCH=4 B
echo "=== [5a] full-pipeline trace (roofline stage walls) ==="
timeout 2400 python /root/repo/scripts/trace_pipeline.py 2>&1 | tail -40
echo "=== [5b] hardware training receipt (300 cached steps) ==="
timeout 2400 python /root/repo/scripts/train_receipt.py 2>&1 | tail -12
echo "=== [5c] approx-scan sensitivity at CONVERTED weights ==="
timeout 2400 python /root/repo/scripts/measure_scan_approx.py --converted \
  2>&1 | tail -8
echo "=== [6] standalone screening battery ==="
LOG=/root/repo/MEASURE_r3b.log bash /root/repo/scripts/measure_r3b.sh
echo "=== done $(date) ==="
} >> "$LOG" 2>&1
