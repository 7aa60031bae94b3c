#!/bin/bash
# Round-4 relay-recovery battery (VERDICT r3 item 1): standalone
# screening first (measure_r3b.sh), then IN-PIPELINE confirmation of each
# candidate through bench.py (the full one-program pipeline — standalone
# walls through the relay are noisy, CLAUDE.md), then the batch-2/4
# one-program measurement (item 8). Results append to $LOG / $LOG_R3B.
set -x
LOG=${LOG:-/root/repo/MEASURE_r4.log}
LOG_R3B=${LOG_R3B:-/root/repo/MEASURE_r3b.log}

# Phase A: standalone screening battery (expert walls + per-route traces)
LOG="$LOG_R3B" bash /root/repo/scripts/measure_r3b.sh

# Phase B: in-pipeline A/B — bench.py IS the full pipeline; one line each.
B() { timeout 1800 python /root/repo/bench.py 2>&1 | tail -3; }
{
echo "=== $(date) baseline (v7 scan default, all gates OFF) ==="
B
echo "=== scan=chainproj (v6) in-pipeline ==="
FREQFUSION_SCAN=chainproj B
echo "=== scan=chainv5 in-pipeline ==="
FREQFUSION_SCAN=chainv5 B
echo "=== ATTN_QKV in-pipeline ==="
FREQFUSION_ATTN_QKV=1 B
echo "=== GRL_QKV in-pipeline ==="
FREQFUSION_GRL_QKV=1 B
echo "=== TOKEN_ATTN in-pipeline ==="
FREQFUSION_TOKEN_ATTN=1 B
echo "=== DWCONV in-pipeline ==="
FREQFUSION_DWCONV=1 B
echo "=== all candidate gates ON together ==="
FREQFUSION_ATTN_QKV=1 FREQFUSION_GRL_QKV=1 FREQFUSION_TOKEN_ATTN=1 \
  FREQFUSION_DWCONV=1 B
echo "=== batch=2 one-program pipeline ==="
BENCH_BATCH=2 B
echo "=== batch=4 one-program pipeline ==="
BENCH_BATCH=4 B

# Phase C: roofline trace refresh + hardware training receipt
echo "=== full-pipeline trace (roofline stage walls) ==="
timeout 1800 python /root/repo/scripts/trace_pipeline.py 2>&1 | tail -40
echo "=== hardware training receipt (300 cached steps) ==="
timeout 1800 python /root/repo/scripts/train_receipt.py 2>&1 | tail -12
echo "=== approx-scan sensitivity at CONVERTED weights (VERDICT item 7) ==="
timeout 1800 python /root/repo/scripts/measure_scan_approx.py --converted \
  2>&1 | tail -8
echo "=== done $(date) ==="
} >> "$LOG" 2>&1
