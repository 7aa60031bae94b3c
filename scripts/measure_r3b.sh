#!/bin/bash
# Hardware A/B battery for the round-3b changes (run when the relay is up).
# Each line is one fresh-process in-model measurement; results append to
# $LOG. Expected ~40-60 min total (relay compiles dominate).
set -x
LOG=${LOG:-/root/repo/MEASURE_r3b.log}
T() { timeout 900 "$@" 2>&1 | grep -E "s/img|ms  |params" | head -20; }
{
echo "=== $(date) mamba v7 (default) ==="
T python scripts/trace_expert.py mamba --dtype bf16 --top 0
echo "=== mamba v6 fused-dot (chainproj) ==="
FREQFUSION_SCAN=chainproj T python scripts/trace_expert.py mamba --dtype bf16 --top 0
echo "=== mamba v5 (chainv5) ==="
FREQFUSION_SCAN=chainv5 T python scripts/trace_expert.py mamba --dtype bf16 --top 0
echo "=== drct conv1x1-dot (default) ==="
T python scripts/trace_expert.py drct --dtype bf16 --top 0
echo "=== drct conv1x1=conv (old) ==="
FREQFUSION_CONV1X1=conv T python scripts/trace_expert.py drct --dtype bf16 --top 0
echo "=== drct qkv+proj in-kernel (FREQFUSION_ATTN_QKV=1) ==="
FREQFUSION_ATTN_QKV=1 T python scripts/trace_expert.py drct --dtype bf16 --top 0
echo "=== nafnet conv1x1-dot (default) ==="
T python scripts/trace_expert.py nafnet --dtype bf16 --top 0
echo "=== nafnet conv1x1=conv (old) ==="
FREQFUSION_CONV1X1=conv T python scripts/trace_expert.py nafnet --dtype bf16 --top 0
echo "=== nafnet dwconv stencil (FREQFUSION_DWCONV=1) ==="
FREQFUSION_DWCONV=1 T python scripts/trace_expert.py nafnet --dtype bf16 --top 0
echo "=== mamba dwconv stencil (FREQFUSION_DWCONV=1) ==="
FREQFUSION_DWCONV=1 T python scripts/trace_expert.py mamba --dtype bf16 --top 0
echo "=== grl avg_pool reduce-window (default) ==="
T python scripts/trace_expert.py grl --dtype bf16 --top 0
echo "=== grl pool2x2=reshape (old) ==="
FREQFUSION_POOL2X2=reshape T python scripts/trace_expert.py grl --dtype bf16 --top 0
echo "=== grl qkv in-kernel (FREQFUSION_GRL_QKV=1) ==="
FREQFUSION_GRL_QKV=1 T python scripts/trace_expert.py grl --dtype bf16 --top 0
echo "=== fusion net (softmax dtype + conv1x1) ==="
T python scripts/trace_fusion.py --dtype bf16 --top 0
echo "=== fusion net + token-attn kernel (FREQFUSION_TOKEN_ATTN=1) ==="
FREQFUSION_TOKEN_ATTN=1 T python scripts/trace_fusion.py --dtype bf16 --top 0
echo "=== full pipeline bench ==="
timeout 1800 python bench.py 2>&1 | tail -5
echo "=== done $(date) ==="
} >> "$LOG" 2>&1
