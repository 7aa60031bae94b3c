#!/usr/bin/env python
"""Training monitor: tail the JSONL metric log with ETA.

Stdlib-only, like the reference's scripts/monitor_training.py dashboard.

    python scripts/monitor_training.py checkpoints/default/train_log.jsonl
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path


def summarize(records, total_epochs=150):
    if not records:
        print("no records yet")
        return
    last = records[-1]
    epoch = int(last.get("epoch", 0))
    losses = [r.get("train/loss") for r in records if "train/loss" in r]
    psnrs = [r.get("val/psnr") for r in records if "val/psnr" in r]
    times = [r["time"] for r in records]
    per_epoch = ((times[-1] - times[0]) / max(len(times) - 1, 1)
                 if len(times) > 1 else 0.0)
    eta = per_epoch * max(total_epochs - epoch - 1, 0)
    print(f"epoch {epoch}/{total_epochs} | "
          f"loss {losses[-1]:.4f} (min {min(losses):.4f}) | "
          + (f"psnr {psnrs[-1]:.2f} (best {max(psnrs):.2f}) | " if psnrs else "")
          + f"{per_epoch:.0f}s/epoch | ETA {eta / 3600:.1f}h")


def main():
    path = Path(sys.argv[1] if len(sys.argv) > 1
                else "checkpoints/default/train_log.jsonl")
    total = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    while True:
        if path.exists():
            records = [json.loads(line)
                       for line in path.read_text().splitlines() if line.strip()]
            summarize(records, total)
        else:
            print(f"waiting for {path} ...")
        try:
            time.sleep(30)
        except KeyboardInterrupt:
            break


if __name__ == "__main__":
    main()
