#!/usr/bin/env python
"""Offline torch-checkpoint -> native msgpack converter.

One-time tool: converts the reference's five .pth files into the native
.ckpt format the interface loads fastest (freqfusion_tpu/interface/io.py
falls back to on-the-fly conversion when these are absent).

    python scripts/convert_checkpoints.py --model-dir model_zoo/team29_FreqFusionSR
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    from flax import serialization

    from freqfusion_tpu.interface.io import _TORCH_FILES, _convert_torch

    mdir = Path(args.model_dir)
    odir = Path(args.out_dir or args.model_dir)
    odir.mkdir(parents=True, exist_ok=True)

    for name, fname in _TORCH_FILES.items():
        src = mdir / fname
        if not src.exists():
            print(f"skip {name}: {fname} not found")
            continue
        params, _ = _convert_torch(name, str(src))
        data = serialization.msgpack_serialize(
            __import__("jax").tree_util.tree_map(
                lambda x: __import__("numpy").asarray(x), params))
        dst = odir / f"{name}.ckpt"
        with open(dst, "wb") as f:
            f.write(data)
        print(f"converted {fname} -> {dst} ({dst.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
