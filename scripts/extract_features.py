#!/usr/bin/env python
"""Expert feature extraction — the Decoupled Compute layer.

Replaces the reference's extract_features_balanced.py /
extract_features_multi_gpu.py / extract_unified_kaggle.py family: runs the
frozen experts over LR/HR pairs (or fixed crops of them) and writes one
.npz cache per sample in the freqfusion_tpu cached format
(freqfusion_tpu/data/cached.py), enabling 10-20x faster fusion training.

Where the reference shards images across GPUs with mp.spawn
(extract_features_multi_gpu.py:300) and runs MambaIR on a different
*machine* (Kaggle) because its CUDA kernel doesn't build locally, here all
four experts run in one jitted program on the TPU — batch them and go.

    python scripts/extract_features.py --model-dir model_zoo/team29_FreqFusionSR \
        --lr-dir data/DF2K/train_LR --hr-dir data/DF2K/train_HR \
        --out-dir data/cache/train [--crops 5 --patch 64]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# Deterministic 5-crop positions (TL, TR, BL, BR, center), matching
# extract_unified_kaggle.py:10-13.
def _crop_positions(h, w, p):
    return [(0, 0), (0, w - p), (h - p, 0), (h - p, w - p),
            ((h - p) // 2, (w - p) // 2)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--lr-dir", required=True)
    ap.add_argument("--hr-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--crops", type=int, default=0,
                    help="0 = full images; N = N deterministic crops/image")
    ap.add_argument("--patch", type=int, default=64, help="LR crop size")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--start-idx", type=int, default=0)
    ap.add_argument("--end-idx", type=int, default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from freqfusion_tpu.data.dataset import find_pairs
    from freqfusion_tpu.interface.io import load_pipeline
    from freqfusion_tpu.ops.pad import pad_reflect
    from freqfusion_tpu.ops.resize import resize_bilinear
    from freqfusion_tpu.utils.image_io import read_image

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pipeline = load_pipeline(args.model_dir, scale=args.scale,
                             init_missing_fusion=False)

    pairs = find_pairs(args.lr_dir, args.hr_dir)
    pairs = pairs[args.start_idx : args.end_idx]
    print(f"extracting {len(pairs)} images "
          f"({args.crops or 'full'} crops each)")

    s = args.scale
    for idx, (lr_path, hr_path) in enumerate(pairs):
        t0 = time.perf_counter()
        lr = read_image(str(lr_path))
        hr = read_image(str(hr_path))[: lr.shape[0] * s, : lr.shape[1] * s]

        if args.crops:
            p = args.patch
            views = [(lr[t : t + p, l : l + p],
                      hr[t * s : (t + p) * s, l * s : (l + p) * s],
                      f"{lr_path.stem}_c{ci}")
                     for ci, (t, l) in enumerate(
                         _crop_positions(lr.shape[0], lr.shape[1], p)[: args.crops])]
        else:
            views = [(lr, hr, lr_path.stem)]

        for lr_v, hr_v, stem in views:
            h, w = lr_v.shape[:2]
            ph, pw = (16 - h % 16) % 16, (16 - w % 16) % 16
            lr_in = jnp.asarray(lr_v)[None]
            if ph or pw:
                lr_in = pad_reflect(lr_in, 0, ph, 0, pw)
            imgs, feats = pipeline.run_experts(lr_in)
            sample = {"lr": lr_v, "hr": hr_v}
            for name in imgs:
                sample[f"{name}_img"] = np.asarray(
                    imgs[name][0, : h * s, : w * s])
                f = feats[name]
                if f.shape[1] != lr_in.shape[1]:  # nafnet HR feature
                    f = resize_bilinear(f, h, w)
                else:
                    f = f[:, :h, :w]
                sample[f"{name}_feat"] = np.asarray(f[0], np.float16)
            np.savez_compressed(out / f"{stem}.npz", **sample)

        print(f"  [{idx + 1}/{len(pairs)}] {lr_path.stem} "
              f"({time.perf_counter() - t0:.2f}s)")


if __name__ == "__main__":
    main()
