#!/usr/bin/env python
"""8x geometric TTA expert-feature cache for the test set.

Replaces the reference's extract_test_tta_cache.py: every test LR image is
expanded into its 8 dihedral variants (hflip x rot90k,
extract_test_tta_cache.py:14-17), run through all four experts, and cached.
A later fusion-only pass (generate_fast_submission.py) then produces full
8x-TTA submissions in seconds.

    python scripts/extract_tta_cache.py --model-dir model_zoo/team29_FreqFusionSR \
        --lr-dir data/DIV2K_test_LR --out-dir data/cache/test_tta
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The 8 dihedral variants: (hflip, rot_k)
TTA_VARIANTS = [(f, k) for f in (False, True) for k in range(4)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--lr-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()

    import jax.numpy as jnp

    from freqfusion_tpu.data.augment import apply_geometry
    from freqfusion_tpu.interface.io import load_pipeline
    from freqfusion_tpu.ops.pad import pad_reflect
    from freqfusion_tpu.ops.resize import resize_bilinear
    from freqfusion_tpu.utils.image_io import read_image

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pipeline = load_pipeline(args.model_dir, scale=args.scale,
                             init_missing_fusion=False)
    s = args.scale

    files = sorted(p for p in Path(args.lr_dir).iterdir()
                   if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".bmp"))
    print(f"TTA extraction: {len(files)} images x {len(TTA_VARIANTS)} variants")

    for idx, path in enumerate(files):
        t0 = time.perf_counter()
        lr0 = read_image(str(path))
        for vi, (hflip, rot_k) in enumerate(TTA_VARIANTS):
            lr = apply_geometry(lr0, hflip, False, rot_k)
            h, w = lr.shape[:2]
            ph, pw = (16 - h % 16) % 16, (16 - w % 16) % 16
            lr_in = jnp.asarray(lr)[None]
            if ph or pw:
                lr_in = pad_reflect(lr_in, 0, ph, 0, pw)
            imgs, feats = pipeline.run_experts(lr_in)
            sample = {"lr": lr, "tta_hflip": np.asarray(hflip),
                      "tta_rot_k": np.asarray(rot_k)}
            for name in imgs:
                sample[f"{name}_img"] = np.asarray(
                    imgs[name][0, : h * s, : w * s], np.float16)
                f = feats[name]
                if f.shape[1] != lr_in.shape[1]:
                    f = resize_bilinear(f, h, w)
                else:
                    f = f[:, :h, :w]
                sample[f"{name}_feat"] = np.asarray(f[0], np.float16)
            np.savez_compressed(out / f"{path.stem}_tta{vi}.npz", **sample)
        print(f"  [{idx + 1}/{len(files)}] {path.stem} "
              f"({time.perf_counter() - t0:.2f}s)")


if __name__ == "__main__":
    main()
