#!/usr/bin/env python
"""Validation: run the pipeline over an LR folder and score against HR.

Inference + NTIRE-convention metrics in one pass (the reference splits
this across test.py and eval.py).

    python scripts/validate.py --model-dir model_zoo/team29_FreqFusionSR \
        --lr-dir dataset/DIV2K_valid_LR --hr-dir dataset/DIV2K_valid_HR \
        [--save-dir results/val]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--lr-dir", required=True)
    ap.add_argument("--hr-dir", required=True)
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--crop-border", type=int, default=4)
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from freqfusion_tpu.data.dataset import find_pairs
    from freqfusion_tpu.interface.io import load_pipeline
    from freqfusion_tpu.utils.image_io import read_image, write_image
    from freqfusion_tpu.utils.metrics import MetricAccumulator, psnr, ssim

    pipeline = load_pipeline(args.model_dir, scale=args.scale)
    pairs = find_pairs(args.lr_dir, args.hr_dir)
    print(f"validating {len(pairs)} pairs")

    save_dir = Path(args.save_dir) if args.save_dir else None
    if save_dir:
        save_dir.mkdir(parents=True, exist_ok=True)

    acc = MetricAccumulator()
    for i, (lr_path, hr_path) in enumerate(pairs):
        t0 = time.perf_counter()
        lr = read_image(str(lr_path))
        hr = read_image(str(hr_path))
        sr = np.asarray(pipeline(jnp.asarray(lr)[None])[0])
        h = min(sr.shape[0], hr.shape[0])
        w = min(sr.shape[1], hr.shape[1])
        p = float(psnr(jnp.asarray(sr[:h, :w]), jnp.asarray(hr[:h, :w]),
                       args.crop_border, True))
        s = float(ssim(jnp.asarray(sr[:h, :w]), jnp.asarray(hr[:h, :w]),
                       args.crop_border, True))
        acc.update(psnr=p, ssim=s)
        if save_dir:
            write_image(str(save_dir / f"{lr_path.stem}.png"), sr)
        print(f"  [{i + 1}/{len(pairs)}] {lr_path.stem}: "
              f"psnr={p:.2f} ssim={s:.4f} ({time.perf_counter() - t0:.2f}s)")

    avg = acc.averages()
    print(f"AVERAGE: psnr={avg.get('psnr', 0):.3f} "
          f"ssim={avg.get('ssim', 0):.4f}")


if __name__ == "__main__":
    main()
