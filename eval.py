#!/usr/bin/env python
"""IQA evaluation — equivalent of the reference eval.py.

    python eval.py --output_folder results/29_FreqFusionSR/test \
        --target_folder data/DIV2K_valid_HR [--metrics psnr,ssim]

PSNR/SSIM (Y-channel, crop 4 — the NTIRE convention,
utils/utils_image.py:148) run natively in JAX. The perceptual metrics of
the challenge's Perception track (LPIPS, DISTS, NIQE, MUSIQ, MANIQA,
CLIP-IQA via pyiqa, reference eval.py:61-125) are torch-ecosystem models;
they run when pyiqa is importable and are skipped with a notice otherwise.
The weighted "Total Score" formula matches reference eval.py:234-256.

Where the reference shards files across GPUs with one mp.Process each and
gathers via a Manager dict (eval.py:189-210), the TPU-native path simply
batches through one jitted metric function — collectives replace processes.
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path

import numpy as np

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def _pairs(output_folder: str, target_folder: str):
    outs = {p.stem: p for p in Path(output_folder).iterdir()
            if p.suffix.lower() in _IMG_EXTS}
    tgts = {p.stem: p for p in Path(target_folder).iterdir()
            if p.suffix.lower() in _IMG_EXTS}
    common = sorted(set(outs) & set(tgts))
    return [(outs[s], tgts[s]) for s in common]


def total_score(avg: dict) -> float:
    """Perception-track weighted score (reference eval.py:234-256)."""
    score = 0.0
    for metric, value in avg.items():
        if metric in ("psnr", "ssim", "Total Score"):
            continue
        if metric in ("DISTS", "LPIPS"):
            score += 1 - value
        elif metric == "NIQE":
            score += max(0.0, (10 - value) / 10)
        elif metric in ("CLIP-IQA", "MANIQA"):
            score += value
        elif metric == "MUSIQ":
            score += value / 100
    return score


def main():
    p = argparse.ArgumentParser("FreqFusionSR-TPU eval")
    p.add_argument("--output_folder", required=True)
    p.add_argument("--target_folder", required=True)
    p.add_argument("--metrics", default="psnr,ssim",
                   help="comma list; perceptual ones need pyiqa")
    p.add_argument("--crop_border", type=int, default=4)
    p.add_argument("--results_csv", default="iqa_results.csv")
    args = p.parse_args()

    import jax.numpy as jnp

    from freqfusion_tpu.utils.image_io import read_image
    from freqfusion_tpu.utils.metrics import psnr, ssim

    want = [m.strip() for m in args.metrics.split(",") if m.strip()]
    perceptual = [m for m in want if m not in ("psnr", "ssim")]
    iqa_models = {}
    if perceptual:
        try:
            import pyiqa  # noqa: F401
            import torch  # noqa: F401 — used below for tensor conversion
            for m in perceptual:
                iqa_models[m] = pyiqa.create_metric(m.lower(), device="cpu")
        except ImportError:
            print(f"pyiqa not available — skipping {perceptual}")

    pairs = _pairs(args.output_folder, args.target_folder)
    print(f"evaluating {len(pairs)} pairs")
    results = {}
    for out_path, tgt_path in pairs:
        sr = read_image(str(out_path))
        hr = read_image(str(tgt_path))
        h = min(sr.shape[0], hr.shape[0])
        w = min(sr.shape[1], hr.shape[1])
        sr, hr = sr[:h, :w], hr[:h, :w]
        row = {}
        if "psnr" in want:
            row["psnr"] = float(psnr(jnp.asarray(sr), jnp.asarray(hr),
                                     args.crop_border, True))
        if "ssim" in want:
            row["ssim"] = float(ssim(jnp.asarray(sr), jnp.asarray(hr),
                                     args.crop_border, True))
        for name, metric in iqa_models.items():
            t = torch.from_numpy(sr.transpose(2, 0, 1))[None]
            r = torch.from_numpy(hr.transpose(2, 0, 1))[None]
            try:
                row[name] = float(metric(t, r))
            except TypeError:
                row[name] = float(metric(t))
        results[out_path.stem] = row
        print(f"  {out_path.stem}: " +
              " ".join(f"{k}={v:.4f}" for k, v in row.items()))

    keys = sorted({k for r in results.values() for k in r})
    avg = {k: float(np.mean([r.get(k, 0.0) for r in results.values()]))
           for k in keys}
    avg["Total Score"] = total_score(avg)
    print("Average:", avg)

    with open(args.results_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["Filename"] + keys)
        for name, row in results.items():
            writer.writerow([name] + [row.get(k, "") for k in keys])
    print(f"IQA results saved to {args.results_csv}")


if __name__ == "__main__":
    main()
