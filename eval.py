#!/usr/bin/env python
"""IQA evaluation — equivalent of the reference eval.py.

    python eval.py --output_folder results/29_FreqFusionSR/test \
        --target_folder data/DIV2K_valid_HR \
        [--metrics psnr,ssim,niqe,lpips] \
        [--niqe_params niqe_params.npz] [--lpips_weights lpips_vgg.npz]

PSNR/SSIM (Y-channel, crop 4 — the NTIRE convention,
utils/utils_image.py:148) run natively in JAX, batched per shape bucket:
where the reference shards files across GPUs with one mp.Process each and
gathers via a Manager dict (eval.py:189-210), here each bucket is ONE
jitted program over a batch axis.

Perceptual metrics: NIQE is implemented natively (utils/niqe.py) and
needs a pristine model (--niqe_params .npz/.mat, or --niqe_fit_folder to
fit one); LPIPS-vgg is implemented natively (utils/lpips.py) and needs
converted weights (--lpips_weights). DISTS/MUSIQ/MANIQA/CLIP-IQA remain
pyiqa-gated (reference eval.py:61-125) and are skipped with a notice when
pyiqa is absent. The weighted "Total Score" formula matches reference
eval.py:234-256. Metrics that failed or are unavailable are excluded from
averages — never zero-filled.
"""

from __future__ import annotations

import argparse
import csv
from collections import defaultdict
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


def evaluate_pairs(pairs, want, crop_border=4, niqe_model=None,
                   lpips_params=None, iqa_models=None, batch=8,
                   dists_params=None):
    """Batched evaluation. Returns {stem: {metric: value}}."""
    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.utils.image_io import read_image
    from freqfusion_tpu.utils.metrics import psnr_ssim_per_image

    iqa_models = iqa_models or {}
    results: dict = {}

    # Load once, bucket by shape so each bucket is one jitted program.
    buckets = defaultdict(list)
    for out_path, tgt_path in pairs:
        sr = read_image(str(out_path))
        hr = read_image(str(tgt_path))
        h = min(sr.shape[0], hr.shape[0])
        w = min(sr.shape[1], hr.shape[1])
        sr, hr = sr[:h, :w], hr[:h, :w]
        buckets[(h, w)].append((out_path.stem, sr, hr))
        results[out_path.stem] = {}

    ps_fn = jax.jit(lambda a, b: psnr_ssim_per_image(a, b, crop_border, True))
    lp_fn = None
    if lpips_params is not None and "lpips" in want:
        from freqfusion_tpu.utils.lpips import lpips_forward
        lp_fn = jax.jit(lambda a, b: lpips_forward(lpips_params, a, b))
    ds_fn = None
    if dists_params is not None and "dists" in want:
        from freqfusion_tpu.utils.dists import dists_forward
        ds_fn = jax.jit(lambda a, b: dists_forward(dists_params, a, b))

    for (h, w), items in sorted(buckets.items()):
        for i in range(0, len(items), batch):
            chunk = items[i: i + batch]
            srs = jnp.asarray(np.stack([c[1] for c in chunk]))
            hrs = jnp.asarray(np.stack([c[2] for c in chunk]))
            if "psnr" in want or "ssim" in want:
                p, s = ps_fn(srs, hrs)
                p, s = np.asarray(p), np.asarray(s)
                for j, (stem, _, _) in enumerate(chunk):
                    if "psnr" in want:
                        results[stem]["psnr"] = float(p[j])
                    if "ssim" in want:
                        results[stem]["ssim"] = float(s[j])
            if lp_fn is not None:
                d = np.asarray(lp_fn(srs, hrs))
                for j, (stem, _, _) in enumerate(chunk):
                    results[stem]["LPIPS"] = float(d[j])
            if ds_fn is not None:
                d = np.asarray(ds_fn(srs, hrs))
                for j, (stem, _, _) in enumerate(chunk):
                    results[stem]["DISTS"] = float(d[j])

    if niqe_model is not None and "niqe" in want:
        from freqfusion_tpu.utils.niqe import niqe as niqe_fn
        for items in buckets.values():
            for stem, sr, _ in items:
                try:
                    results[stem]["NIQE"] = niqe_fn(sr, niqe_model)
                except ValueError as e:
                    print(f"  ! NIQE skipped for {stem}: {e}")

    if iqa_models:
        import torch
        for items in buckets.values():
            for stem, sr, hr in items:
                t = torch.from_numpy(sr.transpose(2, 0, 1))[None]
                r = torch.from_numpy(hr.transpose(2, 0, 1))[None]
                for name, metric in iqa_models.items():
                    try:
                        results[stem][name] = float(metric(t, r))
                    except TypeError:
                        results[stem][name] = float(metric(t))
    return results


def main():
    p = argparse.ArgumentParser("FreqFusionSR-TPU eval")
    p.add_argument("--output_folder", required=True)
    p.add_argument("--target_folder", required=True)
    p.add_argument("--metrics", default="psnr,ssim",
                   help="comma list: psnr,ssim,niqe,lpips natively; "
                        "others need pyiqa")
    p.add_argument("--crop_border", type=int, default=4)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--niqe_params", default=None,
                   help=".npz/.mat pristine model for NIQE")
    p.add_argument("--niqe_fit_folder", default=None,
                   help="fit a pristine NIQE model from this image folder")
    p.add_argument("--lpips_weights", default=None,
                   help=".npz from convert_lpips, or '<vgg.pth>:<lin.pth>'")
    p.add_argument("--dists_weights", default=None,
                   help=".npz from convert_dists, or "
                        "'<vgg16.pth>:<weights.pt>'")
    p.add_argument("--results_csv", default="iqa_results.csv")
    args = p.parse_args()

    want = [m.strip().lower() for m in args.metrics.split(",") if m.strip()]
    # niqe/lpips are native ONLY when their weight artifacts are supplied;
    # otherwise they stay pyiqa candidates (so installing pyiqa still
    # computes them without --niqe_params/--lpips_weights).
    native = {"psnr", "ssim"}
    if args.niqe_params or args.niqe_fit_folder:
        native.add("niqe")
    if args.lpips_weights:
        native.add("lpips")
    if args.dists_weights:
        native.add("dists")
    pyiqa_wanted = [m for m in want if m not in native]

    niqe_model = None
    if "niqe" in want and "niqe" in native:
        from freqfusion_tpu.utils.niqe import (
            fit_niqe_params, load_niqe_params,
        )
        if args.niqe_params:
            niqe_model = load_niqe_params(args.niqe_params)
        else:
            from freqfusion_tpu.utils.image_io import read_image
            imgs = (read_image(str(f))
                    for f in sorted(Path(args.niqe_fit_folder).iterdir())
                    if f.suffix.lower() in _IMG_EXTS)
            niqe_model = fit_niqe_params(imgs)

    lpips_params = None
    if "lpips" in want and "lpips" in native:
        from freqfusion_tpu.utils.lpips import load_lpips_params
        lpips_params = load_lpips_params(args.lpips_weights)

    dists_params = None
    if "dists" in want and "dists" in native:
        from freqfusion_tpu.utils.dists import load_dists_params
        dists_params = load_dists_params(args.dists_weights)

    # pyiqa results are stored under the reference's display keys
    # (reference eval.py keys CLIP-IQA with the hyphen) so total_score's
    # branches match.
    _DISPLAY = {"clipiqa": "CLIP-IQA", "clipiqa+": "CLIP-IQA"}
    iqa_models = {}
    if pyiqa_wanted:
        try:
            import pyiqa  # noqa: F401
            for m in pyiqa_wanted:
                key = _DISPLAY.get(m, m.upper())
                iqa_models[key] = pyiqa.create_metric(m, device="cpu")
        except ImportError:
            print(f"pyiqa not available — skipping {pyiqa_wanted}")

    pairs = _pairs(args.output_folder, args.target_folder)
    print(f"evaluating {len(pairs)} pairs "
          f"(batched, bucket batch={args.batch})")
    results = evaluate_pairs(pairs, want, args.crop_border, niqe_model,
                             lpips_params, iqa_models, args.batch,
                             dists_params=dists_params)

    for stem in sorted(results):
        row = results[stem]
        print(f"  {stem}: " +
              " ".join(f"{k}={v:.4f}" for k, v in row.items()))

    # Average each metric over the images that HAVE it (a failed metric
    # must not deflate the average with zeros).
    keys = sorted({k for r in results.values() for k in r})
    avg = {}
    for k in keys:
        vals = [r[k] for r in results.values() if k in r]
        if vals:
            avg[k] = float(np.mean(vals))
            if len(vals) < len(results):
                print(f"  (note: {k} available on {len(vals)}/"
                      f"{len(results)} images)")
    avg["Total Score"] = total_score(avg)
    print("Average:", avg)

    with open(args.results_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["Filename"] + keys)
        for name in sorted(results):
            writer.writerow([name] + [results[name].get(k, "")
                                      for k in keys])
    print(f"IQA results saved to {args.results_csv}")


if __name__ == "__main__":
    main()
