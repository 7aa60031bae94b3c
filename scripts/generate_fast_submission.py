#!/usr/bin/env python
"""Fast 8x-TTA submission from a pre-extracted TTA cache.

Replaces the reference's generate_fast_submission.py: loads the TTA cache
(scripts/extract_tta_cache.py), runs only the ~1.2M-param fusion network on
each of the 8 variants, reverses the geometry (reverse_tta,
reference :55-61), averages, and writes PNGs + a submission zip — "full
8x TTA submission in ~30s" (reference :11).

    python scripts/generate_fast_submission.py \
        --model-dir model_zoo/team29_FreqFusionSR \
        --cache-dir data/cache/test_tta --out-dir submission
"""

from __future__ import annotations

import argparse
import sys
import time
import zipfile
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--cache-dir", required=True)
    ap.add_argument("--out-dir", default="submission")
    ap.add_argument("--zip", dest="zip_name", default="submission.zip")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.data.augment import invert_geometry
    from freqfusion_tpu.data.cached import EXPERTS
    from freqfusion_tpu.interface.io import load_pipeline
    from freqfusion_tpu.utils.image_io import write_image

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pipeline = load_pipeline(args.model_dir, init_missing_fusion=True)
    fusion_fwd = jax.jit(
        lambda v, lr, imgs, feats: pipeline.fusion.apply(v, lr, imgs, feats))

    groups = defaultdict(list)
    for f in sorted(Path(args.cache_dir).glob("*_tta*.npz")):
        stem = f.stem.rsplit("_tta", 1)[0]
        groups[stem].append(f)

    print(f"fast submission: {len(groups)} images")
    t_all = time.perf_counter()
    for stem, files in groups.items():
        acc = None
        for f in files:
            with np.load(f) as z:
                lr = z["lr"].astype(np.float32)
                imgs = {e: z[f"{e}_img"].astype(np.float32)[None]
                        for e in EXPERTS if f"{e}_img" in z}
                feats = {e: z[f"{e}_feat"].astype(np.float32)[None]
                         for e in EXPERTS if f"{e}_feat" in z}
                hflip = bool(z["tta_hflip"])
                rot_k = int(z["tta_rot_k"])
            sr = np.asarray(fusion_fwd(pipeline.params["fusion"],
                                       jnp.asarray(lr)[None],
                                       imgs, feats)[0])
            sr = invert_geometry(sr, hflip, False, rot_k)
            acc = sr if acc is None else acc + sr
        avg = acc / len(files)
        write_image(str(out / f"{stem}.png"), avg)
    dt = time.perf_counter() - t_all
    print(f"fused {len(groups)} images in {dt:.1f}s")

    zpath = out / args.zip_name
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
        for png in sorted(out.glob("*.png")):
            zf.write(png, png.name)
    print(f"wrote {zpath}")


if __name__ == "__main__":
    main()
