#!/usr/bin/env python
"""Batched, data-parallel x4 SR over a folder (multi-chip ready).

The throughput path for full-set inference (SURVEY.md §7 step 9): images
are grouped into pad-16 shape buckets (one jit executable per bucket,
exactly the reference's pad-then-crop semantics, io.py:71-78), stacked
into batches, and sharded over the mesh's data axis — on a pod slice each
chip runs its share of the batch; on one chip it degrades to plain
batching. Works identically on the CPU test mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8).

    python scripts/batch_inference.py --model-dir model_zoo/team29_FreqFusionSR \
        --lr-dir data/DIV2K_test_LR --out-dir results/batched [--batch 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--lr-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = one batch per device count")
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from freqfusion_tpu.interface.io import load_pipeline
    from freqfusion_tpu.parallel.mesh import batch_sharding, make_mesh
    from freqfusion_tpu.utils.image_io import read_image, write_image

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pipeline = load_pipeline(args.model_dir, scale=args.scale)
    n_dev = len(jax.devices())
    batch = args.batch or n_dev
    mesh = make_mesh(n_data=max(1, n_dev // 1))
    shard = batch_sharding(mesh)

    files = sorted(p for p in Path(args.lr_dir).iterdir()
                   if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".bmp"))

    # Bucket by padded-to-16 shape so each bucket shares one executable.
    buckets = defaultdict(list)
    for path in files:
        img = read_image(str(path))
        h, w = img.shape[:2]
        key = (-(-h // 16) * 16, -(-w // 16) * 16)
        buckets[key].append((path, img))
    print(f"{len(files)} images in {len(buckets)} shape buckets "
          f"over {n_dev} device(s)")

    s = args.scale
    t_all = time.perf_counter()
    done = 0
    with mesh:
        for (bh, bw), items in sorted(buckets.items()):
            for start in range(0, len(items), batch):
                group = items[start : start + batch]
                # pad group to full batch for a single executable per bucket
                pad_n = batch - len(group)
                arrs = []
                for _, img in group:
                    ph, pw = bh - img.shape[0], bw - img.shape[1]
                    arrs.append(np.pad(img, [(0, ph), (0, pw), (0, 0)],
                                       mode="reflect"))
                for _ in range(pad_n):
                    arrs.append(np.zeros((bh, bw, 3), np.float32))
                lr = jnp.asarray(np.stack(arrs))
                if lr.shape[0] % len(mesh.devices.flat) == 0:
                    lr = jax.device_put(lr, shard)
                sr = np.asarray(pipeline(lr))
                for (path, img), sr_i in zip(group, sr):
                    h, w = img.shape[:2]
                    write_image(str(out / f"{path.stem}.png"),
                                sr_i[: h * s, : w * s])
                done += len(group)
                print(f"  {done}/{len(files)} "
                      f"({(time.perf_counter() - t_all) / max(done, 1):.2f}"
                      f" s/img avg)", flush=True)

    print(f"total {time.perf_counter() - t_all:.1f}s for {len(files)} images")


if __name__ == "__main__":
    main()
