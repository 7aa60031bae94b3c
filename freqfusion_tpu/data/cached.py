"""Cached expert-feature dataset: the Decoupled Compute layer, TPU-side.

The reference trains its fusion net 10-20x faster against pre-extracted
expert outputs stored as ``{stem}_drct_part.pt`` / ``_rest_part.pt`` /
``_mamba_part.pt`` (src/data/cached_dataset.py:10-34). That workflow stays
valuable on TPU — the frozen 131M experts are ~100x the fusion net's
compute — so this module keeps the cache *concept* with a NHWC ``.npz``
container per sample:

    {stem}.npz:
        lr        [H, W, 3]      float32
        hr        [4H, 4W, 3]    float32
        {e}_img   [4H, 4W, 3]    float32   e in drct/grl/nafnet/mamba
        {e}_feat  [H, W, C_e]    float32/float16

``convert_reference_cache`` translates the reference's torch ``.pt`` triplet
format into this layout (FP16 mamba tensors are upcast like
cached_dataset.py:169-199). Missing mamba files degrade gracefully to zero
tensors (cached_dataset.py:176-203).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .augment import paired_geometric_augment

__all__ = ["CachedFeatureDataset", "convert_reference_cache", "EXPERTS",
           "FEATURE_CHANNELS"]

EXPERTS = ("drct", "grl", "nafnet", "mamba")
FEATURE_CHANNELS = {"drct": 180, "grl": 180, "nafnet": 64, "mamba": 180}


class CachedFeatureDataset:
    """Loads per-sample .npz caches; geometric augs applied consistently."""

    def __init__(self, cache_dir: str, augment: bool = True,
                 flip_prob: float = 0.5, rot_prob: float = 0.5,
                 repeat_factor: int = 1, scale: int = 4, seed: int = 0):
        self.files: List[Path] = sorted(Path(cache_dir).glob("*.npz"))
        if not self.files:
            raise FileNotFoundError(f"no .npz caches in {cache_dir}")
        self.augment = augment
        self.flip_prob = flip_prob
        self.rot_prob = rot_prob
        self.repeat_factor = max(1, repeat_factor)
        self.scale = scale
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.files) * self.repeat_factor

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        path = self.files[index % len(self.files)]
        with np.load(path) as z:
            sample = {k: z[k].astype(np.float32) for k in z.files}

        lr = sample["lr"]
        h, w = lr.shape[:2]
        # Zero-fill any missing expert (graceful degradation like the
        # reference's missing-mamba path).
        for e in EXPERTS:
            if f"{e}_img" not in sample:
                sample[f"{e}_img"] = np.zeros(
                    (h * self.scale, w * self.scale, 3), np.float32)
            if f"{e}_feat" not in sample:
                sample[f"{e}_feat"] = np.zeros(
                    (h, w, FEATURE_CHANNELS[e]), np.float32)

        if self.augment:
            sample = paired_geometric_augment(sample, self._rng,
                                              self.flip_prob, self.rot_prob)
        sample["name"] = path.stem
        return sample


def _chw_to_hwc(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 4:  # [1, C, H, W]
        x = x[0]
    return np.ascontiguousarray(np.transpose(x, (1, 2, 0)))


def convert_reference_cache(src_dir: str, dst_dir: str,
                            limit: Optional[int] = None) -> int:
    """Convert reference {stem}_drct_part.pt / _rest_part.pt / _mamba_part.pt
    triplets into NHWC .npz samples. Requires torch. Returns #converted."""
    import torch  # local import: host-side tool only

    src, dst = Path(src_dir), Path(dst_dir)
    dst.mkdir(parents=True, exist_ok=True)
    drct_files = sorted(src.glob("*_drct_part.pt"))
    if limit:
        drct_files = drct_files[:limit]

    count = 0
    for dp in drct_files:
        stem = dp.name[: -len("_drct_part.pt")]
        out: Dict[str, np.ndarray] = {}
        d = torch.load(dp, map_location="cpu", weights_only=False)
        out["lr"] = _chw_to_hwc(d["lr"])
        out["hr"] = _chw_to_hwc(d["hr"])
        out["drct_img"] = _chw_to_hwc(next(iter(d["outputs"].values())))
        out["drct_feat"] = _chw_to_hwc(next(iter(d["features"].values())))

        rest_path = src / f"{stem}_rest_part.pt"
        if rest_path.exists():
            r = torch.load(rest_path, map_location="cpu", weights_only=False)
            for name in ("grl", "nafnet"):
                if name in r["outputs"]:
                    out[f"{name}_img"] = _chw_to_hwc(r["outputs"][name])
                if name in r["features"]:
                    out[f"{name}_feat"] = _chw_to_hwc(r["features"][name])

        mamba_path = src / f"{stem}_mamba_part.pt"
        if mamba_path.exists():
            m = torch.load(mamba_path, map_location="cpu", weights_only=False)
            out["mamba_img"] = _chw_to_hwc(
                next(iter(m["outputs"].values())).float())
            out["mamba_feat"] = _chw_to_hwc(
                next(iter(m["features"].values())).float())

        np.savez_compressed(dst / f"{stem}.npz", **out)
        count += 1
    return count
