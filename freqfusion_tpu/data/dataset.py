"""Paired LR/HR image dataset with fuzzy filename matching and DF2K layouts.

Capabilities match the reference's SRDataset / DF2KDataset
(src/data/dataset.py:46-505): recursive pair discovery with suffix-tolerant
stem matching (``0001x4.png`` <-> ``0001.png``, ``_LR``/``_bicubic``
variants, dataset.py:137-205), auto-detection of common DF2K directory
layouts (dataset.py:387-435), optional in-RAM caching, repeat factor, and
center-cropped validation patches.

Host-side numpy only — device placement and sharding happen in the loader.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.image_io import read_image
from .augment import paired_geometric_augment, paired_random_crop

__all__ = ["find_pairs", "detect_df2k_layout", "SRPairDataset"]

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")

# Suffix decorations commonly found on LR filenames.
_SUFFIX_RE = re.compile(r"(x[234])$|(_lr)$|(_bicubic)$|(_down)$", re.IGNORECASE)


def _norm_stem(name: str) -> str:
    stem = Path(name).stem
    prev = None
    while prev != stem:
        prev = stem
        stem = _SUFFIX_RE.sub("", stem)
    return stem.lower()


def _list_images(d: Path) -> List[Path]:
    return sorted(p for p in d.rglob("*")
                  if p.suffix.lower() in _IMG_EXTS and p.is_file())


def find_pairs(lr_dir: str, hr_dir: str) -> List[Tuple[Path, Path]]:
    """Match LR to HR files by normalized stem."""
    lr_files = _list_images(Path(lr_dir))
    hr_files = {_norm_stem(p.name): p for p in _list_images(Path(hr_dir))}
    pairs = []
    for lr in lr_files:
        hr = hr_files.get(_norm_stem(lr.name))
        if hr is not None:
            pairs.append((lr, hr))
    return pairs


# Candidate (hr_subdir, lr_subdir) layouts, mirroring the auto-detection in
# the reference's DF2KDataset (dataset.py:387-435).
_DF2K_LAYOUTS = [
    ("train_HR", "train_LR"),
    ("DF2K_train_HR", "DF2K_train_LR_bicubic/X4"),
    ("HR", "LR_bicubic/X4"),
    ("HR", "LR/X4"),
    ("DIV2K_train_HR", "DIV2K_train_LR_bicubic/X4"),
    ("hr", "lr"),
]


def detect_df2k_layout(root: str) -> Optional[Tuple[str, str]]:
    rootp = Path(root)
    for hr_sub, lr_sub in _DF2K_LAYOUTS:
        if (rootp / hr_sub).is_dir() and (rootp / lr_sub).is_dir():
            return hr_sub, lr_sub
    return None


class SRPairDataset:
    """Paired LR/HR dataset yielding float32 HWC tensors in [0, 1]."""

    def __init__(self,
                 lr_dir: str,
                 hr_dir: str,
                 scale: int = 4,
                 lr_patch_size: Optional[int] = 64,
                 augment: bool = True,
                 flip_prob: float = 0.5,
                 rot_prob: float = 0.5,
                 cache_in_ram: bool = False,
                 repeat_factor: int = 1,
                 center_crop_val: bool = False,
                 max_val_size: Optional[int] = None,
                 seed: int = 0):
        self.pairs = find_pairs(lr_dir, hr_dir)
        if not self.pairs:
            raise FileNotFoundError(
                f"no LR/HR pairs found under {lr_dir} / {hr_dir}")
        self.scale = scale
        self.lr_patch_size = lr_patch_size
        self.augment = augment
        self.flip_prob = flip_prob
        self.rot_prob = rot_prob
        self.repeat_factor = max(1, repeat_factor)
        self.center_crop_val = center_crop_val
        self.max_val_size = max_val_size
        self._rng = np.random.default_rng(seed)
        self._cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self.cache_in_ram = cache_in_ram

    def __len__(self) -> int:
        return len(self.pairs) * self.repeat_factor

    def _load(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if self.cache_in_ram and idx in self._cache:
            return self._cache[idx]
        lr_path, hr_path = self.pairs[idx]
        lr = read_image(str(lr_path))
        hr = read_image(str(hr_path))
        # Align HR to an exact multiple of the LR size (guards off-by-one
        # dataset inconsistencies, like the reference's shape fixups).
        h, w = lr.shape[:2]
        hr = hr[: h * self.scale, : w * self.scale]
        if self.cache_in_ram:
            self._cache[idx] = (lr, hr)
        return lr, hr

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        idx = index % len(self.pairs)
        lr, hr = self._load(idx)

        if self.lr_patch_size is not None:
            if self.center_crop_val:
                p = self.lr_patch_size
                h, w = lr.shape[:2]
                top, left = max(0, (h - p) // 2), max(0, (w - p) // 2)
                lr = lr[top : top + p, left : left + p]
                hr = hr[top * self.scale : (top + p) * self.scale,
                        left * self.scale : (left + p) * self.scale]
            else:
                lr, hr = paired_random_crop(lr, hr, self.lr_patch_size,
                                            self.scale, self._rng)
        elif self.max_val_size is not None:
            m = self.max_val_size
            lr = lr[:m, :m]
            hr = hr[: lr.shape[0] * self.scale, : lr.shape[1] * self.scale]

        if self.augment:
            # HR must rotate/flip consistently with LR.
            out = paired_geometric_augment({"lr": lr, "hr": hr}, self._rng,
                                           self.flip_prob, self.rot_prob)
            lr, hr = out["lr"], out["hr"]

        return {"lr": np.ascontiguousarray(lr),
                "hr": np.ascontiguousarray(hr),
                "name": self.pairs[idx][0].stem}
