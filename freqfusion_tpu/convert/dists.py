"""DISTS torch checkpoints -> flax-layout npz (utils/dists.py).

Two artifacts feed DISTS: the torchvision VGG16 'features' state dict
(the same 13 convs LPIPS uses — keys features.{0,2,5,...}.weight/bias)
and the official DISTS 'weights.pt' holding the learned per-channel
alpha/beta ([1, 1475, 1, 1] each, 1475 = 3+64+128+256+512+512).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..utils.dists import CHNS
from .common import conv_kernel
from .lpips import _TORCH_CONV_IDX

__all__ = ["convert_dists", "convert_dists_files", "save_dists_npz"]


def convert_dists(vgg_sd: Dict[str, np.ndarray],
                  w_sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, np.ndarray] = {}
    for ci, ti in enumerate(_TORCH_CONV_IDX):
        w = vgg_sd.get(f"features.{ti}.weight", vgg_sd.get(f"{ti}.weight"))
        b = vgg_sd.get(f"features.{ti}.bias", vgg_sd.get(f"{ti}.bias"))
        if w is None or b is None:
            raise KeyError(f"VGG16 conv {ci} (torch idx {ti}) missing")
        out[f"conv{ci}_kernel"] = conv_kernel(np.asarray(w))
        out[f"conv{ci}_bias"] = np.asarray(b)
    total = sum(CHNS)
    for name in ("alpha", "beta"):
        v = w_sd.get(name)
        if v is None:
            raise KeyError(f"DISTS weights missing '{name}': {list(w_sd)}")
        v = np.asarray(v).reshape(-1)
        if v.shape[0] != total:
            raise ValueError(f"{name} has {v.shape[0]} channels, "
                             f"expected {total}")
        out[name] = v.astype(np.float32)
    return out


def convert_dists_files(vgg_path: str, weights_path: str) -> Dict[str, Any]:
    from .common import load_torch_state_dict
    return convert_dists(load_torch_state_dict(vgg_path),
                         load_torch_state_dict(weights_path))


def save_dists_npz(params: Dict[str, np.ndarray], path: str) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
