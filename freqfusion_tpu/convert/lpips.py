"""LPIPS torch checkpoints -> flax-layout npz (utils/lpips.py).

Two artifacts feed LPIPS-vgg: the torchvision VGG16 'features' state dict
(keys features.{0,2,5,...}.weight/bias) and the LPIPS linear-calibration
state dict (keys lin{0..4}.model.1.weight). convert_lpips maps both into
the flat NHWC/HWIO dict lpips_forward consumes.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..utils.lpips import VGG_CFG
from .common import conv_kernel

__all__ = ["convert_lpips", "convert_lpips_files", "save_lpips_npz"]

# torchvision 'features' module indices of the conv layers in VGG16
_TORCH_CONV_IDX = []
_i = 0
for _item in VGG_CFG:
    if _item == "M":
        _i += 1  # MaxPool module
    else:
        _TORCH_CONV_IDX.append(_i)
        _i += 2  # Conv2d + ReLU


def convert_lpips(vgg_sd: Dict[str, np.ndarray],
                  lin_sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, np.ndarray] = {}
    for ci, ti in enumerate(_TORCH_CONV_IDX):
        w = vgg_sd.get(f"features.{ti}.weight", vgg_sd.get(f"{ti}.weight"))
        b = vgg_sd.get(f"features.{ti}.bias", vgg_sd.get(f"{ti}.bias"))
        if w is None or b is None:
            raise KeyError(f"VGG16 conv {ci} (torch idx {ti}) missing")
        out[f"conv{ci}_kernel"] = conv_kernel(np.asarray(w))
        out[f"conv{ci}_bias"] = np.asarray(b)
    for li in range(5):
        w = lin_sd.get(f"lin{li}.model.1.weight",
                       lin_sd.get(f"lins.{li}.model.1.weight"))
        if w is None:
            raise KeyError(f"LPIPS lin{li} weight missing: {list(lin_sd)[:5]}")
        out[f"lin{li}_kernel"] = conv_kernel(np.asarray(w))
    return out


def convert_lpips_files(vgg_path: str, lin_path: str) -> Dict[str, Any]:
    from .common import load_torch_state_dict
    return convert_lpips(load_torch_state_dict(vgg_path),
                         load_torch_state_dict(lin_path))


def save_lpips_npz(params: Dict[str, np.ndarray], path: str) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
