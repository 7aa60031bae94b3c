"""EDSR torch checkpoint -> flax params (models/edsr.py).

BasicSR key layout: conv_first, body.{i}.conv1/conv2, conv_after_body,
upsample.{0,2}, conv_last (edsr_arch.py:61-100)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .common import conv_kernel, unflatten

__all__ = ["convert_edsr"]


def convert_edsr(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, np.ndarray] = {}
    for name, w in sd.items():
        if name == "mean":
            continue
        parts = name.split(".")
        leaf = parts[-1]
        value = conv_kernel(w) if leaf == "weight" else w
        key = "kernel" if leaf == "weight" else "bias"
        if parts[0] == "body":
            out[f"body_{parts[1]}/{parts[2]}/{key}"] = value
        elif parts[0] == "upsample":
            out[f"upsample_{parts[1]}/{key}"] = value
        elif parts[0] in ("conv_first", "conv_after_body", "conv_last"):
            out[f"{parts[0]}/{key}"] = value
        else:
            raise KeyError(f"unmapped EDSR key: {name}")
    return {"params": unflatten(out)}
