"""NAFNet torch checkpoint -> flax params (models/nafnet.py).

Key mapping mirrors the torch tree (src/models/nafnet/nafnet_arch.py):
intro, encoders.{i}.{j}, downs.{i}, middle_blks.{j}, ups.{i},
decoders.{i}.{j}, ending; per-block conv1..conv5, sca.1, norm1/2,
beta/gamma. LayerNorm2d's channel-axis weight/bias become last-axis
LayerNorm scale/bias in NHWC; beta/gamma [1,C,1,1] flatten to [C].
Accepts both bare NAFNet checkpoints and the NAFNetSR wrapper prefix
('nafnet.'), like load_nafnet_weights (src/models/nafnet/__init__.py:60-99).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .common import conv_kernel, dw_conv_kernel, unflatten

__all__ = ["convert_nafnet"]


def convert_nafnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, np.ndarray] = {}
    for name, w in sd.items():
        if name.startswith("nafnet."):
            name = name[len("nafnet."):]
        parts = name.split(".")
        leaf = parts[-1]

        if parts[0] in ("intro", "ending"):
            out[f"{parts[0]}/{'kernel' if leaf == 'weight' else 'bias'}"] = (
                conv_kernel(w) if leaf == "weight" else w)
        elif parts[0] == "downs":
            out[f"downs_{parts[1]}/"
                f"{'kernel' if leaf == 'weight' else 'bias'}"] = (
                conv_kernel(w) if leaf == "weight" else w)
        elif parts[0] == "ups":
            # ups.{i}.0 : Sequential(conv1x1 no bias, PixelShuffle)
            out[f"ups_{parts[1]}/kernel"] = conv_kernel(w)
        elif parts[0] in ("encoders", "decoders", "middle_blks"):
            if parts[0] == "middle_blks":
                base = f"middle_blks_{parts[1]}"
                rest = parts[2:]
            else:
                base = f"{parts[0]}_{parts[1]}_{parts[2]}"
                rest = parts[3:]
            sub = rest[0]
            if sub in ("norm1", "norm2"):
                out[f"{base}/{sub}/"
                    f"{'scale' if leaf == 'weight' else 'bias'}"] = w
            elif sub in ("beta", "gamma"):
                out[f"{base}/{sub}"] = w.reshape(-1)
            elif sub in ("conv1", "conv3", "conv4", "conv5"):
                out[f"{base}/{sub}/"
                    f"{'kernel' if leaf == 'weight' else 'bias'}"] = (
                    conv_kernel(w) if leaf == "weight" else w)
            elif sub == "conv2":  # depthwise
                out[f"{base}/conv2/"
                    f"{'kernel' if leaf == 'weight' else 'bias'}"] = (
                    dw_conv_kernel(w) if leaf == "weight" else w)
            elif sub == "sca":   # sca.1 conv
                out[f"{base}/sca/"
                    f"{'kernel' if leaf == 'weight' else 'bias'}"] = (
                    conv_kernel(w) if leaf == "weight" else w)
            else:
                raise KeyError(f"unmapped NAFBlock key: {name}")
        else:
            raise KeyError(f"unmapped NAFNet key: {name}")

    return {"params": {"nafnet": unflatten(out)}}
