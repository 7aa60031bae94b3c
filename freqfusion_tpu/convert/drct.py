"""DRCT-L torch checkpoint -> flax params (models/drct.py).

Key mapping mirrors the torch module tree (drct_arch.py:624-760):
conv_first, patch_embed.norm, layers.{i}.{swin1..5,adjust1..5}, norm,
conv_after_body, conv_before_upsample.0, upsample.{0,2}, conv_last.
Buffers (relative_position_index, attn_mask, mean) are recomputed, not
loaded (like expert_loader.py:323-324 notes for GRL).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .common import conv_kernel, linear_kernel, unflatten

__all__ = ["convert_drct"]


def convert_drct(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, np.ndarray] = {}
    skipped = ("relative_position_index", "attn_mask", "mean")

    for name, w in sd.items():
        if any(s in name for s in skipped):
            continue
        parts = name.split(".")

        if name.startswith("layers."):
            i, sub = parts[1], parts[2]
            base = f"layers_{i}/{sub}"
            rest = parts[3:]
            if sub.startswith("adjust"):
                out[f"{base}/{'kernel' if rest[-1] == 'weight' else 'bias'}"] = (
                    conv_kernel(w) if rest[-1] == "weight" else w)
            elif sub.startswith("swin"):
                leaf = rest[-1]
                if rest[0] in ("norm1", "norm2"):
                    out[f"{base}/{rest[0]}/"
                        f"{'scale' if leaf == 'weight' else 'bias'}"] = w
                elif rest[0] == "attn":
                    if rest[1] == "relative_position_bias_table":
                        out[f"{base}/attn/relative_position_bias_table"] = w
                    else:  # qkv / proj Linear
                        out[f"{base}/attn/{rest[1]}/"
                            f"{'kernel' if leaf == 'weight' else 'bias'}"] = (
                            linear_kernel(w) if leaf == "weight" else w)
                elif rest[0] == "mlp":
                    out[f"{base}/mlp/{rest[1]}/"
                        f"{'kernel' if leaf == 'weight' else 'bias'}"] = (
                        linear_kernel(w) if leaf == "weight" else w)
                else:
                    raise KeyError(f"unmapped swin key: {name}")
            else:
                raise KeyError(f"unmapped layer key: {name}")

        elif name.startswith("patch_embed.norm."):
            out[f"patch_embed_norm/{'scale' if parts[-1] == 'weight' else 'bias'}"] = w
        elif name == "norm.weight":
            out["norm/scale"] = w
        elif name == "norm.bias":
            out["norm/bias"] = w
        elif name.startswith(("conv_first", "conv_after_body", "conv_last")):
            out[f"{parts[0]}/{'kernel' if parts[-1] == 'weight' else 'bias'}"] = (
                conv_kernel(w) if parts[-1] == "weight" else w)
        elif name.startswith("conv_before_upsample.0."):
            out[f"conv_before_upsample_0/"
                f"{'kernel' if parts[-1] == 'weight' else 'bias'}"] = (
                conv_kernel(w) if parts[-1] == "weight" else w)
        elif name.startswith("upsample."):
            out[f"upsample_{parts[1]}/"
                f"{'kernel' if parts[-1] == 'weight' else 'bias'}"] = (
                conv_kernel(w) if parts[-1] == "weight" else w)
        else:
            raise KeyError(f"unmapped DRCT key: {name}")

    return {"params": unflatten(out)}
