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

__all__ = ["convert_drct", "sniff_drct_config"]


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


def sniff_drct_config(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Derive DRCT model kwargs from state-dict tensor shapes.

    Mirrors the reference's shape-filtered flexible loading
    (expert_loader.py:81-118) the TPU-native way: instead of silently
    dropping mismatched tensors, instantiate the geometry the checkpoint
    was trained with. Handles both the reference-as-instantiated
    mlp_ratio=4 (34.17M) and the official DRCT-L_X4 release's mlp_ratio=2
    (27.58M) cleanly.
    """
    embed_dim = int(sd["conv_first.weight"].shape[0])
    num_layers = 1 + max(int(k.split(".")[1]) for k in sd
                         if k.startswith("layers."))
    table = sd["layers.0.swin1.attn.relative_position_bias_table"]
    window_size = (int(round(table.shape[0] ** 0.5)) + 1) // 2
    num_heads = int(table.shape[1])
    gc = int(sd["layers.0.adjust1.weight"].shape[0])
    mlp_hidden = int(sd["layers.0.swin1.mlp.fc1.weight"].shape[0])
    mlp_ratio = mlp_hidden / embed_dim
    num_feat = int(sd["conv_before_upsample.0.weight"].shape[0])
    # Each upsample conv's shuffle factor comes from its output/input
    # channel ratio (4C -> x2, 9C -> x3); the total scale is their
    # product. Counting convs as x2 each would misread x3 checkpoints
    # (a single 9C conv) as x2.
    upscale = 1
    for k in sorted(sd):
        if k.startswith("upsample.") and k.endswith(".weight"):
            w = sd[k]
            upscale *= int(round((w.shape[0] / w.shape[1]) ** 0.5))
    return {
        "embed_dim": embed_dim,
        "num_layers": num_layers,
        "num_heads": num_heads,
        "window_size": window_size,
        "gc": gc,
        "mlp_ratio": mlp_ratio,
        "num_feat": num_feat,
        "upscale": upscale,
    }
