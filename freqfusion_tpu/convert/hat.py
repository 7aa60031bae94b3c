"""HAT torch checkpoint -> flax params (models/hat.py).

Mirrors hat_arch.py's tree: conv_first, patch_embed.norm,
layers.{i}.residual_group.{blocks.{j}, overlap_attn}, layers.{i}.conv,
norm, conv_after_body, conv_before_upsample.0, upsample.{0,2}, conv_last.
Buffers (relative_position_index_*, attn_mask, mean) recomputed statically.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .common import conv_kernel, linear_kernel, unflatten

__all__ = ["convert_hat"]

_SKIP = ("relative_position_index", "attn_mask")


def _ln(out, path, leaf, w):
    out[f"{path}/{'scale' if leaf == 'weight' else 'bias'}"] = w


def _lin(out, path, leaf, w):
    out[f"{path}/{'kernel' if leaf == 'weight' else 'bias'}"] = (
        linear_kernel(w) if leaf == "weight" else w)


def _conv(out, path, leaf, w):
    out[f"{path}/{'kernel' if leaf == 'weight' else 'bias'}"] = (
        conv_kernel(w) if leaf == "weight" else w)


def _cab(out, base, rest, leaf, w):
    """conv_block.cab.{0,2} convs; .3.attention.{1,3} CA convs."""
    if rest[0] == "cab" and rest[1] in ("0", "2"):
        _conv(out, f"{base}/cab_{rest[1]}", leaf, w)
    elif rest[0] == "cab" and rest[1] == "3":
        _conv(out, f"{base}/ca_{rest[3]}", leaf, w)
    else:
        raise KeyError(f"unmapped CAB key: {base}.{rest}")


def convert_hat(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, np.ndarray] = {}
    for name, w in sd.items():
        if any(s in name for s in _SKIP) or name == "mean":
            continue
        parts = name.split(".")
        leaf = parts[-1]

        if name.startswith("layers."):
            i = parts[1]
            if parts[2] == "conv":
                _conv(out, f"layers_{i}/conv", leaf, w)
                continue
            assert parts[2] == "residual_group", name
            sub = parts[3]
            if sub == "blocks":
                j = parts[4]
                base = f"layers_{i}/blocks_{j}"
                inner = parts[5]
                rest = parts[6:]
                if inner in ("norm1", "norm2"):
                    _ln(out, f"{base}/{inner}", leaf, w)
                elif inner == "conv_block":
                    _cab(out, f"{base}/conv_block", rest, leaf, w)
                elif inner == "attn":
                    if rest[0] == "relative_position_bias_table":
                        out[f"{base}/attn/relative_position_bias_table"] = w
                    else:
                        _lin(out, f"{base}/attn/{rest[0]}", leaf, w)
                elif inner == "mlp":
                    _lin(out, f"{base}/mlp_{rest[0]}", leaf, w)
                else:
                    raise KeyError(f"unmapped HAB key: {name}")
            elif sub == "overlap_attn":
                base = f"layers_{i}/overlap_attn"
                inner = parts[4]
                rest = parts[5:]
                if inner in ("norm1", "norm2"):
                    _ln(out, f"{base}/{inner}", leaf, w)
                elif inner == "relative_position_bias_table":
                    out[f"{base}/relative_position_bias_table"] = w
                elif inner in ("qkv", "proj"):
                    _lin(out, f"{base}/{inner}", leaf, w)
                elif inner == "mlp":
                    _lin(out, f"{base}/mlp_{rest[0]}", leaf, w)
                else:
                    raise KeyError(f"unmapped OCAB key: {name}")
            else:
                raise KeyError(f"unmapped residual_group key: {name}")

        elif name.startswith("patch_embed.norm."):
            _ln(out, "patch_embed_norm", leaf, w)
        elif parts[0] == "norm":
            _ln(out, "norm", leaf, w)
        elif parts[0] in ("conv_first", "conv_after_body", "conv_last"):
            _conv(out, parts[0], leaf, w)
        elif name.startswith("conv_before_upsample.0."):
            _conv(out, "conv_before_upsample_0", leaf, w)
        elif name.startswith("upsample."):
            _conv(out, f"upsample_{parts[1]}", leaf, w)
        else:
            raise KeyError(f"unmapped HAT key: {name}")

    return {"params": unflatten(out)}
