"""DAT torch checkpoint -> flax params (models/dat.py).

Mirrors dat_arch.py's module tree: conv_first, before_RG.1,
layers.{i}.blocks.{j}.{norm1, attn, norm2, ffn}, layers.{i}.conv, norm,
conv_after_body, conv_before_upsample.0, upsample.{0,2}, conv_last.
BatchNorms in the AIM/dwconv branches split into params + batch_stats.
Buffers (rpe_biases, relative_position_index, attn_mask_*, mean) are
recomputed statically.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .common import conv_kernel, dw_conv_kernel, linear_kernel, unflatten

__all__ = ["convert_dat"]

_SKIP = ("rpe_biases", "relative_position_index", "attn_mask",
         "num_batches_tracked")


def _ln(out, path, leaf, w):
    out[f"{path}/{'scale' if leaf == 'weight' else 'bias'}"] = w


def _lin(out, path, leaf, w):
    out[f"{path}/{'kernel' if leaf == 'weight' else 'bias'}"] = (
        linear_kernel(w) if leaf == "weight" else w)


def _conv(out, path, leaf, w, depthwise=False):
    if leaf == "weight":
        out[f"{path}/kernel"] = dw_conv_kernel(w) if depthwise else conv_kernel(w)
    else:
        out[f"{path}/bias"] = w


def _bn(params, stats, path, leaf, w):
    if leaf == "weight":
        params[f"{path}/scale"] = w
    elif leaf == "bias":
        params[f"{path}/bias"] = w
    elif leaf == "running_mean":
        stats[f"{path}/mean"] = w
    elif leaf == "running_var":
        stats[f"{path}/var"] = w


def _interaction(params, stats, base, kind, rest, leaf, w):
    """channel_interaction.{1 conv,2 BN,4 conv} /
    spatial_interaction.{0 conv,1 BN,3 conv}; dwconv.{0 conv,1 BN}."""
    idx = rest[0]
    path = f"{base}/{kind}_{idx}"
    bn_idx = {"channel_interaction": "2", "spatial_interaction": "1",
              "dwconv": "1"}[kind]
    if idx == bn_idx:
        _bn(params, stats, path, leaf, w)
    else:
        _conv(params, path, leaf, w, depthwise=(kind == "dwconv"))


def _attn(params, stats, base, rest, leaf, w):
    sub = rest[0]
    if sub in ("qkv", "proj"):
        _lin(params, f"{base}/{sub}", leaf, w)
    elif sub == "temperature":
        params[f"{base}/temperature"] = w
    elif sub in ("channel_interaction", "spatial_interaction", "dwconv"):
        _interaction(params, stats, base, sub, rest[1:], leaf, w)
    elif sub == "attns":
        bi = rest[1]
        inner = rest[2]
        abase = f"{base}/attns_{bi}"
        if inner == "pos":
            p = rest[3]
            if p == "pos_proj":
                _lin(params, f"{abase}/pos/pos_proj", leaf, w)
            else:  # pos1/pos2/pos3 Sequential: 0 LN, 2 Linear
                idx = rest[4]
                if idx == "0":
                    _ln(params, f"{abase}/pos/{p}_0", leaf, w)
                else:
                    _lin(params, f"{abase}/pos/{p}_2", leaf, w)
        else:
            raise KeyError(f"unmapped spatial-attn key: {base}.{rest}")
    else:
        raise KeyError(f"unmapped attn key: {base}.{rest}")


def convert_dat(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}

    for name, w in sd.items():
        if any(s in name for s in _SKIP) or name == "mean":
            continue
        parts = name.split(".")
        leaf = parts[-1]

        if name.startswith("layers."):
            i = parts[1]
            if parts[2] == "conv":
                _conv(params, f"layers_{i}/conv", leaf, w)
                continue
            assert parts[2] == "blocks", name
            j = parts[3]
            base = f"layers_{i}/blocks_{j}"
            sub = parts[4]
            rest = parts[5:]
            if sub in ("norm1", "norm2"):
                _ln(params, f"{base}/{sub}", leaf, w)
            elif sub == "attn":
                _attn(params, stats, f"{base}/attn", rest, leaf, w)
            elif sub == "ffn":
                if rest[0] in ("fc1", "fc2"):
                    _lin(params, f"{base}/ffn/{rest[0]}", leaf, w)
                elif rest[0] == "sg":
                    if rest[1] == "norm":
                        _ln(params, f"{base}/ffn/sg_norm", leaf, w)
                    else:
                        _conv(params, f"{base}/ffn/sg_conv", leaf, w,
                              depthwise=True)
                else:
                    raise KeyError(f"unmapped ffn key: {name}")
            else:
                raise KeyError(f"unmapped block key: {name}")

        elif name.startswith("before_RG.1."):
            _ln(params, "before_rg_norm", leaf, w)
        elif parts[0] == "norm":
            _ln(params, "norm", leaf, w)
        elif parts[0] in ("conv_first", "conv_after_body", "conv_last"):
            _conv(params, parts[0], leaf, w)
        elif name.startswith("conv_before_upsample.0."):
            _conv(params, "conv_before_upsample_0", leaf, w)
        elif name.startswith("upsample."):
            _conv(params, f"upsample_{parts[1]}", leaf, w)
        else:
            raise KeyError(f"unmapped DAT key: {name}")

    out: Dict[str, Any] = {"params": unflatten(params)}
    if stats:
        out["batch_stats"] = unflatten(stats)
    return out
