"""MambaIR torch checkpoint -> flax params (models/mambair.py).

Key mapping mirrors the torch tree (mambair_arch.py:497-698):
conv_first, patch_embed.norm, layers.{i}.residual_group.blocks.{j}.
{ln_1, self_attention.*, skip_scale, conv_blk, ln_2, skip_scale2},
layers.{i}.conv, norm, conv_after_body, conv_before_upsample.0,
upsample.{0,2}, conv_last. SS2D's stacked scan parameters
(x_proj_weight / dt_projs_weight / dt_projs_bias / A_logs / Ds) transfer
verbatim — the JAX scan consumes the same layouts.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .common import conv_kernel, dw_conv_kernel, linear_kernel, unflatten

__all__ = ["convert_mambair", "sniff_mambair_config"]


def _norm(leaf: str) -> str:
    return "scale" if leaf == "weight" else "bias"


def convert_mambair(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, np.ndarray] = {}
    for name, w in sd.items():
        parts = name.split(".")
        leaf = parts[-1]
        if name == "mean":
            continue

        if name.startswith("layers."):
            i = parts[1]
            if parts[2] == "conv":
                out[f"layers_{i}/conv/"
                    f"{'kernel' if leaf == 'weight' else 'bias'}"] = (
                    conv_kernel(w) if leaf == "weight" else w)
                continue
            assert parts[2] == "residual_group" and parts[3] == "blocks", name
            j = parts[4]
            base = f"layers_{i}/blocks_{j}"
            sub = parts[5]
            rest = parts[6:]
            if sub in ("ln_1", "ln_2"):
                out[f"{base}/{sub}/{_norm(leaf)}"] = w
            elif sub in ("skip_scale", "skip_scale2"):
                out[f"{base}/{sub}"] = w
            elif sub == "self_attention":
                tgt = f"{base}/self_attention"
                if rest[0] in ("in_proj", "out_proj"):
                    out[f"{tgt}/{rest[0]}/kernel"] = linear_kernel(w)
                elif rest[0] == "conv2d":
                    out[f"{tgt}/conv2d/"
                        f"{'kernel' if leaf == 'weight' else 'bias'}"] = (
                        dw_conv_kernel(w) if leaf == "weight" else w)
                elif rest[0] == "out_norm":
                    out[f"{tgt}/out_norm/{_norm(leaf)}"] = w
                elif rest[0] in ("x_proj_weight", "dt_projs_weight",
                                 "dt_projs_bias", "A_logs", "Ds"):
                    out[f"{tgt}/{rest[0]}"] = w
                else:
                    raise KeyError(f"unmapped SS2D key: {name}")
            elif sub == "conv_blk":
                if rest[0] == "cab" and rest[1] in ("0", "2"):
                    out[f"{base}/conv_blk/cab_{rest[1]}/"
                        f"{'kernel' if leaf == 'weight' else 'bias'}"] = (
                        conv_kernel(w) if leaf == "weight" else w)
                elif rest[0] == "cab" and rest[1] == "3":
                    out[f"{base}/conv_blk/ca_{rest[3]}/"
                        f"{'kernel' if leaf == 'weight' else 'bias'}"] = (
                        conv_kernel(w) if leaf == "weight" else w)
                else:
                    raise KeyError(f"unmapped conv_blk key: {name}")
            else:
                raise KeyError(f"unmapped block key: {name}")

        elif name.startswith("patch_embed.norm."):
            out[f"patch_embed_norm/{_norm(leaf)}"] = w
        elif parts[0] == "norm":
            out[f"norm/{_norm(leaf)}"] = w
        elif parts[0] in ("conv_first", "conv_after_body", "conv_last"):
            out[f"{parts[0]}/{'kernel' if leaf == 'weight' else 'bias'}"] = (
                conv_kernel(w) if leaf == "weight" else w)
        elif name.startswith("conv_before_upsample.0."):
            out[f"conv_before_upsample_0/"
                f"{'kernel' if leaf == 'weight' else 'bias'}"] = (
                conv_kernel(w) if leaf == "weight" else w)
        elif name.startswith("upsample."):
            out[f"upsample_{parts[1]}/"
                f"{'kernel' if leaf == 'weight' else 'bias'}"] = (
                conv_kernel(w) if leaf == "weight" else w)
        else:
            raise KeyError(f"unmapped MambaIR key: {name}")

    return {"params": unflatten(out)}


def sniff_mambair_config(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Derive MambaIR model kwargs from state-dict tensor shapes
    (reference flexible loading: expert_loader.py:81-118).

    d_state comes from A_logs [4*d_inner, d_state]; expand from
    in_proj's 2*d_inner output vs embed_dim (dt_rank is derived, not
    stored: ceil(embed_dim/16), matching mambair_arch.py:224).
    """
    embed_dim = int(sd["conv_first.weight"].shape[0])
    layer_ids = sorted({int(k.split(".")[1]) for k in sd
                        if k.startswith("layers.")})
    depths = []
    for i in layer_ids:
        blocks = {int(k.split(".")[4]) for k in sd
                  if k.startswith(f"layers.{i}.residual_group.blocks.")}
        depths.append(1 + max(blocks))
    a_logs = sd["layers.0.residual_group.blocks.0.self_attention.A_logs"]
    d_state = int(a_logs.shape[1])
    d_inner = int(a_logs.shape[0]) // 4
    expand = d_inner / embed_dim
    num_feat = int(sd["conv_before_upsample.0.weight"].shape[0])
    # per-conv shuffle factor from the output/input channel ratio
    # (4C -> x2, 9C -> x3) so x3 checkpoints (one 9C conv) sniff right
    upscale = 1
    for k in sorted(sd):
        if k.startswith("upsample.") and k.endswith(".weight"):
            w = sd[k]
            upscale *= int(round((w.shape[0] / w.shape[1]) ** 0.5))
    return {
        "embed_dim": embed_dim,
        "depths": tuple(depths),
        "d_state": d_state,
        "mlp_ratio": expand,
        "num_feat": num_feat,
        "upscale": upscale,
    }
