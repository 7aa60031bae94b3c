"""GRL-B torch checkpoint -> flax params (models/grl.py).

Key mapping follows the torch module tree (grl_arch.py + common/):
conv_first, norm_start, layers.{i}.blocks.{j}.{attn,norm1,conv,mlp,norm2},
layers.{i}.conv, norm_end, conv_after_body, conv_before_upsample.0,
upsample.up.{0,2}, conv_last. The 13 table/index/mask buffers are
recomputed statically, not loaded (grl/__init__.py notes; convert_checkpoint
at grl_arch.py:556+ drops them the same way).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .common import conv_kernel, linear_kernel, unflatten

__all__ = ["convert_grl"]

_SKIP_PREFIXES = ("table_", "index_", "mask_")


def _norm(leaf: str) -> str:
    return "scale" if leaf == "weight" else "bias"


def _lin(w: np.ndarray, leaf: str) -> np.ndarray:
    return linear_kernel(w) if leaf == "weight" else w


def _conv(w: np.ndarray, leaf: str) -> np.ndarray:
    return conv_kernel(w) if leaf == "weight" else w


def _affine(rest, w, leaf, out, base):
    """attn_transform{,1,2}.{logit_scale | cpb_mlp.0/2}"""
    t = rest[0]  # attn_transform / attn_transform1 / attn_transform2
    if rest[1] == "logit_scale":
        out[f"{base}/{t}/logit_scale"] = w
    elif rest[1] == "cpb_mlp":
        out[f"{base}/{t}/cpb_mlp_{rest[2]}/"
            f"{'kernel' if leaf == 'weight' else 'bias'}"] = _lin(w, leaf)
    else:
        raise KeyError(f"unmapped affine key: {rest}")


def convert_grl(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, np.ndarray] = {}
    for name, w in sd.items():
        parts = name.split(".")
        leaf = parts[-1]
        if any(p.startswith(_SKIP_PREFIXES) for p in parts) or name == "mean":
            continue

        if name.startswith("layers."):
            i = parts[1]
            if parts[2] == "conv":
                out[f"layers_{i}/conv/"
                    f"{'kernel' if leaf == 'weight' else 'bias'}"] = _conv(w, leaf)
                continue
            assert parts[2] == "blocks", name
            j = parts[3]
            base = f"layers_{i}/blocks_{j}"
            sub = parts[4]
            rest = parts[5:]
            if sub in ("norm1", "norm2"):
                out[f"{base}/{sub}/{_norm(leaf)}"] = w
            elif sub == "mlp":
                out[f"{base}/mlp_{rest[0]}/"
                    f"{'kernel' if leaf == 'weight' else 'bias'}"] = _lin(w, leaf)
            elif sub == "conv":
                # conv.cab.{0,2} convs; conv.cab.3.attention.{1,3} CA convs
                if rest[0] == "cab" and rest[1] in ("0", "2"):
                    out[f"{base}/conv/cab_{rest[1]}/"
                        f"{'kernel' if leaf == 'weight' else 'bias'}"] = _conv(w, leaf)
                elif rest[0] == "cab" and rest[1] == "3":
                    out[f"{base}/conv/ca_{rest[3]}/"
                        f"{'kernel' if leaf == 'weight' else 'bias'}"] = _conv(w, leaf)
                else:
                    raise KeyError(f"unmapped CAB key: {name}")
            elif sub == "attn":
                if rest[0] == "qkv":  # qkv.body Linear
                    out[f"{base}/attn/qkv/"
                        f"{'kernel' if leaf == 'weight' else 'bias'}"] = _lin(w, leaf)
                elif rest[0] == "anchor":  # anchor.body.0.reduction Linear
                    out[f"{base}/attn/anchor/"
                        f"{'kernel' if leaf == 'weight' else 'bias'}"] = _lin(w, leaf)
                elif rest[0] == "proj":
                    out[f"{base}/attn/proj/"
                        f"{'kernel' if leaf == 'weight' else 'bias'}"] = _lin(w, leaf)
                elif rest[0] == "window_attn":
                    _affine(rest[1:], w, leaf, out, f"{base}/attn/window_attn")
                elif rest[0] == "stripe_attn":
                    _affine(rest[1:], w, leaf, out, f"{base}/attn/stripe_attn")
                else:
                    raise KeyError(f"unmapped attn key: {name}")
            else:
                raise KeyError(f"unmapped block key: {name}")

        elif parts[0] in ("norm_start", "norm_end"):
            out[f"{parts[0]}/{_norm(leaf)}"] = w
        elif parts[0] in ("conv_first", "conv_after_body", "conv_last"):
            out[f"{parts[0]}/{'kernel' if leaf == 'weight' else 'bias'}"] = _conv(w, leaf)
        elif name.startswith("conv_before_upsample.0."):
            out[f"conv_before_upsample_0/"
                f"{'kernel' if leaf == 'weight' else 'bias'}"] = _conv(w, leaf)
        elif name.startswith("upsample.up."):
            out[f"upsample_{parts[2]}/"
                f"{'kernel' if leaf == 'weight' else 'bias'}"] = _conv(w, leaf)
        else:
            raise KeyError(f"unmapped GRL key: {name}")

    return {"params": unflatten(out)}
