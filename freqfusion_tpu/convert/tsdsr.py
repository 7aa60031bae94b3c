"""TSD-SR torch checkpoints -> flax params (models/tsdsr.py).

convert_tsdsr_dit: the reference's TSDSRDiT state dict (dit.py:323-391;
keys under ``dit.``). convert_sd_vae: the diffusers AutoencoderKL layout
the wrapper loads (tsdsr_wrapper.py:75-105; encoder/decoder/quant convs).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .common import conv_kernel, linear_kernel, unflatten

__all__ = ["convert_tsdsr_dit", "convert_sd_vae"]


def _lin(out: Dict, base: str, w: np.ndarray, leaf: str) -> None:
    out[f"{base}/{'kernel' if leaf == 'weight' else 'bias'}"] = (
        linear_kernel(w) if leaf == "weight" else w)


def _conv(out: Dict, base: str, w: np.ndarray, leaf: str) -> None:
    out[f"{base}/{'kernel' if leaf == 'weight' else 'bias'}"] = (
        conv_kernel(w) if leaf == "weight" else w)


def convert_tsdsr_dit(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, np.ndarray] = {}
    for name, w in sd.items():
        parts = name.split(".")
        if parts[0] == "dit":
            parts = parts[1:]
        leaf = parts[-1]
        if parts[0] == "patch_embed":
            _conv(out, "dit/patch_embed", w, leaf)
        elif parts[0] == "time_embed":
            _lin(out, f"dit/time_{parts[1]}", w, leaf)
        elif parts[0] == "blocks":
            i, sub = parts[1], parts[2]
            base = f"dit/blocks_{i}"
            if sub in ("norm1", "norm2"):
                _lin(out, f"{base}/{sub}/linear", w, leaf)
            elif sub == "attn":
                _lin(out, f"{base}/attn_{parts[3]}", w, leaf)
            elif sub == "mlp":
                _lin(out, f"{base}/mlp_{parts[3]}", w, leaf)
            else:
                raise KeyError(f"unmapped DiT block key: {name}")
        elif parts[0] == "norm":
            out[f"dit/norm/{'scale' if leaf == 'weight' else 'bias'}"] = w
        elif parts[0] == "final_layer":
            _lin(out, "dit/final_layer", w, leaf)
        else:
            raise KeyError(f"unmapped DiT key: {name}")
    return {"params": unflatten(out)}


def _vae_resnet(out: Dict, base: str, rest, w, leaf) -> None:
    sub = rest[0]
    if sub in ("norm1", "norm2"):
        out[f"{base}/{sub}/{'scale' if leaf == 'weight' else 'bias'}"] = w
    elif sub in ("conv1", "conv2", "conv_shortcut"):
        _conv(out, f"{base}/{sub}", w, leaf)
    else:
        raise KeyError(f"unmapped VAE resnet key: {base}.{sub}")


def _vae_attn(out: Dict, base: str, rest, w, leaf) -> None:
    sub = rest[0]
    if sub == "group_norm":
        out[f"{base}/group_norm/"
            f"{'scale' if leaf == 'weight' else 'bias'}"] = w
    elif sub in ("to_q", "to_k", "to_v"):
        _lin(out, f"{base}/{sub}", w, leaf)
    elif sub == "to_out":
        _lin(out, f"{base}/to_out", w, leaf)
    else:
        raise KeyError(f"unmapped VAE attn key: {base}.{sub}")


def convert_sd_vae(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, np.ndarray] = {}
    for name, w in sd.items():
        parts = name.split(".")
        leaf = parts[-1]
        side = parts[0]
        if name.startswith("quant_conv."):
            _conv(out, "encoder/quant_conv", w, leaf)
        elif name.startswith("post_quant_conv."):
            _conv(out, "decoder/post_quant_conv", w, leaf)
        elif side in ("encoder", "decoder"):
            rest = parts[1:]
            if rest[0] == "conv_in":
                _conv(out, f"{side}/conv_in", w, leaf)
            elif rest[0] == "conv_out":
                _conv(out, f"{side}/conv_out", w, leaf)
            elif rest[0] == "conv_norm_out":
                out[f"{side}/norm_out/"
                    f"{'scale' if leaf == 'weight' else 'bias'}"] = w
            elif rest[0] in ("down_blocks", "up_blocks"):
                i = rest[1]
                kind = "down" if rest[0] == "down_blocks" else "up"
                if rest[2] == "resnets":
                    j = rest[3]
                    _vae_resnet(out, f"{side}/{kind}_{i}_block_{j}",
                                rest[4:], w, leaf)
                elif rest[2] in ("downsamplers", "upsamplers"):
                    _conv(out, f"{side}/{kind}_{i}_{rest[2][:-2]}", w, leaf)
                else:
                    raise KeyError(f"unmapped VAE key: {name}")
            elif rest[0] == "mid_block":
                if rest[1] == "resnets":
                    j = int(rest[2])
                    _vae_resnet(out, f"{side}/mid_block_{j + 1}",
                                rest[3:], w, leaf)
                elif rest[1] == "attentions":
                    _vae_attn(out, f"{side}/mid_attn", rest[3:], w, leaf)
                else:
                    raise KeyError(f"unmapped VAE key: {name}")
            else:
                raise KeyError(f"unmapped VAE key: {name}")
        else:
            raise KeyError(f"unmapped VAE key: {name}")
    return {"params": unflatten(out)}
