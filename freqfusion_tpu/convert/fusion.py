"""Fusion network (CompleteEnhancedFusionSR v2) torch -> flax params.

Maps the reference's fusion_best.pth state dict (src/models/
enhanced_fusion_v2.py + phase modules) onto models/fusion/*. BatchNorm
layers split into params (scale/bias) and batch_stats (mean/var); fixed
buffers (DCT basis/masks, DWT filters, Gaussian kernel) are recomputed
statically and skipped here.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from .common import conv_kernel, dw_conv_kernel, linear_kernel, unflatten

__all__ = ["convert_fusion"]

_SKIP_SUFFIXES = (
    "dct_basis", "dct_basis_t", "low_mask", "mid_mask", "high_mask",
    "lo_row", "hi_row", "lo_col", "hi_col", "gaussian.kernel",
    "num_batches_tracked",
)

_DW_CONVS = ("local_conv", "h_conv", "v_conv")


def _is_skipped(name: str) -> bool:
    return any(name.endswith(s) for s in _SKIP_SUFFIXES)


def _put_conv(out, path, leaf, w, depthwise=False):
    if leaf == "weight":
        out[f"{path}/kernel"] = dw_conv_kernel(w) if depthwise else conv_kernel(w)
    else:
        out[f"{path}/bias"] = w


def _put_linear(out, path, leaf, w):
    out[f"{path}/{'kernel' if leaf == 'weight' else 'bias'}"] = (
        linear_kernel(w) if leaf == "weight" else w)


def _put_ln(out, path, leaf, w):
    out[f"{path}/{'scale' if leaf == 'weight' else 'bias'}"] = w


def _put_bn(params, stats, path, leaf, w):
    if leaf == "weight":
        params[f"{path}/scale"] = w
    elif leaf == "bias":
        params[f"{path}/bias"] = w
    elif leaf == "running_mean":
        stats[f"{path}/mean"] = w
    elif leaf == "running_var":
        stats[f"{path}/var"] = w
    else:
        raise KeyError(f"unexpected BN leaf {leaf} at {path}")


def _lka_block(params, stats, base, rest, leaf, w):
    """LKABlock: norm1/norm2 BN, lka convs + bn, ffn.0/.2, scale1/2."""
    sub = rest[0]
    if sub in ("scale1", "scale2"):
        params[f"{base}/{sub}"] = w
    elif sub in ("norm1", "norm2"):
        _put_bn(params, stats, f"{base}/{sub}", leaf, w)
    elif sub == "lka":
        inner = rest[1]
        if inner in _DW_CONVS:
            _put_conv(params, f"{base}/lka/{inner}", leaf, w, depthwise=True)
        elif inner == "pw_conv":
            _put_conv(params, f"{base}/lka/pw_conv", leaf, w)
        elif inner == "bn":
            _put_bn(params, stats, f"{base}/lka/bn", leaf, w)
        else:
            raise KeyError(f"unmapped LKA key {base}.{'.'.join(rest)}")
    elif sub == "ffn":
        _put_conv(params, f"{base}/ffn_{rest[1]}", leaf, w)
    else:
        raise KeyError(f"unmapped LKABlock key {base}.{'.'.join(rest)}")


def _mha(params, base, rest, leaf, w):
    """torch nn.MultiheadAttention -> TokenMultiheadAttention."""
    if rest[0] == "in_proj_weight":
        params[f"{base}/in_proj_weight"] = np.ascontiguousarray(w.T)
    elif rest[0] == "in_proj_bias":
        params[f"{base}/in_proj_bias"] = w
    elif rest[0] == "out_proj":
        _put_linear(params, f"{base}/out_proj", leaf, w)
    else:
        raise KeyError(f"unmapped MHA key {base}.{'.'.join(rest)}")


def convert_fusion(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}

    for name, w in sd.items():
        if _is_skipped(name) or name.startswith("expert_ensemble."):
            continue
        parts = name.split(".")
        leaf = parts[-1]

        # ── Phase 2 ───────────────────────────────────────────────────
        if name == "freq_decomp.dct.band_scale":
            params["freq_decomp/dct/band_scale"] = w
        elif name == "freq_decomp.dwt.subband_scale":
            params["freq_decomp/dwt/subband_scale"] = w
        elif name == "freq_decomp.fft.freq_mask_logits":
            params["freq_decomp/fft/freq_mask_logits"] = (
                np.ascontiguousarray(np.transpose(w, (0, 2, 3, 1))))
        elif name == "freq_decomp.fft.temperature":
            params["freq_decomp/fft/temperature"] = w
        elif name == "freq_decomp.fft.band_scale":
            params["freq_decomp/fft/band_scale"] = w

        # ── Phase 3: cross_band ───────────────────────────────────────
        elif parts[0] == "cross_band":
            sub = parts[1]
            if sub == "band_proj":
                _put_conv(params, "cross_band/band_proj", leaf, w)
            elif sub == "band_attention":
                _mha(params, "cross_band/band_attention", parts[2:], leaf, w)
            elif sub == "norm":
                _put_ln(params, "cross_band/norm", leaf, w)
            elif sub == "lka_block":
                _lka_block(params, stats, "cross_band/lka_block",
                           parts[2:], leaf, w)
            elif sub == "out_proj":
                _put_conv(params, "cross_band/out_proj", leaf, w)
            else:
                raise KeyError(f"unmapped cross_band key: {name}")

        # ── Phase 4: collaborative ────────────────────────────────────
        elif parts[0] == "collaborative":
            sub = parts[1]
            if sub == "align_layers":
                _put_conv(params, f"collaborative/align_{parts[2]}", leaf, w)
            elif sub == "cross_attn":
                _mha(params, "collaborative/cross_attn", parts[2:], leaf, w)
            elif sub in ("norm1", "norm2"):
                _put_ln(params, f"collaborative/{sub}", leaf, w)
            elif sub == "ffn":
                _put_linear(params, f"collaborative/ffn_{parts[2]}", leaf, w)
            elif sub == "lka_global":
                _lka_block(params, stats, "collaborative/lka_global",
                           parts[2:], leaf, w)
            elif sub == "modulation":
                _put_conv(params,
                          f"collaborative/modulation_{parts[2]}_{parts[3]}",
                          leaf, w)
            else:
                raise KeyError(f"unmapped collaborative key: {name}")

        # ── Phase 5: multi_res + freq routing ─────────────────────────
        elif parts[0] == "multi_res":
            sub = parts[1]
            if sub.endswith("_conv") or sub == "to_rgb":
                _put_conv(params, f"multi_res/{sub}_{parts[2]}", leaf, w)
            elif sub.endswith("_gate"):
                _put_conv(params, f"multi_res/{sub}/gate_{parts[3]}", leaf, w)
            elif sub.endswith("_res"):
                if parts[2] == "scale":
                    params[f"multi_res/{sub}/scale"] = w
                else:  # block.0/.2
                    _put_conv(params, f"multi_res/{sub}/block_{parts[3]}",
                              leaf, w)
            elif sub in ("residual_weight_1_2", "residual_weight_2_3"):
                params[f"multi_res/{sub}"] = w
            else:
                raise KeyError(f"unmapped multi_res key: {name}")
        elif parts[0] == "freq_weight_conv":
            _put_conv(params, f"freq_weight_conv_{parts[1]}", leaf, w)
        elif parts[0] == "simple_fusion":
            _put_conv(params, "simple_fusion", leaf, w)

        # ── Phase 6: dynamic selector ─────────────────────────────────
        elif parts[0] == "dynamic_selector":
            sub = parts[1]
            if sub == "temperature":
                params["dynamic_selector/temperature"] = w
            elif sub in ("difficulty_net", "gate_net"):
                _put_conv(params, f"dynamic_selector/{sub}_{parts[2]}", leaf, w)
            else:
                raise KeyError(f"unmapped dynamic_selector key: {name}")

        # ── Phase 7 ───────────────────────────────────────────────────
        elif parts[0] == "refine":
            _put_conv(params, f"refine_{parts[1]}", leaf, w)
        elif name == "residual_scale":
            params["residual_scale"] = w

        # ── Phase 7b: edge enhancement ────────────────────────────────
        elif parts[0] == "edge_enhance":
            sub = parts[1]
            if sub == "edge_refiners":
                i, inner = parts[2], parts[3]
                base = f"edge_enhance/edge_refiners_{i}"
                if inner in ("conv1", "conv2", "conv3", "proj"):
                    _put_conv(params, f"{base}/{inner}", leaf, w)
                elif inner == "attn":
                    _put_conv(params, f"{base}/attn_{parts[5]}", leaf, w)
                else:
                    raise KeyError(f"unmapped edge refiner key: {name}")
            elif sub == "fusion":
                _put_conv(params, f"edge_enhance/fusion_{parts[2]}", leaf, w)
            elif sub == "edge_gate":
                _put_conv(params, f"edge_enhance/edge_gate_{parts[2]}", leaf, w)
            elif sub == "level_weights":
                params["edge_enhance/level_weights"] = w
            elif sub == "edge_strength":
                params["edge_enhance/edge_strength"] = w
            else:
                raise KeyError(f"unmapped edge_enhance key: {name}")
        else:
            raise KeyError(f"unmapped fusion key: {name}")

    out: Dict[str, Any] = {"params": unflatten(params)}
    if stats:
        out["batch_stats"] = unflatten(stats)
    return out
