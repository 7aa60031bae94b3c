"""Full FreqFusionSR pipeline: 4 frozen experts + fusion, one XLA program.

Functional replacement of the reference's submission path
(models/team29_FreqFusionSR/io.py:222-289): pad LR to a multiple of 16
(reflect), run DRCT / GRL / NAFNet / MambaIR, crop SR outputs to 4x the
original size and features to the original LR size (NAFNet's HR feature is
bilinearly resized down, io.py:255-258), then run the fusion network on the
*unpadded* LR. Where the reference runs experts sequentially with
``torch.cuda.empty_cache()`` between them for OOM safety, here the whole
thing is one jitted function — XLA owns scheduling and memory.

Expert execution is also exposed separately (``run_experts``) for the
Decoupled Compute cache-extraction workflow.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.pad import pad_reflect
from ..ops.resize import resize_bilinear
from .drct import DRCT
from .fusion.fusion_v2 import CompleteEnhancedFusionSR, EXPERT_ORDER
from .grl import GRL
from .mambair import MambaIR
from .nafnet import NAFNetSR

__all__ = ["FreqFusionPipeline", "build_expert_models", "EXPERT_ORDER"]


GRL_DEPTHS = (4, 4, 8, 8, 8, 4, 4)


def build_expert_models(scale: int = 4, scan_chunk: int = 512,
                        use_scan: bool = False,
                        overrides: Optional[Dict[str, Dict[str, Any]]] = None,
                        ) -> Dict[str, Any]:
    """The four frozen experts in their challenge configurations
    (expert_loader.py:252-262, 286-338; io.py:156-163).

    use_scan=True runs repeated layer groups under nn.scan with stacked
    params (~10x smaller HLO / compile time; identical outputs — see
    tests/test_drct_scan.py, tests/test_scan_variants.py).

    overrides: per-expert kwargs sniffed from a checkpoint's tensor shapes
    (convert.drct.sniff_drct_config etc.) — the TPU-native answer to the
    reference's shape-filtered flexible loading (expert_loader.py:81-118):
    adapt the model geometry to the weights instead of dropping tensors."""
    ov = overrides or {}
    cfg = {
        "drct": dict(upscale=scale, embed_dim=180, num_layers=12,
                     num_heads=6, window_size=16, use_scan=use_scan),
        "grl": dict(upscale=scale, embed_dim=180,
                    depths=GRL_DEPTHS, num_heads_w=3,
                    num_heads_s=3, window_size=8, use_scan=use_scan),
        "nafnet": dict(upscale=scale, width=64, middle_blk_num=12,
                       enc_blk_nums=(2, 2, 4, 8),
                       dec_blk_nums=(2, 2, 2, 2)),
        "mamba": dict(upscale=scale, embed_dim=180,
                      depths=(6,) * 6, mlp_ratio=2.0,
                      scan_chunk=scan_chunk, use_scan=use_scan),
    }
    for name, kw in ov.items():
        if name in cfg:
            cfg[name].update(kw)
    return {
        "drct": DRCT(**cfg["drct"]),
        "grl": GRL(**cfg["grl"]),
        "nafnet": NAFNetSR(**cfg["nafnet"]),
        "mamba": MambaIR(**cfg["mamba"]),
    }


def restack_params_for_scan(params: Dict[str, Any]) -> Dict[str, Any]:
    """Restructure converter-produced (unrolled layers_i) expert params
    into the stacked layouts the use_scan models consume."""
    from ..convert.common import stack_layer_runs, stack_layers

    out = dict(params)
    for name in ("drct", "mamba"):
        if name in out and "layers_0" in out[name].get("params", {}):
            out[name] = {**out[name],
                         "params": stack_layers(out[name]["params"])}
    if "grl" in out and "layers_0" in out["grl"].get("params", {}):
        out["grl"] = {**out["grl"],
                      "params": stack_layer_runs(out["grl"]["params"],
                                                 GRL_DEPTHS)}
    return out


class FreqFusionPipeline:
    """Holds models + params; exposes jitted full/expert forwards.

    params layout: {'drct': vars, 'grl': vars, 'nafnet': vars,
                    'mamba': vars, 'fusion': vars} — any expert may be
    absent (graceful degradation to zero features / bilinear image like
    cached_dataset.py:176-203)."""

    FEATURE_CHANNELS = {"drct": 180, "grl": 180, "nafnet": 64, "mamba": 180}
    # class-level defaults so tests building via __new__ keep working
    expert_dtype = None
    fusion_dtype = None

    def __init__(self, params: Dict[str, Any], scale: int = 4,
                 fusion_model: Optional[CompleteEnhancedFusionSR] = None,
                 scan_chunk: int = 512, jit_mode: str = "per_expert",
                 expert_dtype=None, use_scan: bool = False,
                 model_overrides: Optional[Dict[str, Dict[str, Any]]] = None,
                 fusion_dtype=None):
        """jit_mode: 'full' compiles experts+fusion as ONE XLA program
        (maximum fusion); 'per_expert' compiles one program per expert plus
        one for the fusion net — smaller compile units (and the only mode
        the remote-compile tunnel accepts for full-size experts).

        expert_dtype: jnp.bfloat16 runs the frozen experts in bf16 (2x MXU
        rate, half the HBM traffic) — the TPU analogue of the reference's
        fp16 autocast for MambaIR (io.py:263). The selective-scan state
        stays fp32 regardless. None keeps everything fp32.

        fusion_dtype: compute dtype for the fusion network (None = fp32,
        the parity default). The round-3 trace put the 7-phase fusion at
        465 ms/img fp32 on-device — no longer negligible next to the
        bf16 experts — so benches run it bf16 (quality pinned by
        tests/test_bf16_quality.py)."""
        params = dict(params)  # don't mutate the caller's tree
        if use_scan:
            params = restack_params_for_scan(params)
        if expert_dtype is not None:
            for name in list(params):
                if name != "fusion":
                    params[name] = jax.tree_util.tree_map(
                        lambda x: x.astype(expert_dtype)
                        if hasattr(x, "astype") else x, params[name])
        if fusion_dtype is not None and "fusion" in params:
            params["fusion"] = jax.tree_util.tree_map(
                lambda x: x.astype(fusion_dtype)
                if hasattr(x, "astype") and jnp.issubdtype(
                    getattr(x, "dtype", jnp.int32), jnp.floating) else x,
                params["fusion"])
        self.fusion_dtype = fusion_dtype
        self.params = params
        self.scale = scale
        self.jit_mode = jit_mode
        self.expert_dtype = expert_dtype
        self.models = build_expert_models(scale, scan_chunk,
                                          use_scan=use_scan,
                                          overrides=model_overrides)
        self.fusion = fusion_model or CompleteEnhancedFusionSR(upscale=scale)
        self._jit_full = jax.jit(self._forward_full)
        self._jit_experts = jax.jit(self._run_experts_padded)
        self._jit_one = {
            name: jax.jit(lambda p, x, m=model: m.apply(p, x))
            for name, model in self.models.items()}
        self._jit_fusion = jax.jit(
            lambda p, lr, imgs, feats: self.fusion.apply(p, lr, imgs, feats))

    # -- core ------------------------------------------------------------
    def _run_experts_padded(self, params, lr_padded: jnp.ndarray,
                            ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """Experts on a pre-padded (multiple-of-16) LR batch; full-size out."""
        imgs, feats = {}, {}
        x = (lr_padded if self.expert_dtype is None
             else lr_padded.astype(self.expert_dtype))
        fdt = self.fusion_dtype or jnp.float32
        for name in EXPERT_ORDER:
            if name not in params:
                continue
            sr, feat = self.models[name].apply(params[name], x)
            if name == "mamba":
                sr = jnp.clip(sr, 0.0, 1.0)  # io.py:263
            imgs[name] = sr.astype(fdt)
            feats[name] = feat.astype(fdt)
        return imgs, feats

    def _forward_full(self, params, lr: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = lr.shape
        s = self.scale
        ph = (16 - h % 16) % 16
        pw = (16 - w % 16) % 16
        lr_padded = pad_reflect(lr, 0, ph, 0, pw) if (ph or pw) else lr

        imgs, feats = self._run_experts_padded(params, lr_padded)
        hp, wp = lr_padded.shape[1:3]
        for name in EXPERT_ORDER:
            if name in imgs:
                imgs[name] = imgs[name][:, : h * s, : w * s, :]
                f = feats[name]
                if f.shape[1] != hp or f.shape[2] != wp:
                    # NAFNet feature is HR-resolution; resize to LR
                    f = resize_bilinear(f, h, w)
                else:
                    f = f[:, :h, :w, :]
                feats[name] = f
            else:
                # Missing-expert fallback must match the present experts'
                # fusion dtype (bf16 fusion would otherwise see mixed
                # dtypes — ADVICE r3).
                fdt = self.fusion_dtype or jnp.float32
                imgs[name] = resize_bilinear(lr, h * s, w * s).astype(fdt)
                feats[name] = jnp.zeros(
                    (b, h, w, self.FEATURE_CHANNELS[name]), fdt)

        if self.fusion_dtype is not None:
            lr = lr.astype(self.fusion_dtype)
        out = self.fusion.apply(params["fusion"], lr, imgs, feats)
        return out.astype(jnp.float32)

    def _forward_per_expert(self, lr: jnp.ndarray) -> jnp.ndarray:
        """Same semantics as _forward_full with one jit per expert
        (io.py's sequential-expert structure, minus the empty_cache)."""
        b, h, w, _ = lr.shape
        s = self.scale
        ph = (16 - h % 16) % 16
        pw = (16 - w % 16) % 16
        lr_padded = pad_reflect(lr, 0, ph, 0, pw) if (ph or pw) else lr
        hp, wp = lr_padded.shape[1:3]

        imgs, feats = {}, {}
        x = (lr_padded if self.expert_dtype is None
             else lr_padded.astype(self.expert_dtype))
        fdt = self.fusion_dtype or jnp.float32
        for name in EXPERT_ORDER:
            if name in self.params:
                sr, f = self._jit_one[name](self.params[name], x)
                sr = sr.astype(fdt)
                f = f.astype(fdt)
                if name == "mamba":
                    sr = jnp.clip(sr, 0.0, 1.0)
                imgs[name] = sr[:, : h * s, : w * s, :]
                if f.shape[1] != hp or f.shape[2] != wp:
                    f = resize_bilinear(f, h, w)
                else:
                    f = f[:, :h, :w, :]
                feats[name] = f
            else:
                imgs[name] = resize_bilinear(lr, h * s, w * s).astype(fdt)
                feats[name] = jnp.zeros(
                    (b, h, w, self.FEATURE_CHANNELS[name]), fdt)
        if self.fusion_dtype is not None:
            lr = lr.astype(self.fusion_dtype)
        out = self._jit_fusion(self.params["fusion"], lr, imgs, feats)
        return out.astype(jnp.float32)

    # -- public ------------------------------------------------------------
    def __call__(self, lr: jnp.ndarray) -> jnp.ndarray:
        """LR [B, H, W, 3] in [0,1] -> SR [B, 4H, 4W, 3]."""
        if self.jit_mode == "full":
            return self._jit_full(self.params, lr)
        return self._forward_per_expert(lr)

    def run_experts(self, lr_padded: jnp.ndarray):
        """Expert outputs/features for cache extraction (padded input)."""
        return self._jit_experts(self.params, lr_padded)
