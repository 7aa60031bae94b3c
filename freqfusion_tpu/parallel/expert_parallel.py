"""Expert parallelism: each frozen expert on its own device (group).

The reference approximates this with a ThreadPoolExecutor over CUDA
streams on ONE GPU (scripts/test_parallel_speed.py) — bounded by single-
device FLOPs. On a TPU pod slice the ensemble is embarrassingly parallel
ACROSS chips: each expert's params live on a different device, the host
dispatches all four forwards asynchronously (JAX dispatch is non-blocking;
computation follows data placement), and the fusion step gathers the SR
outputs/features to the fusion device. Wall-clock becomes
max(expert times) + fusion instead of their sum — with MambaIR dominating
at ~2.3 s bf16, ensemble latency drops to MambaIR's own latency on 4
chips (measured components in BENCH_NOTES.md).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..models.pipeline import EXPERT_ORDER, FreqFusionPipeline
from ..ops.resize import resize_bilinear

__all__ = ["ExpertParallelPipeline"]


class ExpertParallelPipeline:
    """4 experts on 4 devices + fusion on the first, host-async dispatch.

    params: the usual {'drct': vars, ..., 'fusion': vars} tree; missing
    experts degrade exactly like FreqFusionPipeline (bilinear + zero
    features, io.py:93-98 semantics).
    """

    def __init__(self, params: Dict[str, Any], scale: int = 4,
                 devices: Optional[Sequence[jax.Device]] = None,
                 fusion_model=None, models: Optional[Dict[str, Any]] = None,
                 expert_dtype=None):
        from ..models.fusion.fusion_v2 import CompleteEnhancedFusionSR
        from ..models.pipeline import build_expert_models

        devices = list(devices if devices is not None else jax.devices())
        self.scale = scale
        self.expert_dtype = expert_dtype
        self.models = models or build_expert_models(scale)
        self.fusion = fusion_model or CompleteEnhancedFusionSR(upscale=scale)
        self.fusion_device = devices[0]
        self.FEATURE_CHANNELS = dict(FreqFusionPipeline.FEATURE_CHANNELS)

        self.expert_devices: Dict[str, jax.Device] = {}
        self.params: Dict[str, Any] = {}
        present = [n for n in EXPERT_ORDER if n in params]
        for i, name in enumerate(present):
            dev = devices[i % len(devices)]
            self.expert_devices[name] = dev
            p = params[name]
            if expert_dtype is not None:
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(expert_dtype)
                    if hasattr(x, "astype") else x, p)
            self.params[name] = jax.device_put(p, dev)
        self.params["fusion"] = jax.device_put(params["fusion"],
                                               self.fusion_device)

        self._jit_one = {
            name: jax.jit(lambda p, x, m=self.models[name]: m.apply(p, x))
            for name in self.expert_devices}
        self._jit_fusion = jax.jit(
            lambda p, lr, i, f: self.fusion.apply(p, lr, i, f))

    def __call__(self, lr: jnp.ndarray) -> jnp.ndarray:
        """LR [B, H, W, 3] -> SR [B, sH, sW, 3]. All expert forwards are
        dispatched before any result is awaited."""
        from ..ops.pad import pad_reflect

        b, h, w, _ = lr.shape
        s = self.scale
        mult = 16
        ph = (mult - h % mult) % mult
        pw = (mult - w % mult) % mult
        lr_padded = pad_reflect(lr, 0, ph, 0, pw) if (ph or pw) else lr
        hp, wp = lr_padded.shape[1:3]

        # Dispatch phase: one async device_put + forward per expert.
        futures = {}
        for name, dev in self.expert_devices.items():
            x = jax.device_put(lr_padded, dev)
            if self.expert_dtype is not None:
                x = x.astype(self.expert_dtype)
            futures[name] = self._jit_one[name](self.params[name], x)

        # Gather phase: move results to the fusion device.
        imgs, feats = {}, {}
        lr_f = jax.device_put(lr, self.fusion_device)
        for name in EXPERT_ORDER:
            if name in futures:
                sr, f = futures[name]
                sr = jax.device_put(sr, self.fusion_device).astype(
                    jnp.float32)
                f = jax.device_put(f, self.fusion_device).astype(jnp.float32)
                if name == "mamba":
                    sr = jnp.clip(sr, 0.0, 1.0)
                imgs[name] = sr[:, : h * s, : w * s, :]
                if f.shape[1] != hp or f.shape[2] != wp:
                    # NAFNet feature is HR-resolution; resize to LR
                    f = resize_bilinear(f, h, w)
                else:
                    f = f[:, :h, :w, :]
                feats[name] = f
            else:
                imgs[name] = resize_bilinear(lr_f, h * s, w * s)
                feats[name] = jnp.zeros(
                    (b, h, w, self.FEATURE_CHANNELS[name]), jnp.float32)
        return self._jit_fusion(self.params["fusion"], lr_f, imgs, feats)
