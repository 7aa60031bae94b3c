"""Legacy v1 fusion stack (compat layer for the pre-v2 models).

Functional re-design of src/models/fusion_network.py (1499 LoC) — the
earlier 3-expert fusion family the reference keeps for compatibility
(train.py:774-783 can still instantiate a standalone FrequencyAwareFusion).
Implemented components and their reference anchors:

  - ChannelAttention / SpatialAttention / ChannelSpatialAttention (:47-165)
  - FrequencyRouter: 5-conv attention router -> softmax expert weights per
    frequency band, [B, H, W, E, bands] here (:383-541)
  - MultiScaleFeatureExtractor: 1x/2x/4x conv pyramid (:543-612)
  - FrequencyAwareFusion: DCT-band-aware routed expert blend + learnable
    per-band expert weights + refinement + bilinear residual (:614-846) —
    the module behind the v1 "33.7+ dB" claim (:625)
  - MultiResolutionFusion: 64->128->256 progressive weighted blend (:956+)
  - EnhancedMultiFusionSR semantics collapse into the flags of the v2
    CompleteEnhancedFusionSR; only the fusion cores live here.

No v1 checkpoints are published, so this is a capability port (same module
contracts, TPU-native NHWC internals), not a weight-compatible one.
"""

from __future__ import annotations

from typing import Dict, List, Union

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import resize_bilinear

__all__ = [
    "ChannelSpatialAttention", "FrequencyRouter",
    "MultiScaleFeatureExtractor", "FrequencyAwareFusion",
    "MultiResolutionFusion",
]


class ChannelSpatialAttention(nn.Module):
    """Squeeze-excite channel attention followed by a spatial gate
    (fusion_network.py:47-165)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        # channel attention
        pooled = x.mean(axis=(1, 2), keepdims=True)
        a = nn.Conv(max(c // self.reduction, 1), (1, 1), name="ca_fc1")(pooled)
        a = nn.Conv(c, (1, 1), name="ca_fc2")(nn.relu(a))
        x = x * nn.sigmoid(a)
        # spatial attention over channel stats
        stats = jnp.concatenate([x.mean(-1, keepdims=True),
                                 x.max(-1, keepdims=True)], axis=-1)
        s = nn.Conv(1, (7, 7), padding=((3, 3), (3, 3)), name="sa_conv")(stats)
        return x * nn.sigmoid(s)


def _conv_relu_bn(x, ch, name, train):
    x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                name=f"{name}_conv")(x)
    x = nn.relu(x)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=f"{name}_bn")(x)


class FrequencyRouter(nn.Module):
    """Attention-augmented conv router -> per-pixel softmax expert weights
    for each frequency band (fusion_network.py:383-541).
    Output: [B, H, W, num_experts, num_bands]."""

    num_experts: int = 3
    num_bands: int = 3
    hidden: tuple = (32, 64, 64, 32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, _ = x.shape
        x = _conv_relu_bn(x, self.hidden[0], "l1", train)
        x = _conv_relu_bn(x, self.hidden[1], "l2", train)
        x = ChannelSpatialAttention(name="attention1")(x, train)
        x = _conv_relu_bn(x, self.hidden[2], "l3", train)
        x = _conv_relu_bn(x, self.hidden[3], "l4", train)
        logits = nn.Conv(self.num_experts * self.num_bands, (1, 1),
                         name="head")(x)
        logits = logits.reshape(b, h, w, self.num_experts, self.num_bands)
        return nn.softmax(logits, axis=-2)  # softmax over experts


class MultiScaleFeatureExtractor(nn.Module):
    """1x/2x/4x conv pyramid fused to out_channels
    (fusion_network.py:543-612)."""

    out_channels: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, _ = x.shape
        f1 = _conv_relu_bn(x, self.out_channels, "s1", train)
        x2 = resize_bilinear(x, max(h // 2, 1), max(w // 2, 1))
        f2 = resize_bilinear(_conv_relu_bn(x2, self.out_channels, "s2", train),
                             h, w)
        x4 = resize_bilinear(x, max(h // 4, 1), max(w // 4, 1))
        f4 = resize_bilinear(_conv_relu_bn(x4, self.out_channels, "s4", train),
                             h, w)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       name="fusion")(jnp.concatenate([f1, f2, f4], axis=-1))


class FrequencyAwareFusion(nn.Module):
    """Routed per-band expert blend (fusion_network.py:614-846)."""

    num_experts: int = 3
    num_bands: int = 3
    use_residual: bool = True
    use_multiscale: bool = True
    upscale: int = 4

    @nn.compact
    def __call__(self, lr_input: jnp.ndarray,
                 expert_outputs: Union[List[jnp.ndarray],
                                       Dict[str, jnp.ndarray]],
                 train: bool = False) -> jnp.ndarray:
        if isinstance(expert_outputs, dict):
            expert_outputs = list(expert_outputs.values())
        n_e = len(expert_outputs)
        stack = jnp.stack(expert_outputs, axis=-2)      # [B, Hh, Wh, E, 3]
        h_hr, w_hr = stack.shape[1], stack.shape[2]

        router_in = lr_input
        if self.use_multiscale:
            router_in = MultiScaleFeatureExtractor(
                32, name="multiscale")(lr_input, train)
        routing = FrequencyRouter(self.num_experts, self.num_bands,
                                  name="freq_router")(router_in, train)
        routing = routing[..., :n_e, :]                 # [B, H, W, E, bands]

        b, h, w = routing.shape[:3]
        flat = routing.reshape(b, h, w, n_e * self.num_bands)
        flat_hr = resize_bilinear(flat, h_hr, w_hr)
        routing_hr = flat_hr.reshape(b, h_hr, w_hr, n_e, self.num_bands)

        expert_weights = self.param("expert_weights", nn.initializers.ones,
                                    (self.num_experts, self.num_bands))
        band_importance = self.param("band_importance", nn.initializers.ones,
                                     (self.num_bands,))
        weighted = routing_hr * expert_weights[None, None, None, :n_e, :]
        weighted = weighted * nn.softmax(band_importance)[None, None, None, None]
        agg = weighted.sum(axis=-1)                     # [B, Hh, Wh, E]
        agg = agg / (agg.sum(axis=-1, keepdims=True) + 1e-8)

        fused = (stack * agg[..., None]).sum(axis=-2)   # [B, Hh, Wh, 3]

        r = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name="refine_0")(fused)
        r = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name="refine_2")(nn.relu(r))
        fused = fused + r * 0.1

        if self.use_residual:
            residual_weight = self.param(
                "residual_weight", lambda rng: jnp.asarray(0.1, jnp.float32))
            fused = fused + residual_weight * resize_bilinear(
                lr_input, h_hr, w_hr)
        return jnp.clip(fused, 0.0, 1.0)


class MultiResolutionFusion(nn.Module):
    """Progressive HR/4 -> HR/2 -> HR weighted blend
    (fusion_network.py:956-1085)."""

    num_experts: int = 3

    @nn.compact
    def __call__(self, lr_input: jnp.ndarray,
                 expert_outputs: List[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        n_e = len(expert_outputs)
        stack = jnp.stack(expert_outputs, axis=-2)      # [B, Hh, Wh, E, 3]
        h_hr, w_hr = stack.shape[1], stack.shape[2]

        def weights_head(x, name):
            y = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"{name}_0")(x)
            y = nn.Conv(n_e, (1, 1), name=f"{name}_2")(nn.relu(y))
            return nn.softmax(y, axis=-1)

        def blend(size_h, size_w, prev, name):
            flat = stack.reshape(*stack.shape[:3], n_e * 3)
            experts_s = resize_bilinear(flat, size_h, size_w).reshape(
                stack.shape[0], size_h, size_w, n_e, 3)
            lr_s = resize_bilinear(lr_input, size_h, size_w)
            wmap = weights_head(lr_s, name)
            fused = (experts_s * wmap[..., None]).sum(axis=-2)
            if prev is not None:
                up = resize_bilinear(prev, size_h, size_w)
                up = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)),
                             name=f"{name}_up")(up)
                fused = fused + 0.5 * up
            return fused

        f1 = blend(max(h_hr // 4, 1), max(w_hr // 4, 1), None, "fusion_64")
        f2 = blend(max(h_hr // 2, 1), max(w_hr // 2, 1), f1, "fusion_128")
        f3 = blend(h_hr, w_hr, f2, "fusion_256")

        r = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), name="refine_0")(f3)
        r = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)),
                    name="refine_2")(nn.relu(r))
        return jnp.clip(f3 + 0.1 * r, 0.0, 1.0)
