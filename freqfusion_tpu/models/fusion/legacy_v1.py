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

import functools
from typing import Dict, List, Union

import numpy as np

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import resize_bilinear

__all__ = [
    "ChannelSpatialAttention", "FrequencyRouter",
    "MultiScaleFeatureExtractor", "FrequencyAwareFusion",
    "MultiResolutionFusion", "FrequencyDecomposition",
    "AdaptiveFrequencyBandPredictor", "CrossBandAttention",
    "DynamicExpertSelectorV1", "CollaborativeFeatureLearning",
    "MultiFusionSR", "EnhancedMultiFusionSR", "CompleteEnhancedFusionSRV1",
]

def _gelu(x):
    """Exact (erf) GELU — torch nn.GELU()'s default, which every fusion
    module in the reference uses (e.g. edge_enhancement.py, 17 sites)."""
    return nn.gelu(x, approximate=False)



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


# ---------------------------------------------------------------------------
# Remaining v1 family (round-2 completion of the capability port)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _zigzag_ratio_masks_np(n: int, low_split: float,
                           high_split: float) -> np.ndarray:
    """[3, n, n] masks splitting zigzag order at ratio thresholds
    (src/data/frequency_decomposition.py:137-168: low = order <
    total*low_split, high = order >= total*high_split)."""
    order = np.zeros((n, n), dtype=np.int64)
    idx = 0
    for s in range(2 * n - 1):
        diag = [(i, s - i) for i in range(max(0, s - n + 1), min(s, n - 1) + 1)]
        if s % 2 == 0:
            diag = diag[::-1]
        for i, j in diag:
            order[i, j] = idx
            idx += 1
    total = n * n
    low = (order < int(total * low_split)).astype(np.float32)
    high = (order >= int(total * high_split)).astype(np.float32)
    mid = 1.0 - low - high
    return np.stack([low, mid, high])


class FrequencyDecomposition(nn.Module):
    """Data-side 3-band DCT decomposition
    (src/data/frequency_decomposition.py:56-300): 8x8 orthonormal
    DCT-II, zigzag ratio masks (default 25/75 split), inverse transform.

    Split ratios are STATIC python floats: the reference's adaptive path
    host-syncs them anyway (enhanced_fusion.py:426-427 calls .item()),
    so a traced-value threshold never existed."""

    block_size: int = 8

    def decompose(self, x: jnp.ndarray, low_split: float = 0.25,
                  high_split: float = 0.75):
        from .frequency import _dct_basis_np
        from ...ops.pad import pad_reflect

        n = self.block_size
        b, h, w, c = x.shape
        ph = (n - h % n) % n
        pw = (n - w % n) % n
        xp = pad_reflect(x, 0, ph, 0, pw) if (ph or pw) else x
        hp, wp = h + ph, w + pw
        nh, nw = hp // n, wp // n

        basis = jnp.asarray(_dct_basis_np(n))
        masks = jnp.asarray(_zigzag_ratio_masks_np(n, low_split, high_split))

        blocks = xp.reshape(b, nh, n, nw, n, c).transpose(0, 1, 3, 5, 2, 4)
        coeffs = jnp.einsum("ki,...ij,lj->...kl", basis, blocks, basis,
                            preferred_element_type=jnp.float32)
        out = []
        for band in range(3):
            spatial = jnp.einsum("ki,...kl,lj->...ij", basis,
                                 coeffs * masks[band], basis,
                                 preferred_element_type=jnp.float32)
            img = spatial.transpose(0, 1, 4, 2, 5, 3).reshape(b, hp, wp, c)
            out.append(img[:, :h, :w, :])
        return out

    def __call__(self, x: jnp.ndarray):
        return self.decompose(x)


class AdaptiveFrequencyBandPredictor(nn.Module):
    """Image-adaptive band split ratios (fusion_network.py:321-378)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b = x.shape[0]
        pooled = x.mean(axis=(1, 2), keepdims=True)        # [B, 1, 1, 3]
        y = nn.Conv(16, (1, 1), name="pred_0")(pooled)
        y = nn.Conv(2, (1, 1), name="pred_2")(nn.relu(y))
        offsets = (nn.sigmoid(y).reshape(b, 2) - 0.5) * 0.2
        base_low = self.param("base_low_split",
                              lambda rng: jnp.asarray(0.25))
        base_high = self.param("base_high_split",
                               lambda rng: jnp.asarray(0.75))
        low = jnp.clip(base_low + offsets[:, 0:1], 0.15, 0.4)
        high = jnp.clip(base_high + offsets[:, 1:2], 0.6, 0.9)
        high = jnp.maximum(high, low + 0.2)
        return low, high


class CrossBandAttention(nn.Module):
    """Non-LKA cross-band attention (fusion_network.py:243-318): shared
    3->dim projection, per-pixel token MHA over bands + residual, shared
    dim->3 out projection + residual."""

    dim: int = 32
    num_heads: int = 4

    @nn.compact
    def __call__(self, bands: List[jnp.ndarray],
                 train: bool = False) -> List[jnp.ndarray]:
        from .lka import TokenMultiheadAttention

        proj = nn.Conv(self.dim, (1, 1), name="band_proj")
        projected = jnp.stack([proj(b) for b in bands], axis=-2)
        normed = nn.LayerNorm(name="norm")(projected)
        attn = TokenMultiheadAttention(self.num_heads,
                                       name="band_attention")(normed, train)
        attn = attn + projected
        out_proj = nn.Conv(3, (1, 1), name="out_proj")
        return [out_proj(attn[..., i, :]) + bands[i]
                for i in range(len(bands))]


class DynamicExpertSelectorV1(nn.Module):
    """Difficulty-driven soft expert gates (fusion_network.py:167-236).
    The v2 selector (fusion_v2.py:36-63) simplified this; v1 adds the
    near-max floor gates = max(gates, (gates >= 0.99*max)*0.9)."""

    hidden_dim: int = 32
    num_experts: int = 3

    @nn.compact
    def __call__(self, lr_input: jnp.ndarray, routing_features: jnp.ndarray):
        h = nn.Conv(self.hidden_dim, (3, 3), padding=((1, 1), (1, 1)),
                    name="diff_0")(lr_input)
        h = nn.Conv(self.hidden_dim // 2, (3, 3), padding=((1, 1), (1, 1)),
                    name="diff_2")(nn.relu(h))
        difficulty = nn.sigmoid(
            nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                    name="diff_4")(nn.relu(h)))

        g = nn.Conv(self.hidden_dim, (3, 3), padding=((1, 1), (1, 1)),
                    name="gate_0")(routing_features)
        gates = nn.sigmoid(nn.Conv(self.num_experts, (1, 1),
                                   name="gate_2")(nn.relu(g)))

        threshold = 0.7 - 0.4 * difficulty
        gates = nn.sigmoid(10.0 * (gates - threshold))
        max_gate = gates.max(axis=-1, keepdims=True)
        floor = (gates >= max_gate * 0.99).astype(gates.dtype) * 0.9
        gates = jnp.maximum(gates, floor)
        return gates, difficulty


class CollaborativeFeatureLearning(nn.Module):
    """v1 cross-expert feature sharing (fusion_network.py:1087-1242):
    per-expert align convs, per-pixel MHA + FFN over the expert axis,
    global-pooled sigmoid modulation of each expert's SR output."""

    num_experts: int = 4
    feature_dim: int = 64
    num_heads: int = 8

    EXPERT_NAMES = ("drct", "grl", "nafnet", "mamba")

    @nn.compact
    def __call__(self, expert_features, expert_outputs: List[jnp.ndarray],
                 train: bool = False) -> List[jnp.ndarray]:
        from .lka import TokenMultiheadAttention

        names = self.EXPERT_NAMES[: self.num_experts]
        aligned = [nn.Conv(self.feature_dim, (1, 1), name=f"align_{n}")(
            expert_features[n]) for n in names if n in expert_features]
        if not aligned:
            return expert_outputs
        stacked = jnp.stack(aligned, axis=-2)              # [B, H, W, E, C]

        normed = nn.LayerNorm(name="norm1")(stacked)
        attn = TokenMultiheadAttention(self.num_heads, name="cross_attn")(
            normed, train)
        stacked = stacked + attn
        y = nn.LayerNorm(name="norm2")(stacked)
        y = nn.Dense(self.feature_dim * 4, name="ffn_0")(y)
        y = nn.Dense(self.feature_dim, name="ffn_3")(_gelu(y))
        stacked = stacked + y

        out = []
        for i, sr in enumerate(expert_outputs):
            pooled = stacked[..., i, :].mean(axis=(1, 2), keepdims=True)
            mod = nn.sigmoid(nn.Conv(3, (1, 1),
                                     name=f"modulation_{i}")(pooled))
            e = sr * (1.0 + 0.2 * (mod - 0.5))
            out.append(jnp.clip(e, 0.0, 1.0))
        return out


class MultiFusionSR(nn.Module):
    """v1 top-level pipeline over EXPLICIT expert outputs
    (fusion_network.py:848-952). The reference holds a frozen
    ExpertEnsemble and no_grads through it; the TPU-native contract takes
    the expert SR images directly — same trainable surface (the
    FrequencyAwareFusion core), no hook machinery."""

    num_experts: int = 3
    block_size: int = 8
    upscale: int = 4

    @nn.compact
    def __call__(self, lr_input: jnp.ndarray,
                 expert_outputs: List[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        return FrequencyAwareFusion(
            num_experts=self.num_experts, name="fusion")(
            lr_input, expert_outputs, train)


class EnhancedMultiFusionSR(nn.Module):
    """v1 enhanced pipeline (fusion_network.py:1245-1337): multi-res
    fusion when enabled, else the FrequencyAwareFusion core. (The other
    enhancement modules are constructed but unused in the reference's own
    forward, :1312-1331 — mirrored here by simply not wiring them.)"""

    num_experts: int = 3
    upscale: int = 4
    use_multi_resolution: bool = False

    @nn.compact
    def __call__(self, lr_input: jnp.ndarray,
                 expert_outputs: List[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        if self.use_multi_resolution:
            return MultiResolutionFusion(
                num_experts=self.num_experts, name="multi_res_fusion")(
                lr_input, expert_outputs, train)
        return FrequencyAwareFusion(
            num_experts=self.num_experts, name="fusion")(
            lr_input, expert_outputs, train)


class CompleteEnhancedFusionSRV1(nn.Module):
    """v1 CompleteEnhancedFusionSR (enhanced_fusion.py:60-739), cached
    mode: the 7-phase predecessor of fusion_v2 with 3-band DCT guidance,
    non-LKA cross-band attention and collaborative learning.

    Adaptive-band deviation: the reference host-syncs the predicted split
    ratios to python floats for the DCT masks (enhanced_fusion.py:426-427
    .item()) — impossible under jit. Here the masks use the base 25/75
    split and the predicted ratios drive only the (traced) per-band scale
    factors, preserving the learnable surface."""

    num_experts: int = 4
    num_bands: int = 3
    block_size: int = 8
    upscale: int = 4
    fusion_dim: int = 64
    num_heads: int = 4
    refine_depth: int = 4
    refine_channels: int = 64
    enable_hierarchical: bool = True
    enable_dynamic_selection: bool = True
    enable_cross_band_attn: bool = True
    enable_adaptive_bands: bool = True
    enable_collaborative: bool = True

    @nn.compact
    def __call__(self, lr_input: jnp.ndarray, expert_imgs,
                 expert_feats=None, train: bool = False) -> jnp.ndarray:
        from .hierarchical import HierarchicalMultiResolutionFusion

        names = [n for n in CollaborativeFeatureLearning.EXPERT_NAMES
                 if n in expert_imgs][: self.num_experts]
        expert_list = [expert_imgs[n] for n in names]
        h_hr, w_hr = expert_list[0].shape[1], expert_list[0].shape[2]

        # Phases 2+3: 3-band DCT + adaptive scales + cross-band attention
        decomp = FrequencyDecomposition(self.block_size, name="freq_decomp")
        bands = decomp.decompose(lr_input)
        if self.enable_adaptive_bands:
            low_s, high_s = AdaptiveFrequencyBandPredictor(
                name="adaptive_band_predictor")(lr_input)
            low_scale = (low_s / 0.25).reshape(-1, 1, 1, 1)
            high_scale = ((1.0 - high_s) / 0.25).reshape(-1, 1, 1, 1)
            mid_scale = 1.0 + 0.1 * (1.0 - low_scale - high_scale)
            scales = (low_scale, mid_scale, high_scale)
            bands = [b * (0.9 + 0.2 * nn.sigmoid(s - 1.0))
                     for b, s in zip(bands, scales)]
        if self.enable_cross_band_attn:
            bands = CrossBandAttention(self.fusion_dim, self.num_heads,
                                       name="cross_band_attn")(bands, train)

        # Phase 4: collaborative learning over precomputed features
        if self.enable_collaborative and expert_feats is not None and all(
                n in expert_feats for n in names):
            expert_list = CollaborativeFeatureLearning(
                num_experts=len(names), feature_dim=self.fusion_dim * 2,
                num_heads=self.num_heads * 2, name="collaborative")(
                expert_feats, expert_list, train)

        # Phase 5: hierarchical fusion + frequency-guided blend
        mags = [jnp.abs(b).mean(axis=-1, keepdims=True) for b in bands]
        total = mags[0] + mags[1] + mags[2] + 1e-8
        # high->first expert, mid->second, low->third (enhanced_fusion
        # :528-536); extra experts get a uniform share
        guide = [mags[2] / total, mags[1] / total, mags[0] / total]
        while len(guide) < len(names):
            guide.append(jnp.full_like(mags[0], 1.0 / len(names)))
        guidance = jnp.concatenate(guide[: len(names)], axis=-1)

        if self.enable_hierarchical:
            fused = HierarchicalMultiResolutionFusion(
                num_experts=len(names), base_channels=self.fusion_dim,
                name="multi_res_fusion")(dict(zip(names, expert_list)))
            g_hr = resize_bilinear(guidance, h_hr, w_hr)
            stack = jnp.stack(expert_list, axis=-2)
            freq_weighted = (stack * g_hr[..., None]).sum(axis=-2)
            fused = fused * 0.7 + freq_weighted * 0.3
        else:
            g_hr = resize_bilinear(guidance, h_hr, w_hr)
            stack = jnp.stack(expert_list, axis=-2)
            fused = (stack * g_hr[..., None]).sum(axis=-2)

        # Phase 6: dynamic selection blend
        if self.enable_dynamic_selection:
            ms = MultiScaleFeatureExtractor(
                out_channels=self.fusion_dim, name="multiscale")(
                lr_input, train)
            gates, difficulty = DynamicExpertSelectorV1(
                hidden_dim=self.fusion_dim, num_experts=len(names),
                name="dynamic_selector")(lr_input, ms)
            gates_hr = resize_bilinear(gates, h_hr, w_hr)
            stack = jnp.stack(expert_list, axis=-2)
            gated = (stack * gates_hr[..., None]).sum(axis=-2)
            gated = gated / (gates_hr.sum(-1, keepdims=True) + 1e-8)
            diff_hr = resize_bilinear(difficulty, h_hr, w_hr)
            fused = fused * (1.0 - 0.3 * diff_hr) + gated * (0.3 * diff_hr)

        # Phase 7: refinement + bilinear residual (enhanced_fusion
        # :642-672)
        y = fused
        for i in range(self.refine_depth):
            if i == self.refine_depth - 1:
                y = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"refine_{i}")(y)
            else:
                y = _gelu(nn.Conv(
                    self.refine_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name=f"refine_{i}")(y))
        fused = fused + 0.1 * y
        residual_scale = self.param("residual_scale",
                                    lambda rng: jnp.asarray(0.1))
        fused = fused + residual_scale * resize_bilinear(lr_input, h_hr, w_hr)
        return jnp.clip(fused, 0.0, 1.0)
