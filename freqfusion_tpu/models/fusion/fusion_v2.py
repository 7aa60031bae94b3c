"""The 7-phase fusion network (trainable core, ~1.2M params).

Re-design of src/models/enhanced_fusion_v2.py:417-829. The whole pipeline
(Phases 2-7b) is one pure function under jit: frequency decomposition,
cross-band attention, collaborative expert attention, hierarchical fusion +
frequency-guided routing, per-pixel difficulty gating, CNN refinement,
Laplacian edge enhancement, bilinear LR residual.

Unlike the reference there is no "cached vs live" branching inside the
model: expert outputs and features are explicit inputs (the functional
equivalent of forward_with_precomputed, reference :642-675). The live path
composes this module with the expert ensemble at a higher level.

Expert ordering is pinned to ['drct', 'grl', 'nafnet', 'mamba']
(reference :666, :692).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import resize_bilinear
from .edge import LaplacianPyramidRefinement
from .frequency import MultiDomainFrequencyDecomposition
from .hierarchical import HierarchicalMultiResolutionFusion
from .lka import EnhancedCollaborativeWithLKA, EnhancedCrossBandWithLKA
from ...ops.conv1x1 import Conv1x1

__all__ = ["DynamicExpertSelector", "CompleteEnhancedFusionSR", "EXPERT_ORDER"]

def _gelu(x):
    """Exact (erf) GELU — torch nn.GELU()'s default, which every fusion
    module in the reference uses (e.g. edge_enhancement.py, 17 sites)."""
    return nn.gelu(x, approximate=False)


EXPERT_ORDER = ("drct", "grl", "nafnet", "mamba")


class DynamicExpertSelector(nn.Module):
    """Per-pixel difficulty estimation + adaptive-threshold expert gating
    (reference :417-466)."""

    hidden_dim: int = 32
    num_experts: int = 4

    @nn.compact
    def __call__(self, lr_input: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        def head(x, out_ch, out_kernel, name):
            h = nn.relu(nn.Conv(self.hidden_dim, (3, 3),
                                padding=((1, 1), (1, 1)), name=f"{name}_0")(x))
            h = nn.relu(nn.Conv(self.hidden_dim, (3, 3),
                                padding=((1, 1), (1, 1)), name=f"{name}_2")(h))
            pad = out_kernel // 2
            return nn.Conv(out_ch, (out_kernel, out_kernel),
                           padding=((pad, pad), (pad, pad)), name=f"{name}_4")(h)

        temperature = self.param("temperature",
                                 lambda rng: jnp.asarray(10.0, jnp.float32))
        difficulty = nn.sigmoid(head(lr_input, 1, 3, "difficulty_net"))
        raw_gates = head(lr_input, self.num_experts, 1, "gate_net")
        threshold = 0.7 - 0.5 * difficulty
        gates = nn.sigmoid(temperature * (raw_gates - threshold))
        gate_sum = gates.sum(axis=-1, keepdims=True) + 1e-8
        gates = gates / jnp.maximum(gate_sum, 0.3)
        return gates, difficulty


class CompleteEnhancedFusionSR(nn.Module):
    """Phases 2-7b over explicit expert inputs."""

    num_experts: int = 4
    fusion_dim: int = 128
    refine_channels: int = 128
    refine_depth: int = 6
    base_channels: int = 64
    block_size: int = 8
    upscale: int = 4
    enable_dynamic_selection: bool = True
    enable_cross_band_attn: bool = True
    enable_adaptive_bands: bool = True
    enable_multi_resolution: bool = True
    enable_collaborative: bool = True
    enable_edge_enhance: bool = True
    # Attention dropout in phases 3/4 (reference hardcodes 0.1); 0 gives a
    # fully deterministic train step (used by the train-mode parity test).
    attn_dropout: float = 0.1

    @nn.compact
    def __call__(self,
                 lr_input: jnp.ndarray,
                 expert_imgs: Dict[str, jnp.ndarray],
                 expert_feats: Optional[Dict[str, jnp.ndarray]] = None,
                 train: bool = False) -> jnp.ndarray:
        """lr_input [B,H,W,3]; expert_imgs {name: [B,4H,4W,3]};
        expert_feats {name: [B,H,W,C_name]} (drct/grl/mamba 180, nafnet 64)."""
        h_hr = lr_input.shape[1] * self.upscale
        w_hr = lr_input.shape[2] * self.upscale

        names = [n for n in EXPERT_ORDER[: self.num_experts]]
        expert_output_list = [expert_imgs[n] for n in names if n in expert_imgs]
        routing_lr = lr_input

        # ── Phase 2: DCT+DWT+FFT 9-band decomposition ──────────────────
        raw_9_bands = None
        if self.enable_adaptive_bands:
            _, raw_9_bands = MultiDomainFrequencyDecomposition(
                block_size=self.block_size, enable_fusion=False,
                name="freq_decomp")(lr_input, return_raw_bands=True)

        # ── Phase 3: cross-band attention + LKA ────────────────────────
        if self.enable_cross_band_attn and raw_9_bands is not None:
            enhanced_9 = EnhancedCrossBandWithLKA(
                dim=64, num_heads=4, lka_kernel=21,
                dropout=self.attn_dropout,
                name="cross_band")(raw_9_bands, train)
            # DCT-band sum re-forms the routing image; this is the gradient
            # bridge from the loss back into Phases 2/3 (reference :713).
            routing_lr = enhanced_9[0] + enhanced_9[1] + enhanced_9[2]

        # ── Phase 4: collaborative cross-expert attention ──────────────
        if (self.enable_collaborative and expert_feats is not None
                and all(n in expert_feats for n in names)):
            enhanced_outputs = EnhancedCollaborativeWithLKA(
                num_experts=self.num_experts, feature_dim=self.fusion_dim,
                num_heads=8, lka_kernel=21, dropout=self.attn_dropout,
                name="collaborative")(expert_feats, expert_output_list, train)
        else:
            enhanced_outputs = expert_output_list

        # ── Phase 5: hierarchical + frequency-guided fusion ────────────
        if self.enable_multi_resolution:
            expert_dict = dict(zip(names, enhanced_outputs))
            hierarchical = HierarchicalMultiResolutionFusion(
                num_experts=self.num_experts, base_channels=self.base_channels,
                name="multi_res")(expert_dict)

            routing_hr = resize_bilinear(routing_lr, h_hr, w_hr)
            fl = Conv1x1(16, name="freq_weight_conv_0")(routing_hr)
            freq_logits = Conv1x1(self.num_experts,
                                  name="freq_weight_conv_2")(_gelu(fl))
            freq_weights = nn.softmax(freq_logits, axis=-1)
            freq_fused = sum(out * freq_weights[..., i : i + 1]
                             for i, out in enumerate(enhanced_outputs))
            fused = hierarchical * 0.7 + freq_fused * 0.3
        else:
            fused = Conv1x1(3, name="simple_fusion")(
                jnp.concatenate(enhanced_outputs, axis=-1))

        # ── Phase 6: dynamic expert selection ──────────────────────────
        if self.enable_dynamic_selection:
            gates, difficulty = DynamicExpertSelector(
                hidden_dim=32, num_experts=self.num_experts,
                name="dynamic_selector")(routing_lr)
            gates_hr = resize_bilinear(gates, h_hr, w_hr)
            gated = sum(out * gates_hr[..., i : i + 1]
                        for i, out in enumerate(enhanced_outputs))
            dynamic_fused = gated / (gates_hr.sum(axis=-1, keepdims=True) + 1e-8)
            difficulty_hr = resize_bilinear(difficulty, h_hr, w_hr)
            blend = 0.3 + 0.4 * difficulty_hr
            fused = (1.0 - blend) * fused + blend * dynamic_fused

        # ── Phase 7: deep CNN refinement (6 conv128 GELU, x0.1) ────────
        r = fused
        r = _gelu(nn.Conv(self.refine_channels, (3, 3),
                            padding=((1, 1), (1, 1)), name="refine_0")(r))
        for i in range(self.refine_depth - 2):
            r = _gelu(nn.Conv(self.refine_channels, (3, 3),
                                padding=((1, 1), (1, 1)),
                                name=f"refine_{2 * (i + 1)}")(r))
        r = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)),
                    name=f"refine_{2 * (self.refine_depth - 1)}")(r)
        fused = fused + 0.1 * r

        # ── Phase 7b: Laplacian pyramid edge enhancement ───────────────
        if self.enable_edge_enhance:
            fused = LaplacianPyramidRefinement(
                num_levels=3, channels=32, init_edge_strength=0.15,
                name="edge_enhance")(fused)

        # ── LR bilinear residual; clamp only at eval (reference :792-795)
        residual_scale = self.param("residual_scale",
                                    lambda rng: jnp.asarray(0.1, jnp.float32))
        bilinear = resize_bilinear(lr_input, h_hr, w_hr)
        final_sr = fused + residual_scale * bilinear
        if not train:
            final_sr = jnp.clip(final_sr, 0.0, 1.0)
        return final_sr
