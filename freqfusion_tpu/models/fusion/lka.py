"""Phases 3-4: large-kernel attention and per-pixel token attention.

Re-design of the reference's src/models/large_kernel_attention.py:

  - LargeKernelAttention: 21x21 receptive field decomposed into 5x5 DW ->
    1x21 DW -> 21x1 DW -> 1x1 PW -> BatchNorm -> sigmoid gate (reference
    :38-105). Depthwise convs vectorize on the VPU; XLA fuses the chain.
  - Per-pixel token attention: attention over tiny token axes (9 bands /
    4 experts) with B*H*W carried on the batch axis (reference :222-229,
    :385-392). On TPU this is a plain batched einsum over [N, T, E] — no
    reshuffling into "sequence" semantics needed, trivially data-parallel.
  - EnhancedCrossBandWithLKA (Phase 3, reference :156-244) and
    EnhancedCollaborativeWithLKA (Phase 4, reference :251-426).

The in/out projection parameter layout mirrors torch nn.MultiheadAttention
(packed qkv) so checkpoint conversion is mechanical.
"""

from __future__ import annotations

from typing import Dict, List

import flax.linen as nn
import jax.numpy as jnp

from ...ops.conv1x1 import Conv1x1
from ...ops.resize import resize_bilinear

__all__ = [
    "LargeKernelAttention", "LKABlock", "TokenMultiheadAttention",
    "EnhancedCrossBandWithLKA", "EnhancedCollaborativeWithLKA",
]

def _gelu(x):
    """Exact (erf) GELU — torch nn.GELU()'s default, which every fusion
    module in the reference uses (e.g. edge_enhancement.py, 17 sites)."""
    return nn.gelu(x, approximate=False)



def _dwconv(x, kh, kw, name):
    dim = x.shape[-1]
    return nn.Conv(dim, (kh, kw), padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
                   feature_group_count=dim, use_bias=False, name=name)(x)


class LargeKernelAttention(nn.Module):
    """Decomposed 21x21 spatial attention gate."""

    kernel_size: int = 21

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        dim = x.shape[-1]
        attn = _dwconv(x, 5, 5, "local_conv")
        attn = _dwconv(attn, 1, k, "h_conv")
        attn = _dwconv(attn, k, 1, "v_conv")
        attn = Conv1x1(dim, use_bias=False, name="pw_conv")(attn)
        attn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(attn)
        return x * nn.sigmoid(attn)


class LKABlock(nn.Module):
    """BN -> LKA -> +0.1*res, BN -> FFN -> +0.1*res (reference :112-149)."""

    kernel_size: int = 21
    ffn_ratio: float = 2.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        import os

        dim = x.shape[-1]
        scale1 = self.param("scale1", lambda rng: jnp.asarray(0.1, jnp.float32))
        scale2 = self.param("scale2", lambda rng: jnp.asarray(0.1, jnp.float32))

        from ...ops.dispatch import use_pallas
        if (not train and use_pallas()
                and os.environ.get("FREQFUSION_LKA") == "1"):
            # whole block (BN -> 21x21-decomposed LKA -> gate -> BN ->
            # FFN, both residuals) in ONE halo-12 pass
            # (ops/pallas_lka.py). EVAL-ONLY: no VJP and eval-BN
            # affine folding — training uses the flax route.
            from ..param_decl import BNParams, Conv1x1Params, DWKParams
            from ...ops.pallas_lka import lka_block_fused

            class _LKAP(nn.Module):
                d: int

                @nn.compact
                def __call__(self):
                    return {
                        "local_conv": DWKParams(5, 5, self.d,
                                                name="local_conv")(),
                        "h_conv": DWKParams(1, 21, self.d,
                                            name="h_conv")(),
                        "v_conv": DWKParams(21, 1, self.d,
                                            name="v_conv")(),
                        "pw_conv": Conv1x1Params(self.d, self.d,
                                                 use_bias=False,
                                                 name="pw_conv")(),
                        "bn": BNParams(self.d, name="bn")(),
                    }

            p = {
                "norm1": BNParams(dim, name="norm1")(),
                "lka": _LKAP(dim, name="lka")(),
                "scale1": scale1,
                "norm2": BNParams(dim, name="norm2")(),
                "ffn_0": Conv1x1Params(dim, int(dim * self.ffn_ratio),
                                       name="ffn_0")(),
                "ffn_2": Conv1x1Params(int(dim * self.ffn_ratio), dim,
                                       name="ffn_2")(),
                "scale2": scale2,
            }
            return lka_block_fused(x, p)

        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="norm1")(x)
        x = x + scale1 * LargeKernelAttention(self.kernel_size, name="lka")(h, train)

        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="norm2")(x)
        h = Conv1x1(int(dim * self.ffn_ratio), name="ffn_0")(h)
        h = Conv1x1(dim, name="ffn_2")(_gelu(h))
        return x + scale2 * h


class TokenMultiheadAttention(nn.Module):
    """Self-attention over a tiny token axis, torch-MHA parameter layout.

    Input [..., T, E]; attention is computed independently per leading batch
    element. Packed qkv projection ([E, 3E]) matches torch's in_proj_weight
    for drop-in weight conversion.
    """

    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        import os

        e = x.shape[-1]
        hd = e // self.num_heads
        in_proj_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                               (e, 3 * e))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))

        from ...ops.dispatch import use_pallas
        from ..drct import RawDense
        out_proj = RawDense(e, e, name="out_proj")
        dropout_active = train and self.dropout > 0.0
        if (use_pallas() and not dropout_active
                and os.environ.get("FREQFUSION_TOKEN_ATTN") == "1"):
            # whole per-pixel MHA in one kernel (see
            # ops/pallas_token_attention.py); eval-mode only — dropout
            # needs the XLA route's rng
            from ...ops.pallas_token_attention import fused_token_attention
            wo, bo = out_proj(raw=True)
            lead = x.shape[:-2]
            flat = x.reshape(-1, *x.shape[-2:])
            out = fused_token_attention(
                flat, in_proj_w.astype(x.dtype), in_proj_b.astype(x.dtype),
                wo, bo, num_heads=self.num_heads)
            return out.reshape(*lead, *x.shape[-2:])

        qkv = x @ in_proj_w + in_proj_b
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # [..., T, E] -> [..., T, heads, hd] (minor-dim
            # split only — a free bitcast; the head axis stays in place
            # and the einsums below carry it as a batch dim, so no
            # [..., heads, T, hd] transpose copies are ever materialized
            # (the round-3 fusion trace showed 4.7 ms copies per swap)
            return t.reshape(*t.shape[:-1], self.num_heads, hd)

        q, k, v = heads(q), heads(k), heads(v)
        # fp32 MXU accumulation, but the materialized [N, h, T, T] logits
        # and the softmax passes stay in the compute dtype: at T<=9 the
        # bf16 softmax is well-conditioned, and the fp32 tensor was ~50 ms
        # of softmax traffic in the r3 fusion trace (fp32 mode: no-op cast)
        logits = jnp.einsum("...qhd,...khd->...hqk", q, k,
                            preferred_element_type=jnp.float32).astype(
                                x.dtype) / jnp.asarray(jnp.sqrt(hd), x.dtype)
        weights = nn.softmax(logits, axis=-1).astype(x.dtype)
        if self.dropout > 0.0:
            weights = nn.Dropout(self.dropout, deterministic=not train)(weights)
        out = jnp.einsum("...hqk,...khd->...qhd", weights, v)
        out = out.reshape(*x.shape)
        return out_proj(out)


class EnhancedCrossBandWithLKA(nn.Module):
    """Phase 3: per-pixel 9-token cross-band attention + shared LKA."""

    dim: int = 64
    num_heads: int = 4
    lka_kernel: int = 21
    dropout: float = 0.1

    @nn.compact
    def __call__(self, bands: List[jnp.ndarray], train: bool = False
                 ) -> List[jnp.ndarray]:
        num_bands = len(bands)
        proj = Conv1x1(self.dim, name="band_proj")
        projected = jnp.stack([proj(b) for b in bands], axis=-2)  # [B,H,W,T,dim]

        normed = nn.LayerNorm(name="norm")(projected)
        attn = TokenMultiheadAttention(self.num_heads, self.dropout,
                                       name="band_attention")(normed, train)
        attn = attn + projected

        lka = LKABlock(self.lka_kernel, name="lka_block")
        out_proj = Conv1x1(3, name="out_proj")
        out = []
        for i in range(num_bands):
            feat = lka(attn[..., i, :], train)
            out.append(out_proj(feat) + bands[i])
        return out


class EnhancedCollaborativeWithLKA(nn.Module):
    """Phase 4: cross-expert per-pixel attention + LKA + spatial modulation.

    Expert feature channel widths are fixed by the roster (reference
    :286-291): drct/grl/mamba 180, nafnet 64, all aligned to feature_dim.
    """

    num_experts: int = 4
    feature_dim: int = 128
    num_heads: int = 8
    lka_kernel: int = 21
    dropout: float = 0.1

    EXPERT_NAMES = ("drct", "grl", "nafnet", "mamba")

    @nn.compact
    def __call__(self, expert_features: Dict[str, jnp.ndarray],
                 expert_outputs: List[jnp.ndarray], train: bool = False
                 ) -> List[jnp.ndarray]:
        names = self.EXPERT_NAMES[: self.num_experts]
        aligned = []
        for name in names:
            feat = expert_features[name]
            aligned.append(Conv1x1(self.feature_dim,
                                   name=f"align_{name}")(feat))
        stacked = jnp.stack(aligned, axis=-2)  # [B, H, W, E, C]

        normed = nn.LayerNorm(name="norm1")(stacked)
        attn = TokenMultiheadAttention(self.num_heads, self.dropout,
                                       name="cross_attn")(normed, train)
        stacked = stacked + attn
        h = nn.LayerNorm(name="norm2")(stacked)
        h = nn.Dense(self.feature_dim * 2, name="ffn_0")(h)
        h = nn.Dense(self.feature_dim, name="ffn_2")(_gelu(h))
        stacked = stacked + h

        h_sr, w_sr = expert_outputs[0].shape[1], expert_outputs[0].shape[2]
        lka = LKABlock(self.lka_kernel, name="lka_global")
        enhanced = []
        for i, out in enumerate(expert_outputs):
            feat = lka(stacked[..., i, :], train)
            feat_hr = resize_bilinear(feat, h_sr, w_sr)
            m = Conv1x1(self.feature_dim // 4,
                        name=f"modulation_{i}_0")(feat_hr)
            m = Conv1x1(3, name=f"modulation_{i}_2")(_gelu(m))
            mod = nn.sigmoid(m)
            e = out * (1.0 + 0.2 * (mod - 0.5))
            if not train:
                e = jnp.clip(e, 0.0, 1.0)
            enhanced.append(e)
        return enhanced
