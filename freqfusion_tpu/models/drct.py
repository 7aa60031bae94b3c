"""DRCT-L expert: Dense-Residual-Connected Swin transformer, TPU-native.

Re-design of the reference architecture (src/models/drct/drct_arch.py):
12 RDG groups, each five SwinTransformerBlocks with dense channel concat
(dim + k*gc, gc=32) + 1x1 adjusts + 0.2-scaled residual; window 16 with
alternating shifts (0, 8, 0, 8, 0); relative-position-bias tables;
pixel-shuffle upsampler. DRCT-L config: embed 180, depths [6]*12 (12 RDGs),
heads 6, window 16 (expert_loader.py:252-262). 27.6M params.

TPU-first choices:
  - NHWC throughout; tokens stay in spatial [B, H, W, C] form — window
    partition is a reshape, not a view-permute dance.
  - Shifted-window masks and relative-position indices are numpy
    precomputes per static shape bucket (ops/window_attention.py), replacing
    the reference's runtime calculate_mask (drct_arch.py:377-409).
  - Frozen inference expert: dropout/drop-path are omitted (eval semantics).
  - ``__call__`` returns (sr, conv_after_body feature) explicitly — the
    functional replacement of the forward hook at expert_loader.py:522-528.

Submodule names mirror the torch state-dict structure (conv_first,
layers_{i}.swin{k}/adjust{k}, norm, conv_after_body, conv_before_upsample,
upsample, conv_last) so weight conversion is mechanical.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.conv1x1 import Conv1x1
from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.window_attention import (
    multi_head_window_attention, relative_position_index,
    shifted_window_mask, window_partition, window_reverse,
)

__all__ = ["WindowAttention", "SwinTransformerBlock", "RDG", "DRCT"]

_RGB_MEAN = np.array([0.4488, 0.4371, 0.4040], np.float32)


class SplitQKV(nn.Module):
    """qkv projection as three separate dots on static weight slices.

    One fused [*, 3C] Dense forces XLA to materialize three full copies at
    the jnp.split (profiled as expensive as the matmul itself); slicing the
    *parameter* instead is free and yields three clean MXU dots. Param path
    stays ``qkv/{kernel,bias}`` so torch conversion is unchanged."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, raw: bool = False):
        d = self.dim
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], 3 * d))
        bias = self.param("bias", nn.initializers.zeros, (3 * d,))
        kernel = kernel.astype(x.dtype)
        bias = bias.astype(x.dtype)
        if raw:  # the qkv-in-kernel attention applies the params itself
            return kernel, bias
        return tuple(jnp.dot(x, kernel[:, i * d:(i + 1) * d])
                     + bias[i * d:(i + 1) * d] for i in range(3))


class RawDense(nn.Module):
    """Dense with nn.Dense's param tree (kernel [in, out], bias [out]) that
    can also hand the raw params to a kernel (``raw=True``)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray = None, raw: bool = False):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if raw:
            return kernel, bias
        return x @ kernel.astype(x.dtype) + bias.astype(x.dtype)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (drct_arch.py:127-222).

    Input is spatial NHWC [B, H, W, C]; on TPU the window partition/
    reverse happen inside the fused Pallas kernel (BlockSpec tiling), so
    the surrounding graph keeps the plain NHWC layout."""

    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, h, w, _ = x.shape
        ws = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads))
        idx = jnp.asarray(relative_position_index(ws, ws).reshape(-1))
        bias = table[idx].reshape(ws * ws, ws * ws, self.num_heads)
        bias = bias.transpose(2, 0, 1)  # nH, N, N

        import os

        from ..ops.dispatch import use_pallas
        pallas_ok = use_pallas() and h % ws == 0 and w % ws == 0
        qkv = SplitQKV(self.dim, name="qkv")
        proj = RawDense(self.dim, self.dim, name="proj")
        if pallas_ok and os.environ.get("FREQFUSION_ATTN_QKV") == "1":
            # qkv + output projection inside the kernel (one x read per
            # block, no q/k/v HBM round trips or separate bias passes)
            from ..ops.pallas_attention import fused_window_attention_qkv_nhwc
            wqkv, bqkv = qkv(x, raw=True)
            wp, bp = proj(raw=True)
            return fused_window_attention_qkv_nhwc(
                x, wqkv, bqkv, wp, bp, bias, mask,
                num_heads=self.num_heads, window_size=ws)
        q, k, v = qkv(x)
        if pallas_ok:
            from ..ops.pallas_attention import fused_window_attention_nhwc
            out = fused_window_attention_nhwc(q, k, v, bias, mask,
                                              num_heads=self.num_heads,
                                              window_size=ws)
        else:
            qw, kw, vw = (window_partition(t, ws) for t in (q, k, v))
            out = multi_head_window_attention(qw, kw, vw, self.num_heads,
                                              bias=bias, mask=mask)
            out = window_reverse(out, ws, h, w)
        return proj(out)


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class SwinTransformerBlock(nn.Module):
    """Pre-norm window attention + MLP block (drct_arch.py:302-434),
    operating on spatial [B, H, W, C]."""

    dim: int
    num_heads: int
    window_size: int = 16
    shift_size: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size
        if min(h, w) <= ws:
            ss, ws = 0, min(h, w)

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if ss > 0:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
        mask_np = shifted_window_mask(h, w, ws, ss)
        mask = None if mask_np is None else jnp.asarray(mask_np)
        x = WindowAttention(self.dim, ws, self.num_heads,
                            name="attn")(x, mask)
        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        x = shortcut + x

        import os

        from ..ops.dispatch import use_pallas
        if os.environ.get("FREQFUSION_MLP") == "1" and use_pallas():
            # FFN half in one kernel: LN2 + fc1 + GELU + fc2 + residual,
            # hidden stays in VMEM (~11C -> 2C bytes per pixel at ratio 4)
            from ..ops.pallas_mlp import fused_mlp_block
            from .param_decl import LNParams, MlpParams
            ln2 = LNParams(c, name="norm2")()
            mlp = MlpParams(c, int(self.dim * self.mlp_ratio),
                            name="mlp")()
            return fused_mlp_block(
                x, mlp["fc1"]["kernel"], mlp["fc1"]["bias"],
                mlp["fc2"]["kernel"], mlp["fc2"]["bias"],
                ln2["scale"], ln2["bias"], prenorm=True, eps=1e-5)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x + Mlp(int(self.dim * self.mlp_ratio), self.dim,
                       name="mlp")(y)


class RDG(nn.Module):
    """Residual Dense Group: 5 Swin blocks, dense concat, 1x1 adjusts,
    0.2-scaled residual (drct_arch.py:226-300)."""

    dim: int
    num_heads: int
    window_size: int
    gc: int = 32
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d, g, nh, ws = self.dim, self.gc, self.num_heads, self.window_size
        shift = ws // 2

        def block(k: int, feats: jnp.ndarray) -> jnp.ndarray:
            bdim = d + k * g
            heads = nh - (bdim % nh)
            # swin1-3 take the config ratio, swin4/5 are pinned to 1
            # (drct_arch.py:233-273); the official DRCT-L_X4 release uses
            # mlp_ratio=2 where the reference instantiates 4.
            mlp_ratio = self.mlp_ratio if k < 3 else 1.0
            out = SwinTransformerBlock(
                bdim, heads, ws, shift if k % 2 == 1 else 0, mlp_ratio,
                name=f"swin{k + 1}")(feats)
            out_ch = d if k == 4 else g
            # 1x1 as dot_general: the conv lowering left leaky_relu as 33
            # ms/img of unfused passes + 26 ms of layout copies (r3 trace)
            out = Conv1x1(out_ch, name=f"adjust{k + 1}")(out)
            if k < 4:
                out = nn.leaky_relu(out, 0.2)
            return out

        x1 = block(0, x)
        x2 = block(1, jnp.concatenate([x, x1], -1))
        x3 = block(2, jnp.concatenate([x, x1, x2], -1))
        x4 = block(3, jnp.concatenate([x, x1, x2, x3], -1))
        x5 = block(4, jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class DRCT(nn.Module):
    """DRCT super-resolution model; returns (sr, conv_after_body feature).

    ``use_scan=True`` runs the 12 identical RDGs under ``nn.scan`` with
    stacked parameters (leading layer axis) — ~12x smaller HLO and compile
    time; outputs are identical. ``convert_drct(..., stack=True)`` produces
    the stacked layout.
    """

    upscale: int = 4
    embed_dim: int = 180
    num_layers: int = 12
    num_heads: int = 6
    window_size: int = 16
    gc: int = 32
    mlp_ratio: float = 4.0
    img_range: float = 1.0
    num_feat: int = 64
    use_scan: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mean = jnp.asarray(_RGB_MEAN).reshape(1, 1, 1, 3).astype(x.dtype)
        x = (x - mean) * self.img_range

        feat = nn.Conv(self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_first")(x)

        # patch_embed's post-flatten LayerNorm (patch_norm=True,
        # drct_arch.py:523-560).
        tokens = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(feat)
        if self.use_scan:
            class _Body(nn.Module):
                dim: int
                heads: int
                ws: int
                gc: int
                mlp_ratio: float

                @nn.compact
                def __call__(self, carry, _):
                    out = RDG(self.dim, self.heads, self.ws, self.gc,
                              self.mlp_ratio, name="rdg")(carry)
                    return out, None

            scanned = nn.scan(
                _Body, variable_axes={"params": 0},
                split_rngs={"params": True}, length=self.num_layers)(
                self.embed_dim, self.num_heads, self.window_size, self.gc,
                self.mlp_ratio, name="layers")
            tokens, _ = scanned(tokens, None)
        else:
            for i in range(self.num_layers):
                tokens = RDG(self.embed_dim, self.num_heads,
                             self.window_size, self.gc, self.mlp_ratio,
                             name=f"layers_{i}")(tokens)
        tokens = nn.LayerNorm(epsilon=1e-5, name="norm")(tokens)

        body = nn.Conv(self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_after_body")(tokens)
        feature = body  # the reference's hook capture (expert_loader.py:522)
        feat = body + feat

        up = nn.Conv(self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                     name="conv_before_upsample_0")(feat)
        up = nn.leaky_relu(up, 0.01)
        n_shuffles = int(np.log2(self.upscale))
        for s in range(n_shuffles):
            up = nn.Conv(4 * self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                         name=f"upsample_{2 * s}")(up)
            up = pixel_shuffle(up, 2)
        out = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), name="conv_last")(up)

        out = out / self.img_range + mean
        return out, feature
