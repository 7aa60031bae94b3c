"""HAT (Hybrid Attention Transformer) — legacy expert.

Re-design of src/models/hat/hat_arch.py: RHAG groups of HAB blocks (window
attention + parallel CAB channel-attention conv branch scaled by
conv_scale) capped by an OCAB overlapping cross-attention block (queries
from ws x ws windows, keys/values from overlapping (ws+ws*ratio) windows
via unfold). Part of the legacy roster (enhanced_fusion.py:10 naming).
Returns (sr, conv_after_body feature). NHWC; static precomputes; frozen
inference semantics (no dropout / drop-path).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.pooling import global_avg_pool
from ..ops.window_attention import (
    multi_head_window_attention, relative_position_index,
    shifted_window_mask, window_partition, window_reverse,
)

__all__ = ["HAT"]

_RGB_MEAN = np.array([0.4488, 0.4371, 0.4040], np.float32)


@functools.lru_cache(maxsize=8)
def _rpi_oca_np(ws: int, overlap_ratio: float) -> np.ndarray:
    """Window->overlapping-window relative index (hat_arch.py:895-918)."""
    wse = ws + int(overlap_ratio * ws)
    co = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                              indexing="ij")).reshape(2, -1)
    ce = np.stack(np.meshgrid(np.arange(wse), np.arange(wse),
                              indexing="ij")).reshape(2, -1)
    rel = ce[:, None, :] - co[:, :, None]          # 2, ws*ws, wse*wse
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel += ws - wse + 1
    rel[:, :, 0] *= ws + wse - 1
    return rel.sum(-1).astype(np.int32)


class CAB(nn.Module):
    """conv-GELU-conv + RCAN channel attention (hat_arch.py:40-76)."""

    dim: int
    compress_ratio: int = 3
    squeeze_factor: int = 30

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        from ..ops.dispatch import use_pallas
        if os.environ.get("FREQFUSION_CAB") == "1" and use_pallas():
            from ..ops.pallas_cab import cab_fused
            from .param_decl import Conv1x1Params, Conv3x3Params
            d, cr, sq = self.dim, self.compress_ratio, self.squeeze_factor
            w = {
                "cab_0": Conv3x3Params(d, d // cr, name="cab_0")(),
                "cab_2": Conv3x3Params(d // cr, d, name="cab_2")(),
                "ca_1": Conv1x1Params(d, d // sq, name="ca_1")(),
                "ca_3": Conv1x1Params(d // sq, d, name="ca_3")(),
            }
            return cab_fused(x, w)
        y = nn.Conv(self.dim // self.compress_ratio, (3, 3),
                    padding=((1, 1), (1, 1)), name="cab_0")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                    name="cab_2")(y)
        a = nn.Conv(self.dim // self.squeeze_factor, (1, 1),
                    name="ca_1")(global_avg_pool(y))
        a = nn.Conv(self.dim, (1, 1), name="ca_3")(nn.relu(a))
        return y * nn.sigmoid(a)


class WindowAttentionHAT(nn.Module):
    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        """x is spatial NHWC; windowing happens in the Pallas kernel."""
        ws = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads))
        idx = jnp.asarray(relative_position_index(ws, ws).reshape(-1))
        bias = table[idx].reshape(ws * ws, ws * ws, self.num_heads)
        bias = bias.transpose(2, 0, 1)
        import os

        from .drct import RawDense, SplitQKV
        b, h, w, _ = x.shape
        from ..ops.dispatch import use_pallas
        pallas_ok = use_pallas() and h % ws == 0 and w % ws == 0
        qkv = SplitQKV(self.dim, name="qkv")
        proj = RawDense(self.dim, self.dim, name="proj")
        if pallas_ok and os.environ.get("FREQFUSION_ATTN_QKV") == "1":
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


class HAB(nn.Module):
    """Hybrid attention block: window attention + conv_scale*CAB
    (hat_arch.py:199-309)."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size
        if min(h, w) <= ws:
            ss, ws = 0, min(h, w)

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        conv_x = CAB(self.dim, self.compress_ratio, self.squeeze_factor,
                     name="conv_block")(y)
        if ss > 0:
            y = jnp.roll(y, (-ss, -ss), axis=(1, 2))
        mask_np = shifted_window_mask(h, w, ws, ss)
        mask = None if mask_np is None else jnp.asarray(mask_np)
        y = WindowAttentionHAT(self.dim, ws, self.num_heads,
                               name="attn")(y, mask)
        if ss > 0:
            y = jnp.roll(y, (ss, ss), axis=(1, 2))

        x = shortcut + y + conv_x * self.conv_scale

        import os

        from ..ops.dispatch import use_pallas
        if os.environ.get("FREQFUSION_MLP") == "1" and use_pallas():
            from ..ops.pallas_mlp import fused_mlp_block
            from .param_decl import DenseParams, LNParams
            hid = int(self.dim * self.mlp_ratio)
            fc1 = DenseParams(self.dim, hid, name="mlp_fc1")()
            fc2 = DenseParams(hid, self.dim, name="mlp_fc2")()
            ln2 = LNParams(self.dim, name="norm2")()
            return fused_mlp_block(
                x, fc1["kernel"], fc1["bias"], fc2["kernel"], fc2["bias"],
                ln2["scale"], ln2["bias"], prenorm=True, eps=1e-5)
        z = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(z)
        z = nn.Dense(self.dim, name="mlp_fc2")(nn.gelu(z, approximate=False))
        return x + z


class OCAB(nn.Module):
    """Overlapping cross-attention block (hat_arch.py:352-439)."""

    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        owin = ws + int(self.overlap_ratio * ws)
        pad = (owin - ws) // 2

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        qkv = nn.Dense(3 * c, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        qw = window_partition(q, ws)                       # [B*nW, ws*ws, C]

        # Overlapping windows via unfold: [B, 2C, h, w] -> patches.
        kv = jnp.concatenate([k, v], axis=-1)              # [B, h, w, 2C]
        patches = lax.conv_general_dilated_patches(
            kv.transpose(0, 3, 1, 2),                      # NCHW
            filter_shape=(owin, owin), window_strides=(ws, ws),
            padding=[(pad, pad), (pad, pad)])
        # -> [B, 2C*owin*owin, nh, nw] with channel-major ordering (c, i, j)
        nw_tot = patches.shape[2] * patches.shape[3]
        patches = patches.reshape(b, 2 * c, owin * owin, nw_tot)
        patches = patches.transpose(0, 3, 2, 1)            # [B, nW, ow*ow, 2C]
        patches = patches.reshape(b * nw_tot, owin * owin, 2 * c)
        kw, vw = patches[..., :c], patches[..., c:]

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((ws + owin - 1) * (ws + owin - 1), self.num_heads))
        idx = jnp.asarray(_rpi_oca_np(ws, self.overlap_ratio).reshape(-1))
        bias = table[idx].reshape(ws * ws, owin * owin, self.num_heads)
        bias = bias.transpose(2, 0, 1)

        out = multi_head_window_attention(qw, kw, vw, self.num_heads,
                                          bias=bias, mask=None)
        out = window_reverse(out, ws, h, w)
        x = nn.Dense(c, name="proj")(out) + shortcut

        import os

        from ..ops.dispatch import use_pallas
        if os.environ.get("FREQFUSION_MLP") == "1" and use_pallas():
            from ..ops.pallas_mlp import fused_mlp_block
            from .param_decl import DenseParams, LNParams
            hid = int(c * self.mlp_ratio)
            fc1 = DenseParams(c, hid, name="mlp_fc1")()
            fc2 = DenseParams(hid, c, name="mlp_fc2")()
            ln2 = LNParams(c, name="norm2")()
            return fused_mlp_block(
                x, fc1["kernel"], fc1["bias"], fc2["kernel"], fc2["bias"],
                ln2["scale"], ln2["bias"], prenorm=True, eps=1e-5)
        z = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        z = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1")(z)
        z = nn.Dense(c, name="mlp_fc2")(nn.gelu(z, approximate=False))
        return x + z


class RHAG(nn.Module):
    """Residual Hybrid Attention Group (hat_arch.py:537-619)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = x
        for i in range(self.depth):
            res = HAB(self.dim, self.num_heads, self.window_size,
                      shift_size=0 if i % 2 == 0 else self.window_size // 2,
                      compress_ratio=self.compress_ratio,
                      squeeze_factor=self.squeeze_factor,
                      conv_scale=self.conv_scale,
                      mlp_ratio=self.mlp_ratio,
                      name=f"blocks_{i}")(res)
        res = OCAB(self.dim, self.window_size, self.overlap_ratio,
                   self.num_heads, self.mlp_ratio, name="overlap_attn")(res)
        res = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                      name="conv")(res)
        return res + x


class HAT(nn.Module):
    """HAT super-resolution model; returns (sr, conv_after_body feature)."""

    upscale: int = 4
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads: int = 6
    window_size: int = 16
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 2.0
    img_range: float = 1.0
    num_feat: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mean = jnp.asarray(_RGB_MEAN).reshape(1, 1, 1, 3).astype(x.dtype)
        x = (x - mean) * self.img_range

        feat = nn.Conv(self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_first")(x)
        t = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(feat)
        for i, depth in enumerate(self.depths):
            t = RHAG(self.embed_dim, depth, self.num_heads, self.window_size,
                     self.compress_ratio, self.squeeze_factor,
                     self.conv_scale, self.overlap_ratio, self.mlp_ratio,
                     name=f"layers_{i}")(t)
        t = nn.LayerNorm(epsilon=1e-5, name="norm")(t)

        body = nn.Conv(self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_after_body")(t)
        feature = body
        feat = body + feat

        up = nn.Conv(self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                     name="conv_before_upsample_0")(feat)
        up = nn.leaky_relu(up, 0.01)
        for s in range(int(np.log2(self.upscale))):
            up = nn.Conv(4 * self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                         name=f"upsample_{2 * s}")(up)
            up = pixel_shuffle(up, 2)
        out = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), name="conv_last")(up)

        out = out / self.img_range + mean
        return out, feature
