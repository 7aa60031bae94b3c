"""GRL-B expert: Global/Regional/Local transformer, TPU-native.

Re-design of the reference (src/models/grl/): 7 TransformerStages
(depths [4,4,8,8,8,4,4], embed 180), each EfficientMixAttnTransformerBlock
mixing half-channel 8x8 window attention (shifted on even blocks) with
half-channel **anchored stripe attention** (anchor = 2x avg-pool + linear
projection; two-step attention anchor<-window then query<-anchor,
mixed_attn_block_efficient.py:256-259), plus a CAB local conv branch
(local_connection=True). Attention is cosine-similarity with a clamped
learnable logit scale and a CPB-MLP continuous relative position bias
(AffineTransform, mixed_attn_block_efficient.py:23-58). GRL-B config from
src/models/grl/__init__.py:76-160; ~20.2M params.

TPU-first choices:
  - NHWC spatial form end-to-end; BLC<->BCHW shuffles of the reference
    vanish (window partition is a reshape).
  - The 13 per-resolution buffers (grl_arch.py:386-453) become numpy
    precomputes keyed on static shapes (ops/grl_tables.py), constant-folded
    per jit shape bucket.
  - Frozen inference expert: no dropout / drop-path.
  - Returns (sr, conv_after_body feature) explicitly (the hook target named
    at src/models/grl/__init__.py:108-110).

GRL-B pins stripe_size=[8,8], stripe_groups=[None,None], stripe_shift=False
— stripe geometry is static, and only the window-attention mask depends on
input size. The dynamic stripe-group geometry of the general GRL
(_get_stripe_info, mixed_attn_block_efficient.py:61-70) is intentionally
not carried: it is dead code for the shipped checkpoint.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.grl_tables import (
    relative_coords_table_all, relative_position_index_simple,
    window_shift_mask,
)
from ..ops.pad import pad_reflect
from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.pooling import avg_pool_2x2, global_avg_pool
from ..ops.window_attention import window_partition, window_reverse

__all__ = ["GRL"]

_RGB_MEAN = np.array([0.4488, 0.4371, 0.4040], np.float32)


class AffineTransform(nn.Module):
    """Logit-scaled cosine attention map + CPB-MLP relative position bias
    (mixed_attn_block_efficient.py:23-58). setup-style so the Pallas path
    can fold the scale into q and take the bias separately."""

    num_heads: int

    def setup(self):
        self.logit_scale = self.param(
            "logit_scale",
            lambda rng: jnp.log(10.0 * jnp.ones((self.num_heads, 1, 1))))
        self.cpb_mlp_0 = nn.Dense(512)
        self.cpb_mlp_2 = nn.Dense(self.num_heads, use_bias=False)

    def logit_scale_value(self) -> jnp.ndarray:
        return self.logit_scale

    def bias_value(self, table: jnp.ndarray, index: np.ndarray,
                   n1: int, n2: int) -> jnp.ndarray:
        """[nH, N1, N2] additive bias: 16*sigmoid(CPB-MLP table lookup)."""
        bias_table = self.cpb_mlp_2(nn.relu(self.cpb_mlp_0(table)))
        bias_table = bias_table.reshape(-1, self.num_heads)
        bias = bias_table[jnp.asarray(index.reshape(-1))]
        bias = bias.reshape(n1, n2, -1).transpose(2, 0, 1)
        return 16.0 * nn.sigmoid(bias)

    def scale_vec(self, head_dim: int) -> jnp.ndarray:
        """Clamped per-head logit scale as a [C] channel vector, for
        folding into q outside a fused kernel."""
        s = jnp.exp(jnp.minimum(self.logit_scale, np.log(1.0 / 0.01)))
        return jnp.repeat(s.reshape(-1), head_dim)

    def __call__(self, attn: jnp.ndarray, table: jnp.ndarray,
                 index: np.ndarray,
                 mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        b_, h, n1, n2 = attn.shape
        attn = attn * jnp.exp(jnp.minimum(self.logit_scale,
                                          np.log(1.0 / 0.01)))
        attn = attn + self.bias_value(table, index, n1, n2)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, h, n1, n2) + mask[None, :, None]
            attn = attn.reshape(b_, h, n1, n2)
        return attn


def _cosine_attn(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """F.normalize(q) @ F.normalize(k).T (eps 1e-12, torch semantics)."""
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    return jnp.einsum("bhnd,bhmd->bhnm", qn, kn,
                      preferred_element_type=jnp.float32)


def _softmax(attn: jnp.ndarray) -> jnp.ndarray:
    attn = attn - attn.max(axis=-1, keepdims=True)
    attn = jnp.exp(attn)
    return attn / attn.sum(axis=-1, keepdims=True)


def _heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B_, N, C] -> [B_, nH, N, C/nH]."""
    b_, n, c = x.shape
    return x.reshape(b_, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge(x: jnp.ndarray) -> jnp.ndarray:
    """[B_, nH, N, hd] -> [B_, N, C]."""
    b_, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b_, n, h * d)


def _norm_lanes(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Per-head L2 normalization over channel blocks of an NHWC tensor
    (fp32 accumulation, torch F.normalize eps semantics)."""
    hd = x.shape[-1] // num_heads
    xh = x.reshape(*x.shape[:-1], num_heads, hd)
    xh = xh / jnp.maximum(jnp.linalg.norm(xh, axis=-1, keepdims=True), 1e-12)
    return xh.reshape(*x.shape)


class _SplitQKV6(nn.Module):
    """qkv projection as six separate dots on static weight slices (same
    ``qkv/{kernel,bias}`` param layout as Dense(3C), torch conversion
    unchanged): window q/k/v then stripe q/k/v, each C/2 wide. The packed
    [.., 3C] tensor and its window/stripe + q/k/v split copies never
    materialize (mixed_attn_block_efficient.py:282-340 splits eagerly)."""

    dim: int  # C

    @nn.compact
    def __call__(self, x: jnp.ndarray, raw: bool = False):
        c = self.dim
        c2 = c // 2
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], 3 * c))
        bias = self.param("bias", nn.initializers.zeros, (3 * c,))
        kernel = kernel.astype(x.dtype)
        bias = bias.astype(x.dtype)
        if raw:  # the qkv-in-kernel mixed attention applies these itself
            return kernel, bias
        return tuple(jnp.dot(x, kernel[:, i * c2:(i + 1) * c2])
                     + bias[i * c2:(i + 1) * c2] for i in range(6))


class _ProjPair(nn.Module):
    """Output projection taking the window/stripe halves separately —
    same ``proj/{kernel,bias}`` layout as Dense(C) on their concat, but
    the concat copy never materializes."""

    features: int

    @nn.compact
    def __call__(self, xw: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
        c2 = xw.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2 * c2, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(xw.dtype)
        return (jnp.dot(xw, kernel[:c2]) + jnp.dot(xs, kernel[c2:])
                + bias.astype(xw.dtype))


class WindowAttentionGRL(nn.Module):
    """Half-channel 8x8 (shifted) window attention with cosine similarity
    (mixed_attn_block_efficient.py:98-165). Takes q/k/v as separate NHWC
    tensors (from the split-weight qkv projection).

    Routes: GRL-B geometry (stripe == window tile) goes through the
    combined mixed-attention kernel driven by MixedAttention, using
    ``kernel_inputs`` here; large windows (N >= 256) use the window-only
    NHWC kernel; otherwise the batched einsum path."""

    window_size: int
    num_heads: int
    shift: bool

    def setup(self):
        self.attn_transform = AffineTransform(self.num_heads)

    def _tables(self):
        ws = self.window_size
        table = jnp.asarray(relative_coords_table_all((ws, ws), 1))
        index = relative_position_index_simple((ws, ws), 1, True)
        return table, index

    def kernel_inputs(self, q: jnp.ndarray, k: jnp.ndarray):
        """Fold L2 normalization + clamped logit scale into q (elementwise,
        XLA-fused) and produce the CPB bias, for the window-only NHWC
        kernel. linalg.norm accumulates fp32 — pin back to compute dtype."""
        ws = self.window_size
        n = ws * ws
        table, index = self._tables()
        hd = q.shape[-1] // self.num_heads
        qn = (_norm_lanes(q, self.num_heads)
              * self.attn_transform.scale_vec(hd)).astype(q.dtype)
        kn = _norm_lanes(k, self.num_heads).astype(q.dtype)
        bias = self.attn_transform.bias_value(table, index, n, n)
        return qn, kn, bias

    def mixed_kernel_inputs(self):
        """Clamped per-head logit scale [nH, 1, 1] + CPB bias for the
        combined mixed-attention kernel (normalization happens in-kernel)."""
        ws = self.window_size
        n = ws * ws
        table, index = self._tables()
        scale = jnp.exp(jnp.minimum(self.attn_transform.logit_scale_value(),
                                    np.log(1.0 / 0.01)))
        bias = self.attn_transform.bias_value(table, index, n, n)
        return scale, bias

    def __call__(self, q: jnp.ndarray, k: jnp.ndarray,
                 v: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = q.shape
        ws = self.window_size
        ss = ws // 2 if self.shift else 0
        if ss:
            q, k, v = (jnp.roll(t, shift=(-ss, -ss), axis=(1, 2))
                       for t in (q, k, v))
        n = ws * ws
        table, index = self._tables()
        mask_np = window_shift_mask(h, w, ws, ss)
        mask = None if mask_np is None else jnp.asarray(mask_np)

        from ..ops.dispatch import use_pallas
        if use_pallas() and n >= 256 and h % ws == 0 and w % ws == 0:
            from ..ops.pallas_attention import fused_window_attention_nhwc
            qn, kn, bias = self.kernel_inputs(q, k)
            out = fused_window_attention_nhwc(qn, kn, v, bias, mask,
                                              num_heads=self.num_heads,
                                              window_size=ws, scale=1.0)
        else:
            qh, kh, vh = [_heads(window_partition(t, ws), self.num_heads)
                          for t in (q, k, v)]
            attn = _cosine_attn(qh, kh)
            attn = self.attn_transform(attn, table, index, mask)
            out = _merge(jnp.einsum("bhnm,bhmd->bhnd",
                                    _softmax(attn).astype(vh.dtype), vh,
                                    preferred_element_type=jnp.float32
                                    ).astype(q.dtype))
            out = window_reverse(out, ws, h, w)
        if ss:
            out = jnp.roll(out, shift=(ss, ss), axis=(1, 2))
        return out


class AnchorStripeAttention(nn.Module):
    """Two-step anchored attention: anchor<-window then query<-anchor
    (mixed_attn_block_efficient.py:177-279). GRL-B: static 8x8 stripes,
    4x4 anchors, no stripe shift. Takes q/k/v + anchor as separate NHWC
    tensors."""

    stripe_size: Tuple[int, int]
    num_heads: int
    down_factor: int = 2

    def setup(self):
        self.attn_transform1 = AffineTransform(self.num_heads)
        self.attn_transform2 = AffineTransform(self.num_heads)

    def _tables(self):
        sh, sw = self.stripe_size
        table = jnp.asarray(
            relative_coords_table_all((sh, sw), self.down_factor))
        index_a2w = relative_position_index_simple(
            (sh, sw), self.down_factor, False)
        index_w2a = relative_position_index_simple(
            (sh, sw), self.down_factor, True)
        return table, index_a2w, index_w2a

    def mixed_kernel_inputs(self):
        """Clamped per-head logit scales [nH, 1, 1] + CPB biases for the
        combined mixed-attention kernel (normalization happens in-kernel)."""
        sh, sw = self.stripe_size
        n = sh * sw
        na = n // (self.down_factor ** 2)
        table, index_a2w, index_w2a = self._tables()
        clamp = np.log(1.0 / 0.01)
        s1 = jnp.exp(jnp.minimum(self.attn_transform1.logit_scale_value(),
                                 clamp))
        s2 = jnp.exp(jnp.minimum(self.attn_transform2.logit_scale_value(),
                                 clamp))
        bias_s1 = self.attn_transform1.bias_value(table, index_a2w, na, n)
        bias_s2 = self.attn_transform2.bias_value(table, index_w2a, n, na)
        return s1, s2, bias_s1, bias_s2

    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 anchor: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = q.shape
        sh, sw = self.stripe_size
        ah, aw = sh // self.down_factor, sw // self.down_factor

        qh, kh, vh = [_heads(window_partition(t, sh, sw), self.num_heads)
                      for t in (q, k, v)]
        a = _heads(window_partition(anchor, ah, aw), self.num_heads)

        table, index_a2w, index_w2a = self._tables()

        # stage 1: anchor attends to the window (keys/values)
        attn1 = _cosine_attn(a, kh)
        attn1 = self.attn_transform1(attn1, table, index_a2w, None)
        x = jnp.einsum("bhnm,bhmd->bhnd", _softmax(attn1).astype(vh.dtype),
                       vh,
                       preferred_element_type=jnp.float32).astype(q.dtype)
        # stage 2: queries attend to the anchor summary
        attn2 = _cosine_attn(qh, a)
        attn2 = self.attn_transform2(attn2, table, index_w2a, None)
        x = jnp.einsum("bhnm,bhmd->bhnd", _softmax(attn2).astype(x.dtype),
                       x,
                       preferred_element_type=jnp.float32).astype(q.dtype)

        return window_reverse(_merge(x), sh, h, w, sw)


class CAB(nn.Module):
    """Local conv branch: conv-GELU-conv + RCAN channel attention
    (mixed_attn_block.py:948-984; compress 4, reduction 18)."""

    dim: int
    compress_ratio: int = 4
    reduction: int = 18

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        from ..ops.dispatch import use_pallas
        if os.environ.get("FREQFUSION_CAB") == "1" and use_pallas():
            # two-pass fused CAB (ops/pallas_cab.py): 3 activation
            # touches instead of ~9 incl. both conv-layout copy pairs
            from ..ops.pallas_cab import cab_fused
            from .param_decl import Conv1x1Params, Conv3x3Params
            d, cr, sq = self.dim, self.compress_ratio, self.reduction
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
        a = nn.Conv(self.dim // self.reduction, (1, 1),
                    name="ca_1")(global_avg_pool(y))
        a = nn.Conv(self.dim, (1, 1), name="ca_3")(nn.relu(a))
        return y * nn.sigmoid(a)


class MixedAttention(nn.Module):
    """Shared QKV -> parallel window + anchored-stripe halves -> proj
    (mixed_attn_block_efficient.py:282-403)."""

    dim: int
    num_heads_w: int
    num_heads_s: int
    window_size: int
    window_shift: bool
    stripe_size: Tuple[int, int]
    anchor_down_factor: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        c = self.dim
        c2 = c // 2
        b, h, w, _ = x.shape
        qkv = _SplitQKV6(c, name="qkv")
        # anchor: avgpool 2x + linear to C/2 (AnchorLinear,
        # mixed_attn_block.py:712-736)
        anchor = nn.Dense(c2, name="anchor")(avg_pool_2x2(x))

        window = WindowAttentionGRL(
            self.window_size, self.num_heads_w, self.window_shift,
            name="window_attn")
        stripe = AnchorStripeAttention(
            self.stripe_size, self.num_heads_s, self.anchor_down_factor,
            name="stripe_attn")

        from ..ops.dispatch import use_pallas
        ws = self.window_size
        # Combined mixed-attention kernel: GRL-B geometry only (stripe
        # tile == window tile, both divide the padded H/W).
        kernel_ok = (use_pallas() and tuple(self.stripe_size) == (ws, ws)
                     and h % ws == 0 and w % ws == 0
                     and c2 % self.num_heads_w == 0
                     and c2 % self.num_heads_s == 0)
        if kernel_ok and os.environ.get("FREQFUSION_GRL_QKV") == "1":
            # 6-way qkv projection in-kernel: only the C-wide x streams
            # (plus its roll for shifted blocks) instead of six C/2
            # q/k/v tensors; window half projects from the rolled strip.
            from ..ops.pallas_attention import (
                fused_grl_mixed_attention_qkv_nhwc)
            ss = ws // 2 if self.window_shift else 0
            scale_w, bias_w = window.mixed_kernel_inputs()
            s1, s2, bias_s1, bias_s2 = stripe.mixed_kernel_inputs()
            w6, b6 = qkv(x, raw=True)
            mask_np = window_shift_mask(h, w, ws, ss)
            mask = None if mask_np is None else jnp.asarray(mask_np)
            x_rolled = (jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
                        if ss else None)
            x_window, x_stripe = fused_grl_mixed_attention_qkv_nhwc(
                x, x_rolled, anchor, w6, b6, scale_w, s1, s2,
                bias_w, bias_s1, bias_s2, mask,
                num_heads_w=self.num_heads_w, num_heads_s=self.num_heads_s,
                window_size=ws, down_factor=self.anchor_down_factor)
            if ss:
                x_window = jnp.roll(x_window, shift=(ss, ss), axis=(1, 2))
            return _ProjPair(c, name="proj")(x_window, x_stripe)
        qw, kw, vw, qs, ks, vs = qkv(x)
        if kernel_ok:
            from ..ops.pallas_attention import fused_grl_mixed_attention_nhwc
            ss = ws // 2 if self.window_shift else 0
            scale_w, bias_w = window.mixed_kernel_inputs()
            qwn, kwn, vwn = qw, kw, vw
            if ss:
                qwn, kwn, vwn = (jnp.roll(t, shift=(-ss, -ss), axis=(1, 2))
                                 for t in (qwn, kwn, vwn))
            mask_np = window_shift_mask(h, w, ws, ss)
            mask = None if mask_np is None else jnp.asarray(mask_np)
            s1, s2, bias_s1, bias_s2 = stripe.mixed_kernel_inputs()
            x_window, x_stripe = fused_grl_mixed_attention_nhwc(
                qwn, kwn, vwn, qs, ks, vs, anchor, scale_w, s1, s2,
                bias_w, bias_s1, bias_s2, mask,
                num_heads_w=self.num_heads_w, num_heads_s=self.num_heads_s,
                window_size=ws, down_factor=self.anchor_down_factor)
            if ss:
                x_window = jnp.roll(x_window, shift=(ss, ss), axis=(1, 2))
        else:
            x_window = window(qw, kw, vw)
            x_stripe = stripe(qs, ks, vs, anchor)
        return _ProjPair(c, name="proj")(x_window, x_stripe)


class EfficientMixAttnTransformerBlock(nn.Module):
    """Post-norm mixed attention + CAB local branch + FFN
    (mixed_attn_block_efficient.py:406-560)."""

    dim: int
    num_heads_w: int
    num_heads_s: int
    window_size: int
    window_shift: bool
    stripe_type: str      # "H" or "W"
    stripe_size: Tuple[int, int]
    anchor_down_factor: int
    mlp_ratio: float = 2.0
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ss = (self.stripe_size if self.stripe_type == "H"
              else self.stripe_size[::-1])
        attn_out = MixedAttention(
            self.dim, self.num_heads_w, self.num_heads_s, self.window_size,
            self.window_shift, ss, self.anchor_down_factor,
            name="attn")(x)
        attn_out = nn.LayerNorm(epsilon=1e-5, name="norm1")(attn_out)
        x = x + self.res_scale * attn_out + CAB(self.dim, name="conv")(x)

        import os

        from ..ops.dispatch import use_pallas
        if os.environ.get("FREQFUSION_MLP") == "1" and use_pallas():
            # post-norm FFN half in one kernel (fc1+GELU+fc2+LN2+residual,
            # hidden in VMEM): ~7C -> 2C bytes per pixel at ratio 2
            from ..ops.pallas_mlp import fused_mlp_block
            from .param_decl import DenseParams, LNParams
            hid = int(self.dim * self.mlp_ratio)
            fc1 = DenseParams(self.dim, hid, name="mlp_fc1")()
            fc2 = DenseParams(hid, self.dim, name="mlp_fc2")()
            ln2 = LNParams(self.dim, name="norm2")()
            return fused_mlp_block(
                x, fc1["kernel"], fc1["bias"], fc2["kernel"], fc2["bias"],
                ln2["scale"], ln2["bias"], prenorm=False,
                res_scale=self.res_scale, eps=1e-5)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(x)
        y = nn.Dense(self.dim, name="mlp_fc2")(nn.gelu(y, approximate=False))
        return x + self.res_scale * nn.LayerNorm(
            epsilon=1e-5, name="norm2")(y)


class TransformerStage(nn.Module):
    """Blocks + 3x3 conv + stage residual (grl_arch.py:31-173)."""

    dim: int
    depth: int
    num_heads_w: int
    num_heads_s: int
    window_size: int
    stripe_size: Tuple[int, int]
    anchor_down_factor: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = x
        for i in range(self.depth):
            res = EfficientMixAttnTransformerBlock(
                self.dim, self.num_heads_w, self.num_heads_s,
                self.window_size,
                window_shift=(i % 2 == 0),
                stripe_type="H" if i % 2 == 0 else "W",
                stripe_size=self.stripe_size,
                anchor_down_factor=self.anchor_down_factor,
                mlp_ratio=self.mlp_ratio,
                name=f"blocks_{i}")(res)
        res = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                      name="conv")(res)
        return res + x


class GRL(nn.Module):
    """GRL-B super-resolution model; returns (sr, conv_after_body feature)."""

    upscale: int = 4
    embed_dim: int = 180
    depths: Tuple[int, ...] = (4, 4, 8, 8, 8, 4, 4)
    num_heads_w: int = 3
    num_heads_s: int = 3
    window_size: int = 8
    stripe_size: Tuple[int, int] = (8, 8)
    anchor_down_factor: int = 2
    mlp_ratio: float = 2.0
    img_range: float = 1.0
    num_feat: int = 64
    # nn.scan over runs of equal-depth stages ((4,4),(8,8,8),(4,4) for
    # GRL-B) with stacked params; use convert_grl + stack_layer_runs.
    use_scan: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, h, w, _ = x.shape
        pad = self.window_size
        ph = (pad - h % pad) % pad
        pw = (pad - w % pad) % pad
        if ph or pw:
            x = pad_reflect(x, 0, ph, 0, pw)

        mean = jnp.asarray(_RGB_MEAN).reshape(1, 1, 1, 3).astype(x.dtype)
        x = (x - mean) * self.img_range

        feat = nn.Conv(self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_first")(x)
        t = nn.LayerNorm(epsilon=1e-5, name="norm_start")(feat)
        if self.use_scan:
            runs = []
            for d in self.depths:
                if runs and runs[-1][0] == d:
                    runs[-1][1] += 1
                else:
                    runs.append([d, 1])

            class _Body(nn.Module):
                dim: int
                depth: int
                hw: int
                hs: int
                ws: int
                ss: Tuple[int, int]
                df: int
                mlp: float

                @nn.compact
                def __call__(self, carry, _):
                    out = TransformerStage(
                        self.dim, self.depth, self.hw, self.hs, self.ws,
                        self.ss, self.df, self.mlp, name="stage")(carry)
                    return out, None

            for ri, (depth, count) in enumerate(runs):
                scanned = nn.scan(
                    _Body, variable_axes={"params": 0},
                    split_rngs={"params": True}, length=count)(
                    self.embed_dim, depth, self.num_heads_w,
                    self.num_heads_s, self.window_size, self.stripe_size,
                    self.anchor_down_factor, self.mlp_ratio,
                    name=f"layers_run{ri}")
                t, _ = scanned(t, None)
        else:
            for i, depth in enumerate(self.depths):
                t = TransformerStage(
                    self.embed_dim, depth, self.num_heads_w,
                    self.num_heads_s, self.window_size, self.stripe_size,
                    self.anchor_down_factor, self.mlp_ratio,
                    name=f"layers_{i}")(t)
        t = nn.LayerNorm(epsilon=1e-5, name="norm_end")(t)

        body = nn.Conv(self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_after_body")(t)
        feature = body  # hook target (grl/__init__.py:108-110)
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
        return (out[:, : h * self.upscale, : w * self.upscale, :],
                feature[:, :h, :w, :])
