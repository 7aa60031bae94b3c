"""DAT (Dual Aggregation Transformer) — the NTIRE model_id-0 baseline.

Re-design of src/models/dat/dat_arch.py (ICCV 2023): residual groups of
DATB blocks alternating adaptive *spatial* window attention (two
rectangular-window branches over split channels, DynamicPosBias
relative-position MLP, AIM cross-gating with a depthwise-conv branch) and
adaptive *channel* attention (XCiT cross-covariance with learnable
temperature), joined by a Spatial-Gate FFN. DAT-S config: embed 180,
depths [6]*6, heads 6, split_size [8, 16], expansion 2.0
(dat_arch.py:1035-1124). Returns (sr, conv_after_body feature).

NHWC; masks/bias indices are static numpy precomputes per shape bucket.
Frozen inference path: no dropout / drop-path.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.pad import pad_zeros
from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.pooling import global_avg_pool
from ..ops.conv1x1 import Conv1x1
from ..ops.window_attention import (
    multi_head_window_attention, shifted_window_mask_rect, window_partition,
    window_reverse,
)

__all__ = ["DAT"]

_RGB_MEAN = np.array([0.4488, 0.4371, 0.4040], np.float32)


import functools


@functools.lru_cache(maxsize=16)
def _rpe_biases_np(hsp: int, wsp: int) -> np.ndarray:
    """[(2hsp-1)(2wsp-1), 2] relative coordinate table (dat_arch.py:258-263)."""
    bh = np.arange(1 - hsp, hsp)
    bw = np.arange(1 - wsp, wsp)
    grid = np.stack(np.meshgrid(bh, bw, indexing="ij"))
    return grid.reshape(2, -1).T.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _rel_pos_index_np(hsp: int, wsp: int) -> np.ndarray:
    """[N, N] index into the rpe table (dat_arch.py:265-275)."""
    ch = np.arange(hsp)
    cw = np.arange(wsp)
    coords = np.stack(np.meshgrid(ch, cw, indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += hsp - 1
    rel[:, :, 1] += wsp - 1
    rel[:, :, 0] *= 2 * wsp - 1
    return rel.sum(-1).astype(np.int32)


class DynamicPosBias(nn.Module):
    """CrossFormer-style dynamic relative position bias MLP
    (dat_arch.py:177-214, residual=False path)."""

    pos_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, biases: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.pos_dim, name="pos_proj")(biases)
        x = nn.Dense(self.pos_dim, name="pos1_2")(
            nn.relu(nn.LayerNorm(epsilon=1e-5, name="pos1_0")(x)))
        x = nn.Dense(self.pos_dim, name="pos2_2")(
            nn.relu(nn.LayerNorm(epsilon=1e-5, name="pos2_0")(x)))
        return nn.Dense(self.num_heads, name="pos3_2")(
            nn.relu(nn.LayerNorm(epsilon=1e-5, name="pos3_0")(x)))


class SpatialAttention(nn.Module):
    """Rectangular-window attention branch (dat_arch.py:219-346)."""

    dim: int
    num_heads: int
    hsp: int
    wsp: int

    @nn.compact
    def __call__(self, q, k, v, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        """q/k/v: [B, H, W, C_branch]; returns [B, H, W, C_branch]."""
        b, h, w, c = q.shape
        qw = window_partition(q, self.hsp, self.wsp)
        kw = window_partition(k, self.hsp, self.wsp)
        vw = window_partition(v, self.hsp, self.wsp)

        pos = DynamicPosBias(self.dim // 4 // 4, self.num_heads,
                             name="pos")(jnp.asarray(_rpe_biases_np(self.hsp,
                                                                    self.wsp)))
        idx = jnp.asarray(_rel_pos_index_np(self.hsp, self.wsp).reshape(-1))
        n = self.hsp * self.wsp
        bias = pos[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)

        out = multi_head_window_attention(qw, kw, vw, self.num_heads,
                                          bias=bias, mask=mask)
        return window_reverse(out, self.hsp, h, w, self.wsp)


def _interaction_convs(x, dims, names, train):
    """conv -> BN -> GELU -> conv chain used by the AIM maps."""
    x = Conv1x1(dims[0], name=names[0])(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, name=names[1])(x)
    x = Conv1x1(dims[1], name=names[2])(nn.gelu(x, approximate=False))
    return x


class AdaptiveSpatialAttention(nn.Module):
    """Two rectangular-window branches + DW-conv branch + AIM cross-gating
    (dat_arch.py:349-566)."""

    dim: int
    num_heads: int
    split_size: Tuple[int, int]
    shift_size: Tuple[int, int]
    do_shift: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        s0, s1 = self.split_size
        sh0, sh1 = self.shift_size

        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # pad to the max split size (dat_arch.py:508-517)
        m = max(s0, s1)
        pb = (m - h % m) % m
        pr = (m - w % m) % m
        qp, kp, vp = (pad_zeros(t, 0, pb, 0, pr) if (pb or pr) else t
                      for t in (q, k, v))
        hp, wp = h + pb, w + pr

        halves = []
        for bi in range(2):
            sl = slice(0, c // 2) if bi == 0 else slice(c // 2, c)
            wh, ww = (s0, s1) if bi == 0 else (s1, s0)
            rs = (sh0, sh1) if bi == 0 else (sh1, sh0)
            qb, kb, vb = qp[..., sl], kp[..., sl], vp[..., sl]
            mask = None
            if self.do_shift:
                qb = jnp.roll(qb, (-rs[0], -rs[1]), axis=(1, 2))
                kb = jnp.roll(kb, (-rs[0], -rs[1]), axis=(1, 2))
                vb = jnp.roll(vb, (-rs[0], -rs[1]), axis=(1, 2))
                mask_np = shifted_window_mask_rect(hp, wp, wh, ww, rs[0], rs[1])
                mask = None if mask_np is None else jnp.asarray(mask_np)
            out = SpatialAttention(c // 2, self.num_heads // 2, wh, ww,
                                   name=f"attns_{bi}")(qb, kb, vb, mask)
            if self.do_shift:
                out = jnp.roll(out, (rs[0], rs[1]), axis=(1, 2))
            halves.append(out[:, :h, :w, :])
        attened = jnp.concatenate(halves, axis=-1)

        # DW-conv branch on (unpadded) v
        conv_x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                         feature_group_count=c, name="dwconv_0")(v)
        conv_x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, name="dwconv_1")(conv_x)
        conv_x = nn.gelu(conv_x, approximate=False)

        # AIM (dat_arch.py:543-556)
        channel_map = _interaction_convs(
            global_avg_pool(conv_x), (c // 8, c),
            ("channel_interaction_1", "channel_interaction_2",
             "channel_interaction_4"), train)
        spatial_map = _interaction_convs(
            attened, (c // 16, 1),
            ("spatial_interaction_0", "spatial_interaction_1",
             "spatial_interaction_3"), train)

        attened = attened * nn.sigmoid(channel_map)
        conv_x = conv_x * nn.sigmoid(spatial_map)
        return nn.Dense(c, name="proj")(attened + conv_x)


class AdaptiveChannelAttention(nn.Module):
    """XCiT-style channel attention + DW-conv branch + AIM
    (dat_arch.py:569-670)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        n = h * w
        heads = self.num_heads
        hd = c // heads

        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3 * c), 3, axis=-1)

        def to_channel(t):  # [B, N, C] -> [B, heads, hd, N]
            return t.reshape(b, n, heads, hd).transpose(0, 2, 3, 1)

        qc, kc, vc = map(to_channel, (q, k, v))
        qc = qc / jnp.maximum(jnp.linalg.norm(qc, axis=-1, keepdims=True), 1e-12)
        kc = kc / jnp.maximum(jnp.linalg.norm(kc, axis=-1, keepdims=True), 1e-12)

        temperature = self.param("temperature", nn.initializers.ones,
                                 (heads, 1, 1))
        attn = jnp.einsum("bhcn,bhdn->bhcd", qc, kc,
                          preferred_element_type=jnp.float32) * temperature
        attn = nn.softmax(attn, axis=-1).astype(vc.dtype)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, vc,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        attened = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)

        conv_x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                         feature_group_count=c, name="dwconv_0")(
            v.reshape(b, h, w, c))
        conv_x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, name="dwconv_1")(conv_x)
        conv_x = nn.gelu(conv_x, approximate=False)

        channel_map = _interaction_convs(
            global_avg_pool(attened), (c // 8, c),
            ("channel_interaction_1", "channel_interaction_2",
             "channel_interaction_4"), train)
        spatial_map = _interaction_convs(
            conv_x, (c // 16, 1),
            ("spatial_interaction_0", "spatial_interaction_1",
             "spatial_interaction_3"), train)

        # swapped gating for the channel block (dat_arch.py:660-666)
        attened = attened * nn.sigmoid(spatial_map)
        conv_x = conv_x * nn.sigmoid(channel_map)
        return nn.Dense(c, name="proj")(attened + conv_x)


class SGFN(nn.Module):
    """Spatial-Gate FFN (dat_arch.py:103-170)."""

    dim: int
    expansion: float = 2.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.dim * self.expansion)
        h = nn.Dense(hidden, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        x1, x2 = jnp.split(h, 2, axis=-1)
        x2 = nn.LayerNorm(epsilon=1e-5, name="sg_norm")(x2)
        x2 = nn.Conv(hidden // 2, (3, 3), padding=((1, 1), (1, 1)),
                     feature_group_count=hidden // 2, name="sg_conv")(x2)
        return nn.Dense(self.dim, name="fc2")(x1 * x2)


def _should_shift(rg_idx: int, b_idx: int) -> bool:
    """DAT's shift schedule (dat_arch.py:427-430)."""
    return ((rg_idx % 2 == 0 and b_idx > 0 and (b_idx - 2) % 4 == 0)
            or (rg_idx % 2 != 0 and b_idx % 4 == 0))


class DATB(nn.Module):
    """Dual Aggregation Transformer Block (dat_arch.py:673-738)."""

    dim: int
    num_heads: int
    split_size: Tuple[int, int]
    expansion: float
    rg_idx: int
    b_idx: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if self.b_idx % 2 == 0:
            attn = AdaptiveSpatialAttention(
                self.dim, self.num_heads, self.split_size,
                (self.split_size[0] // 2, self.split_size[1] // 2),
                do_shift=_should_shift(self.rg_idx, self.b_idx),
                name="attn")(y, train)
        else:
            attn = AdaptiveChannelAttention(
                self.dim, self.num_heads, name="attn")(y, train)
        x = x + attn
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x + SGFN(self.dim, self.expansion, name="ffn")(y, train)


class ResidualGroup(nn.Module):
    dim: int
    depth: int
    num_heads: int
    split_size: Tuple[int, int]
    expansion: float
    rg_idx: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        res = x
        for j in range(self.depth):
            res = DATB(self.dim, self.num_heads, self.split_size,
                       self.expansion, self.rg_idx, j,
                       name=f"blocks_{j}")(res, train)
        res = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                      name="conv")(res)
        return res + x


class DAT(nn.Module):
    """DAT-S super-resolution model; returns (sr, conv_after_body feature)."""

    upscale: int = 4
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads: int = 6
    split_size: Tuple[int, int] = (8, 16)
    expansion: float = 2.0
    img_range: float = 1.0
    num_feat: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mean = jnp.asarray(_RGB_MEAN).reshape(1, 1, 1, 3).astype(x.dtype)
        x = (x - mean) * self.img_range

        feat = nn.Conv(self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_first")(x)
        t = nn.LayerNorm(epsilon=1e-5, name="before_rg_norm")(feat)
        for i, depth in enumerate(self.depths):
            t = ResidualGroup(self.embed_dim, depth, self.num_heads,
                              self.split_size, self.expansion, i,
                              name=f"layers_{i}")(t, train)
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
