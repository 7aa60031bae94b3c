"""NAFNet-SIDD-64 expert, TPU-native (flax.linen, NHWC).

Re-implementation of the "activation-free" UNet denoiser used as the CNN
expert (reference: src/models/nafnet/nafnet_arch.py, src/models/nafnet/
__init__.py). Wrapped for x4 SR as bicubic-upscale -> UNet refinement
(NAFNetSR.forward, nafnet/__init__.py:117-139).

TPU-first choices:
  - NHWC layout; LayerNorm2d becomes a plain last-axis LayerNorm.
  - SimpleGate splits the channel (last) axis — a free reshape on TPU.
  - The decoder's 1x1-conv + PixelShuffle upsampler keeps torch's channel
    ordering so converted weights drop in (ops/pixel_shuffle.py).
  - ``apply`` returns (sr, features) explicitly; no forward hooks. The
    feature is the input of the final ``ending`` conv, bilinearly resized
    to LR resolution exactly as the reference hook path does
    (expert_loader.py:554-568, 630-636).

Submodule names mirror the torch state-dict keys (intro, encoders, downs,
middle_blks, ups, decoders, ending; per-block conv1..conv5, sca, norm1/2,
beta, gamma) so checkpoint conversion is a mechanical transpose.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv1x1 import Conv1x1
from ..ops.pad import pad_zeros
from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.pooling import global_avg_pool
from ..ops.resize import upscale_bicubic

__all__ = ["NAFBlock", "NAFNet", "NAFNetSR"]


def simple_gate(x: jnp.ndarray) -> jnp.ndarray:
    """Channel-split multiply (nafnet_arch.py:47-52)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2


class _DWConv3x3(nn.Module):
    """Depthwise 3x3 as NINE shifted FMAs instead of a grouped convolution.

    XLA assigns grouped convs a conv-preferred activation layout
    ({3,1,2,0} 8-row blocking) and inserts full-tensor copies on both
    sides of every one of NAFNet's 36 dwconvs — the 54 ms `copy` bucket
    of the round-3 NAFNet trace. Expressed as 9 static slices of a
    spatially-padded tensor FMA'd with the per-tap channel weights, the
    op is pure elementwise work that fuses with its neighbors in the
    fusion-preferred layout. Param names/shapes match nn.Conv exactly
    (kernel [3, 3, 1, C], bias [C]) so converted torch weights drop in
    unchanged (reference dwconv: nafnet_arch.py:66-70).

    MEASURED AND DECLINED: in-model 336x512 bf16 the shift route runs
    0.431 s/img vs 0.295 for the grouped conv — XLA does not collapse
    the 9 shifted slice reads into one stencil pass, so the op pays ~9x
    the HBM read traffic and loses more than the ~54 ms of layout copies
    it saves. Kept behind FREQFUSION_NAFNET_DWSHIFT=1 as the receipt,
    parity-pinned by tests/test_nafnet_parity.py's dwshift case.
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "shift") -> jnp.ndarray:
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, 1, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if mode == "kernel":
            # halo-DMA Pallas stencil: read-once/write-once in standard
            # layout (ops/pallas_dwconv.py); FREQFUSION_DWCONV gates it
            from ..ops.pallas_dwconv import dwconv3x3_pallas
            return dwconv3x3_pallas(x, k.astype(x.dtype), bias)
        _, h, w, _ = x.shape
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
        kc = k.astype(x.dtype)
        y = None
        for i in range(3):
            for j in range(3):
                term = xp[:, i: i + h, j: j + w, :] * kc[i, j, 0]
                y = term if y is None else y + term
        return y + bias.astype(x.dtype)


from .param_decl import (Conv1x1Params as _ConvParams,  # noqa: E402
                         DWConvParams as _DWParams, LNParams as _LNParams)


class NAFBlock(nn.Module):
    """LayerNorm -> 1x1 -> 3x3 DW -> SimpleGate -> SCA -> 1x1, plus gated FFN;
    learnable beta/gamma residual scales (nafnet_arch.py:58-131)."""

    c: int
    dw_expand: int = 2
    ffn_expand: int = 2

    @nn.compact
    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        c = self.c
        dw = c * self.dw_expand

        import os as _os
        from ..ops.dispatch import use_pallas as _use_pallas
        if (_os.environ.get("FREQFUSION_NAFBLOCK") == "1" and _use_pallas()
                and self.dw_expand == 2 and self.ffn_expand == 2):
            # whole-block fused kernel (ops/pallas_nafblock.py): reads x
            # once per pass instead of ~8-10 HBM round trips per block.
            # Identical param tree via the param-only stand-ins above.
            from ..ops.pallas_nafblock import nafblock_fused
            w = {
                "norm1": _LNParams(c, name="norm1")(),
                "conv1": _ConvParams(c, dw, name="conv1")(),
                "conv2": _DWParams(dw, name="conv2")(),
                "sca": _ConvParams(dw // 2, dw // 2, name="sca")(),
                "conv3": _ConvParams(dw // 2, c, name="conv3")(),
                "beta": self.param("beta", nn.initializers.zeros, (c,)),
                "norm2": _LNParams(c, name="norm2")(),
                "conv4": _ConvParams(c, self.ffn_expand * c,
                                     name="conv4")(),
                "conv5": _ConvParams(c, c, name="conv5")(),
                "gamma": self.param("gamma", nn.initializers.zeros, (c,)),
            }
            return nafblock_fused(inp, w)

        # Measured and DECLINED (BENCH_NOTES round 3): the 9-shift-FMA
        # dwconv variant removes the conv-layout copies but costs 9x the
        # HBM reads — 0.295 -> 0.431 s/img in-model. Grouped conv stays.
        import os
        shift_dw = os.environ.get("FREQFUSION_NAFNET_DWSHIFT", "0") == "1"

        from ..ops.dispatch import use_pallas
        dw_kernel = (os.environ.get("FREQFUSION_DWCONV") == "1"
                     and use_pallas())

        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(inp)
        # 1x1s as dot_generals join the elementwise-fusion layout world
        # (the conv lowering contributed to the 54 ms layout-copy bucket)
        x = Conv1x1(dw, name="conv1")(x)
        if shift_dw:
            x = _DWConv3x3(dw, name="conv2")(x)
        elif dw_kernel:
            x = _DWConv3x3(dw, name="conv2")(x, mode="kernel")
        else:
            x = nn.Conv(dw, (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=dw, name="conv2")(x)
        x = simple_gate(x)
        # Simplified channel attention: pooled 1x1 conv scale
        sca = Conv1x1(dw // 2, name="sca")(global_avg_pool(x))
        x = x * sca
        x = Conv1x1(c, name="conv3")(x)

        beta = self.param("beta", nn.initializers.zeros, (c,))
        y = inp + x * beta

        x = nn.LayerNorm(epsilon=1e-6, name="norm2")(y)
        x = Conv1x1(self.ffn_expand * c, name="conv4")(x)
        x = simple_gate(x)
        x = Conv1x1(c, name="conv5")(x)

        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        return y + x * gamma


class NAFNet(nn.Module):
    """UNet-style restorer: width 64, enc [2,2,4,8], middle 12, dec [2,2,2,2]
    (nafnet_arch.py:137-225). Residual output (x + input)."""

    img_channel: int = 3
    width: int = 64
    middle_blk_num: int = 12
    enc_blk_nums: Sequence[int] = (2, 2, 4, 8)
    dec_blk_nums: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, inp: jnp.ndarray,
                 return_ending_input: bool = False):
        b, h, w, _ = inp.shape
        padder = 2 ** len(self.enc_blk_nums)
        ph = (padder - h % padder) % padder
        pw = (padder - w % padder) % padder
        x_in = pad_zeros(inp, 0, ph, 0, pw) if (ph or pw) else inp

        x = nn.Conv(self.width, (3, 3), padding=((1, 1), (1, 1)), name="intro")(x_in)

        chan = self.width
        skips = []
        for i, num in enumerate(self.enc_blk_nums):
            for j in range(num):
                x = NAFBlock(chan, name=f"encoders_{i}_{j}")(x)
            skips.append(x)
            x = nn.Conv(2 * chan, (2, 2), strides=(2, 2), padding="VALID",
                        name=f"downs_{i}")(x)
            chan *= 2

        for j in range(self.middle_blk_num):
            x = NAFBlock(chan, name=f"middle_blks_{j}")(x)

        for i, num in enumerate(self.dec_blk_nums):
            x = Conv1x1(chan * 2, use_bias=False, name=f"ups_{i}")(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            x = x + skips[-(i + 1)]
            for j in range(num):
                x = NAFBlock(chan, name=f"decoders_{i}_{j}")(x)

        ending_input = x
        x = nn.Conv(self.img_channel, (3, 3), padding=((1, 1), (1, 1)),
                    name="ending")(x)
        x = x + x_in
        out = x[:, :h, :w, :]
        if return_ending_input:
            return out, ending_input[:, :h, :w, :]
        return out


class NAFNetSR(nn.Module):
    """Bicubic x`upscale` + NAFNet refinement, clamped to [0,1]
    (nafnet/__init__.py:117-139). Returns (sr, feat_hr) where feat_hr is
    the ending-conv input at HR resolution ([B, sH, sW, 64]) — callers
    resize it to LR like the reference hook path (io.py:255-258,
    expert_loader.py:630-636)."""

    upscale: int = 4
    width: int = 64
    middle_blk_num: int = 12
    enc_blk_nums: Sequence[int] = (2, 2, 4, 8)
    dec_blk_nums: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, h, w, _ = x.shape
        x_up = upscale_bicubic(x, self.upscale)
        out, feat_hr = NAFNet(
            width=self.width,
            middle_blk_num=self.middle_blk_num,
            enc_blk_nums=self.enc_blk_nums,
            dec_blk_nums=self.dec_blk_nums,
            name="nafnet",
        )(x_up, return_ending_input=True)
        sr = jnp.clip(out, 0.0, 1.0)
        return sr, feat_hr
