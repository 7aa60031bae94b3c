"""TSD-SR: one-step diffusion perceptual refiner (config-dormant).

Reference: src/models/tsdsr/dit.py (DiT with adaLN conditioning, 464 LoC)
+ src/models/tsdsr_wrapper.py (SD-2.1 VAE encode -> distilled one-step
DiT student -> decode, 557 LoC). The stage is config-disabled in training
(configs/train_config.yaml:85-92) and mocked out of the submission path
(io.py:45-54); the reference's own VAE additionally degrades to bilinear
1/8-resize placeholders when diffusers is absent
(tsdsr_wrapper.py:118-120, 142-144).

This port implements the full architectures natively (NHWC flax):
  * DiT — patch-embed conv, sinusoidal time embedding, adaLN-conditioned
    transformer blocks, zero-init final projection, unpatchify
    (dit.py:30-320); TSDSRDiT fixes timestep 500 and applies the 0.1-step
    residual refinement (dit.py:323-391).
  * AutoencoderKL — the SD VAE architecture the wrapper builds through
    diffusers (tsdsr_wrapper.py:85-88): GroupNorm-SiLU resnet stacks,
    spatial mid-attention, stride-2 down / nearest-up sampling, quant
    convs, 0.18215 latent scaling.
  * TSDSRRefiner — the gated pipeline object: identity passthrough until
    weights are supplied, exactly like the reference's mocked path.

Converters + random-weight parity tests: convert/tsdsr.py,
tests/test_tsdsr_parity.py.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DiT", "TSDSRDiT", "AutoencoderKL", "TSDSRRefiner",
           "TSDSR_AVAILABLE"]

TSDSR_AVAILABLE = True  # architecture exists; the *stage* stays config-gated


def sinusoidal_time_embed(timesteps: jnp.ndarray, dim: int) -> jnp.ndarray:
    """[B] -> [B, dim] (dit.py:30-52)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * (-math.log(10000.0) / (half - 1)))
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class AdaLayerNorm(nn.Module):
    """Affine-free LN modulated by a conditioning vector (dit.py:55-81).
    The modulation linear is zero-init so the block starts as identity."""

    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        ss = nn.Dense(self.hidden * 2, name="linear",
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros)(cond)
        scale, shift = jnp.split(ss, 2, axis=-1)
        x = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False)(x)
        return x * (1.0 + scale[:, None]) + shift[:, None]


class DiTBlock(nn.Module):
    """AdaLN -> MHA -> add; AdaLN -> MLP -> add (dit.py:147-175).
    Frozen-inference semantics: no dropout."""

    hidden: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        b, l, c = x.shape
        hd = c // self.num_heads

        y = AdaLayerNorm(self.hidden, name="norm1")(x, cond)
        qkv = nn.Dense(3 * c, name="attn_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, l, c)
        x = x + nn.Dense(c, name="attn_proj")(attn)

        y = AdaLayerNorm(self.hidden, name="norm2")(x, cond)
        h = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1")(y)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(c, name="mlp_fc2")(h)


class DiT(nn.Module):
    """Latent-space diffusion transformer (dit.py:182-320), NHWC."""

    in_channels: int = 4
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 2
    time_embed_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 timestep: jnp.ndarray) -> jnp.ndarray:
        """x: [B, H, W, C latent]; timestep: [B]."""
        b, h, w, c = x.shape
        p = self.patch_size

        tokens = nn.Conv(self.hidden_size, (p, p), strides=(p, p),
                         name="patch_embed")(x)
        hp, wp = tokens.shape[1], tokens.shape[2]
        tokens = tokens.reshape(b, hp * wp, self.hidden_size)

        t = sinusoidal_time_embed(timestep, self.time_embed_dim)
        t = nn.Dense(self.hidden_size * 4, name="time_1")(t)
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(self.hidden_size, name="time_3")(t)

        for i in range(self.depth):
            tokens = DiTBlock(self.hidden_size, self.num_heads,
                              self.mlp_ratio, name=f"blocks_{i}")(tokens, t)

        tokens = nn.LayerNorm(epsilon=1e-6, name="norm")(tokens)
        out = nn.Dense(p * p * self.in_channels, name="final_layer",
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros)(tokens)

        # unpatchify (dit.py:262-281) — NHWC
        out = out.reshape(b, hp, wp, p, p, self.in_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w,
                                                      self.in_channels)
        return out


class TSDSRDiT(nn.Module):
    """One-step student: fixed timestep + 0.1-step residual refinement
    (dit.py:323-391)."""

    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    one_step_timestep: int = 500

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 timestep: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if timestep is None:
            timestep = jnp.full((x.shape[0],), self.one_step_timestep,
                                jnp.float32)
        pred = DiT(in_channels=4, hidden_size=self.hidden_size,
                   depth=self.depth, num_heads=self.num_heads,
                   name="dit")(x, timestep)
        return x + pred * 0.1


# ---------------------------------------------------------------------------
# SD AutoencoderKL (the VAE tsdsr_wrapper builds through diffusers)
# ---------------------------------------------------------------------------


class ResnetBlock(nn.Module):
    """GroupNorm32-SiLU-conv x2 + (1x1-projected) skip — the SD VAE
    resnet (diffusers ResnetBlock2D semantics, fixed groups=32)."""

    out_ch: int
    groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]),
                         epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=min(self.groups, self.out_ch),
                         epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over H*W tokens (SD VAE mid)."""

    groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=min(self.groups, c), epsilon=1e-6,
                         name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(y)
        k = nn.Dense(c, name="to_k")(y)
        v = nn.Dense(c, name="to_v")(y)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits / math.sqrt(c), axis=-1).astype(v.dtype)
        o = jnp.einsum("bqk,bkc->bqc", probs, v)
        o = nn.Dense(c, name="to_out")(o)
        return x + o.reshape(b, h, w, c)


class VAEEncoder(nn.Module):
    channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_ch: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    name="conv_in")(x)
        for i, ch in enumerate(self.channels):
            for j in range(self.layers_per_block):
                h = ResnetBlock(ch, name=f"down_{i}_block_{j}")(h)
            if i < len(self.channels) - 1:
                # stride-2 conv with the SD VAE's asymmetric (0,1) pad
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            name=f"down_{i}_downsample")(h)
        ch = self.channels[-1]
        h = ResnetBlock(ch, name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn")(h)
        h = ResnetBlock(ch, name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=min(32, ch), epsilon=1e-6,
                         name="norm_out")(h)
        h = nn.silu(h)
        # 2*latent: mean and logvar of the diagonal posterior
        h = nn.Conv(2 * self.latent_ch, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv_out")(h)
        return nn.Conv(2 * self.latent_ch, (1, 1), name="quant_conv")(h)


class VAEDecoder(nn.Module):
    channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_ch: int = 4

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        z = nn.Conv(self.latent_ch, (1, 1), name="post_quant_conv")(z)
        rev = list(self.channels)[::-1]
        h = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)),
                    name="conv_in")(z)
        h = ResnetBlock(rev[0], name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn")(h)
        h = ResnetBlock(rev[0], name="mid_block_2")(h)
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block + 1):
                h = ResnetBlock(ch, name=f"up_{i}_block_{j}")(h)
            if i < len(rev) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=min(32, ch), epsilon=1e-6,
                         name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """SD VAE: encode (posterior mean — deterministic, the frozen-eval
    choice) and decode, with the 0.18215 latent scale
    (tsdsr_wrapper.py:107-153)."""

    channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_ch: int = 4
    scale_factor: float = 0.18215

    def setup(self):
        self.encoder = VAEEncoder(self.channels, self.layers_per_block,
                                  self.latent_ch)
        self.decoder = VAEDecoder(self.channels, self.layers_per_block,
                                  self.latent_ch)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [B,H,W,3] in [0,1] -> latent [B,H/8,W/8,4]."""
        moments = self.encoder(x * 2.0 - 1.0)
        mean = moments[..., : self.latent_ch]
        return mean * self.scale_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        x = self.decoder(z / self.scale_factor)
        return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encode(x)
        return self.decode(z), z


class TSDSRRefiner:
    """Gated one-step refinement stage (tsdsr_wrapper.py TSDSRInference).

    Without weights it is the identity passthrough the reference's
    submission path mocks in (io.py:45-54). With converted weights
    (convert/tsdsr.py) it runs encode -> one-step DiT -> decode.
    """

    def __init__(self, enabled: bool = False,
                 dit_params=None, vae_params=None,
                 dit_model: Optional[TSDSRDiT] = None,
                 vae_model: Optional["AutoencoderKL"] = None,
                 hidden_size: int = 768, depth: int = 12,
                 num_heads: int = 12):
        self.enabled = bool(enabled and dit_params is not None
                            and vae_params is not None)
        if enabled and not self.enabled:
            print("TSD-SR refiner requested but weights missing — identity "
                  "passthrough (matches the reference's mocked io path)")
        if self.enabled:
            self.dit = dit_model or TSDSRDiT(
                hidden_size=hidden_size, depth=depth, num_heads=num_heads)
            self.vae = vae_model or AutoencoderKL()
            self.dit_params = dit_params
            self.vae_params = vae_params
            self._fwd = jax.jit(self._refine)

    def _refine(self, sr: jnp.ndarray) -> jnp.ndarray:
        z = self.vae.apply(self.vae_params, sr, method=AutoencoderKL.encode)
        z = self.dit.apply(self.dit_params, z)
        return self.vae.apply(self.vae_params, z,
                              method=AutoencoderKL.decode)

    def __call__(self, sr: jnp.ndarray) -> jnp.ndarray:
        if not self.enabled:
            return sr
        # VAE needs H, W divisible by 8 — reflect-pad and crop back.
        b, h, w, c = sr.shape
        hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
        if (hp, wp) != (h, w):
            sr_p = jnp.pad(sr, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                           mode="reflect")
        else:
            sr_p = sr
        out = self._fwd(sr_p)
        return out[:, :h, :w]
