"""TSD-SR: DiT parity vs the reference torch implementation, VAE parity
vs an in-test torch mirror of the diffusers AutoencoderKL semantics
(diffusers itself is not installed — the reference degrades to a bilinear
placeholder in that case, tsdsr_wrapper.py:118-120)."""

import numpy as np
import pytest

from reference_loader import has_reference, load_module

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
from torch import nn  # noqa: E402
from torch.nn import functional as F  # noqa: E402

from freqfusion_tpu.convert.tsdsr import (  # noqa: E402
    convert_sd_vae, convert_tsdsr_dit,
)
from freqfusion_tpu.models.tsdsr import (  # noqa: E402
    AutoencoderKL, TSDSRDiT, TSDSRRefiner,
)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_tsdsr_dit_matches_torch_reference():
    mod = load_module("src/models/tsdsr/dit.py", "ref_tsdsr_dit")
    torch.manual_seed(0)
    tm = mod.TSDSRDiT(hidden_size=64, depth=2, num_heads=4)
    tm.eval()
    # final_layer is zero-init (so the block is identity) — randomize it
    # to make the parity check non-trivial
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "final_layer" in name or "norm1.linear" in name \
                    or "norm2.linear" in name:
                p.normal_(0, 0.02)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = TSDSRDiT(hidden_size=64, depth=2, num_heads=4)
    params = convert_tsdsr_dit(sd)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)

    got = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(got),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# In-test torch mirror of the SD AutoencoderKL (diffusers layout)
# ---------------------------------------------------------------------------


class _TResnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(min(32, cin), cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(min(32, cout), cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        sk = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return sk + h


class _TAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = nn.GroupNorm(min(32, c), c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        a = torch.softmax(q @ k.transpose(1, 2) / (c ** 0.5), dim=-1)
        o = self.to_out[0](a @ v)
        return x + o.transpose(1, 2).reshape(b, c, h, w)


class _TVAE(nn.Module):
    """diffusers AutoencoderKL key layout for a tiny config."""

    def __init__(self, chans=(32, 64), lpb=1, latent=4):
        super().__init__()
        self.latent = latent
        enc, dec = nn.Module(), nn.Module()
        enc.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        cin = chans[0]
        for i, ch in enumerate(chans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [_TResnet(cin if j == 0 else ch, ch) for j in range(lpb)])
            if i < len(chans) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)
                blk.downsamplers = nn.ModuleList([ds])
            enc.down_blocks.append(blk)
            cin = ch
        mid = nn.Module()
        mid.resnets = nn.ModuleList([_TResnet(cin, cin), _TResnet(cin, cin)])
        mid.attentions = nn.ModuleList([_TAttn(cin)])
        enc.mid_block = mid
        enc.conv_norm_out = nn.GroupNorm(min(32, cin), cin, eps=1e-6)
        enc.conv_out = nn.Conv2d(cin, 2 * latent, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)

        self.post_quant_conv = nn.Conv2d(latent, latent, 1)
        rev = list(chans)[::-1]
        dec.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
        midd = nn.Module()
        midd.resnets = nn.ModuleList(
            [_TResnet(rev[0], rev[0]), _TResnet(rev[0], rev[0])])
        midd.attentions = nn.ModuleList([_TAttn(rev[0])])
        dec.mid_block = midd
        dec.up_blocks = nn.ModuleList()
        cin = rev[0]
        for i, ch in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [_TResnet(cin if j == 0 else ch, ch)
                 for j in range(lpb + 1)])
            if i < len(rev) - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(ch, ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            dec.up_blocks.append(blk)
            cin = ch
        dec.conv_norm_out = nn.GroupNorm(min(32, cin), cin, eps=1e-6)
        dec.conv_out = nn.Conv2d(cin, 3, 3, padding=1)
        self.decoder = dec

    def encode_mean(self, x):
        h = self.encoder.conv_in(x)
        for i, blk in enumerate(self.encoder.down_blocks):
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = F.pad(h, (0, 1, 0, 1))
                h = blk.downsamplers[0].conv(h)
        h = self.encoder.mid_block.resnets[0](h)
        h = self.encoder.mid_block.attentions[0](h)
        h = self.encoder.mid_block.resnets[1](h)
        h = self.encoder.conv_out(F.silu(self.encoder.conv_norm_out(h)))
        return self.quant_conv(h)[:, : self.latent]

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block.resnets[0](h)
        h = self.decoder.mid_block.attentions[0](h)
        h = self.decoder.mid_block.resnets[1](h)
        for i, blk in enumerate(self.decoder.up_blocks):
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))


def test_sd_vae_matches_torch_mirror():
    torch.manual_seed(1)
    tm = _TVAE(chans=(32, 64), lpb=1).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_sd_vae(sd)

    model = AutoencoderKL(channels=(32, 64), layers_per_block=1)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)

    z = model.apply(variables, jnp.asarray(x), method=AutoencoderKL.encode)
    with torch.no_grad():
        zt = tm.encode_mean(
            torch.from_numpy(x.transpose(0, 3, 1, 2)) * 2 - 1) * 0.18215
    np.testing.assert_allclose(np.asarray(z),
                               zt.numpy().transpose(0, 2, 3, 1),
                               atol=3e-5, rtol=1e-4)

    out = model.apply(variables, z, method=AutoencoderKL.decode)
    with torch.no_grad():
        xt = tm.decode(zt / 0.18215)
        xt = ((xt + 1) / 2).clamp(0, 1)
    np.testing.assert_allclose(np.asarray(out),
                               xt.numpy().transpose(0, 2, 3, 1),
                               atol=3e-5, rtol=1e-4)


def test_refiner_identity_without_weights(capsys):
    r = TSDSRRefiner(enabled=True)
    x = jnp.ones((1, 8, 8, 3)) * 0.5
    out = r(x)
    assert r.enabled is False
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_refiner_runs_with_weights():
    """End-to-end refine with tiny random weights: encode->DiT->decode,
    including the non-multiple-of-8 pad/crop path."""
    rng = np.random.default_rng(3)
    vae = AutoencoderKL(channels=(8, 8), layers_per_block=1)
    dit = TSDSRDiT(hidden_size=16, depth=1, num_heads=2)
    x0 = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    vae_params = vae.init(jax.random.PRNGKey(0), x0)
    z0 = vae.apply(vae_params, x0, method=AutoencoderKL.encode)
    dit_params = dit.init(jax.random.PRNGKey(1), z0)

    r = TSDSRRefiner(enabled=True, dit_params=dit_params,
                     vae_params=vae_params, dit_model=dit, vae_model=vae)
    assert r.enabled
    x = jnp.asarray(rng.uniform(0, 1, (1, 13, 19, 3)).astype(np.float32))
    out = r(x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))
