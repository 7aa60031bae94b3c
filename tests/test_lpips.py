"""LPIPS JAX forward vs an in-test torch reference (random weights).

torchvision isn't installed and there is no egress, so the torch side is
built here layer by layer from the published LPIPS-vgg architecture; the
converter then maps its state dict and the JAX forward must match.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
from torch import nn  # noqa: E402

from freqfusion_tpu.convert.lpips import convert_lpips, save_lpips_npz  # noqa: E402
from freqfusion_tpu.utils.lpips import (  # noqa: E402
    VGG_CFG, TAPS, load_lpips_params, lpips_forward,
)


def _torch_vgg16_features():
    layers = []
    in_ch = 3
    for item in VGG_CFG:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, item, 3, padding=1))
            layers.append(nn.ReLU())
            in_ch = item
    return nn.Sequential(*layers)


def _torch_lpips(vgg, lins, x0, x1):
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        h = (x - shift) / scale
        taps, conv_i = [], 0
        for mod in vgg:
            h = mod(h)
            if isinstance(mod, nn.ReLU):
                if conv_i in TAPS:
                    taps.append(h)
                conv_i += 1
        return taps

    def unit(f):
        return f / (f.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)

    total = 0.0
    for i, (a, b) in enumerate(zip(feats(x0), feats(x1))):
        d = (unit(a) - unit(b)) ** 2
        total = total + lins[i](d).mean(dim=(1, 2, 3))
    return total


def test_lpips_matches_torch(tmp_path):
    torch.manual_seed(0)
    vgg = _torch_vgg16_features().eval()
    lins = []
    ch = [64, 128, 256, 512, 512]
    for c in ch:
        lin = nn.Sequential(nn.Identity(),
                            nn.Conv2d(c, 1, 1, bias=False))
        with torch.no_grad():
            lin[1].weight.abs_()
        lins.append(lin)

    vgg_sd = {f"features.{k}": v.detach().numpy()
              for k, v in vgg.state_dict().items()}
    lin_sd = {f"lin{i}.model.1.weight": l[1].weight.detach().numpy()
              for i, l in enumerate(lins)}
    params = convert_lpips(vgg_sd, lin_sd)

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    got = lpips_forward({k: jnp.asarray(v) for k, v in params.items()},
                        jnp.asarray(a), jnp.asarray(b))

    with torch.no_grad():
        ref = _torch_lpips(vgg, lins,
                           torch.from_numpy(a.transpose(0, 3, 1, 2)) * 2 - 1,
                           torch.from_numpy(b.transpose(0, 3, 1, 2)) * 2 - 1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               atol=1e-4, rtol=1e-3)
    # identical images -> exactly zero distance
    same = lpips_forward({k: jnp.asarray(v) for k, v in params.items()},
                         jnp.asarray(a), jnp.asarray(a))
    assert float(jnp.max(jnp.abs(same))) < 1e-6

    # npz save/load roundtrip
    p = tmp_path / "lpips.npz"
    save_lpips_npz(params, str(p))
    loaded = load_lpips_params(str(p))
    got2 = lpips_forward(loaded, jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), atol=1e-6)
