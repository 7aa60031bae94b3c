"""DISTS JAX forward vs an in-test torch reference (random weights).

The reference computes DISTS via pyiqa (reference eval.py:85-90); neither
pyiqa nor torchvision is installed here, so the torch side is built layer
by layer from the published DISTS architecture (Ding et al. 2020: VGG16
with L2-pooling, 6 stages, alpha/beta-weighted texture+structure
similarity); the converter maps its state dict and the JAX forward must
match.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from freqfusion_tpu.convert.dists import convert_dists, save_dists_npz  # noqa: E402
from freqfusion_tpu.utils.dists import (  # noqa: E402
    CHNS, dists_forward, load_dists_params,
)
from freqfusion_tpu.utils.lpips import VGG_CFG  # noqa: E402


def _torch_vgg16_features():
    layers = []
    in_ch = 3
    for item in VGG_CFG:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))  # placeholder slot
        else:
            layers.append(nn.Conv2d(in_ch, item, 3, padding=1))
            layers.append(nn.ReLU())
            in_ch = item
    return nn.Sequential(*layers)


def _l2_pool_torch(x):
    a = torch.hann_window(5 + 2, periodic=True)  # unused; explicit below
    taps = torch.tensor([0.5, 1.0, 0.5], dtype=torch.float64)
    g = (taps[:, None] * taps[None, :])
    g = (g / g.sum()).to(x.dtype)
    c = x.shape[1]
    k = g[None, None].repeat(c, 1, 1, 1)
    out = F.conv2d(x * x, k, stride=2, padding=1, groups=c)
    return torch.sqrt(out + 1e-12)


def _torch_dists(vgg, alpha, beta, x0, x1):
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    stage_end = {1, 3, 6, 9, 12}

    def feats(x):
        h = (x - mean) / std
        out = [x]
        conv_i = 0
        for m in vgg:
            if isinstance(m, nn.MaxPool2d):
                h = _l2_pool_torch(h)
                continue
            h = m(h)
            if isinstance(m, nn.ReLU):
                if conv_i in stage_end:
                    out.append(h)
                conv_i += 1
        return out

    f0, f1 = feats(x0), feats(x1)
    c1 = c2 = 1e-6
    w_sum = alpha.sum() + beta.sum()
    a_split = torch.split(alpha / w_sum, CHNS, dim=1)
    b_split = torch.split(beta / w_sum, CHNS, dim=1)
    dist1 = 0
    dist2 = 0
    for k in range(len(CHNS)):
        x_mean = f0[k].mean([2, 3], keepdim=True)
        y_mean = f1[k].mean([2, 3], keepdim=True)
        s1 = (2 * x_mean * y_mean + c1) / (x_mean ** 2 + y_mean ** 2 + c1)
        dist1 = dist1 + (a_split[k] * s1).sum(1, keepdim=True)
        x_var = ((f0[k] - x_mean) ** 2).mean([2, 3], keepdim=True)
        y_var = ((f1[k] - y_mean) ** 2).mean([2, 3], keepdim=True)
        xy_cov = (f0[k] * f1[k]).mean([2, 3], keepdim=True) \
            - x_mean * y_mean
        s2 = (2 * xy_cov + c2) / (x_var + y_var + c2)
        dist2 = dist2 + (b_split[k] * s2).sum(1, keepdim=True)
    return (1 - (dist1 + dist2)).squeeze(-1).squeeze(-1).squeeze(-1)


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    vgg = _torch_vgg16_features()
    with torch.no_grad():
        for m in vgg:
            if isinstance(m, nn.Conv2d):
                m.weight.mul_(0.3)  # keep activations bounded through depth
    total = sum(CHNS)
    alpha = torch.rand(1, total, 1, 1)
    beta = torch.rand(1, total, 1, 1)
    vgg_sd = {f"features.{k}": v for k, v in vgg.state_dict().items()}
    w_sd = {"alpha": alpha.numpy(), "beta": beta.numpy()}
    params = convert_dists({k: v.numpy() for k, v in vgg_sd.items()}, w_sd)
    return vgg, alpha, beta, params


def test_dists_parity(setup):
    vgg, alpha, beta, params = setup
    rng = np.random.default_rng(0)
    x0 = rng.uniform(0, 1, (2, 64, 96, 3)).astype(np.float32)
    x1 = np.clip(x0 + rng.normal(0, 0.05, x0.shape), 0, 1).astype(np.float32)

    with torch.no_grad():
        ref = _torch_dists(vgg, alpha, beta,
                           torch.from_numpy(x0.transpose(0, 3, 1, 2)),
                           torch.from_numpy(x1.transpose(0, 3, 1, 2)))
    got = np.asarray(dists_forward(
        {k: jnp.asarray(v) for k, v in params.items()},
        jnp.asarray(x0), jnp.asarray(x1)))
    np.testing.assert_allclose(got, ref.numpy(), atol=2e-4, rtol=1e-3)


def test_dists_identical_is_zeroish(setup):
    _, _, _, params = setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    d = float(dists_forward(
        {k: jnp.asarray(v) for k, v in params.items()}, x, x)[0])
    assert abs(d) < 1e-4, d


def test_dists_npz_roundtrip(setup, tmp_path):
    _, _, _, params = setup
    path = str(tmp_path / "dists.npz")
    save_dists_npz(params, path)
    loaded = load_dists_params(path)
    assert set(loaded) == set(params)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    a = np.asarray(dists_forward(
        {k: jnp.asarray(v) for k, v in params.items()}, x0, x1))
    b = np.asarray(dists_forward(loaded, x0, x1))
    np.testing.assert_allclose(a, b, atol=1e-6)
