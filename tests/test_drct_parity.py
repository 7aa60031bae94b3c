"""DRCT: numerical parity vs the PyTorch reference (random weights)."""

import numpy as np
import pytest

from reference_loader import has_reference, load_module

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.convert.common import assert_tree_shapes  # noqa: E402
from freqfusion_tpu.convert.drct import convert_drct  # noqa: E402
from freqfusion_tpu.models.drct import DRCT  # noqa: E402

SMALL = dict(upscale=4, embed_dim=60, num_layers=2, num_heads=6,
             window_size=8, gc=12)


def _torch_small():
    mod = load_module("src/models/drct/drct_arch.py", "ref_drct_arch")
    torch.manual_seed(0)
    m = mod.DRCT(upscale=4, img_size=32, window_size=8, embed_dim=60,
                 depths=[6] * 2, num_heads=[6] * 2, img_range=1.0,
                 upsampler="pixelshuffle", resi_connection="1conv", gc=12)
    m.eval()
    return m


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_drct_matches_torch_reference():
    tm = _torch_small()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = DRCT(**SMALL)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)

    target = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_drct(sd)
    assert_tree_shapes(params, target, "drct")

    sr, feat = model.apply(params, jnp.asarray(x))

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        out = tm(xt).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(sr), out, atol=2e-4, rtol=1e-3)
    assert feat.shape == (1, 16, 16, 60)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_drct_shifted_window_parity_nonsquare():
    """Non-square input exercising the shifted-window mask path."""
    tm = _torch_small()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    model = DRCT(**SMALL)
    params = convert_drct(sd)

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 16, 24, 3)).astype(np.float32)
    sr, _ = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(sr), out.numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=1e-3)
