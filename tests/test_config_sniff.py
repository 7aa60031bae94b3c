"""Shape-sniffing converters: both DRCT geometries (mlp_ratio 2 and 4)
and MambaIR variants load into a matching model with full parity.

Round-1 gap: the loaders assumed the reference-as-instantiated configs;
the official DRCT-L_X4 release was trained at mlp_ratio=2 (27.58M) where
the reference instantiates 4 (34.17M). sniff_*_config derives the
geometry from state-dict tensor shapes (reference analogue:
expert_loader.py:81-118 shape-filtered loading).
"""

import numpy as np
import pytest

from reference_loader import has_reference, load_module

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.convert.drct import (  # noqa: E402
    convert_drct, sniff_drct_config,
)
from freqfusion_tpu.convert.mambair import (  # noqa: E402
    convert_mambair, sniff_mambair_config,
)
from freqfusion_tpu.models.drct import DRCT  # noqa: E402
from freqfusion_tpu.models.mambair import MambaIR  # noqa: E402


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
@pytest.mark.parametrize("mlp_ratio", [2.0, 4.0])
def test_drct_sniff_both_geometries(mlp_ratio):
    mod = load_module("src/models/drct/drct_arch.py", "ref_drct_arch")
    torch.manual_seed(0)
    tm = mod.DRCT(upscale=4, img_size=32, window_size=8, embed_dim=60,
                  depths=[6] * 2, num_heads=[6] * 2, img_range=1.0,
                  mlp_ratio=mlp_ratio,
                  upsampler="pixelshuffle", resi_connection="1conv", gc=12)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    cfg = sniff_drct_config(sd)
    assert cfg["embed_dim"] == 60
    assert cfg["num_layers"] == 2
    assert cfg["num_heads"] == 6
    assert cfg["window_size"] == 8
    assert cfg["gc"] == 12
    assert cfg["mlp_ratio"] == mlp_ratio
    assert cfg["upscale"] == 4

    model = DRCT(**cfg)
    params = convert_drct(sd)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    sr, _ = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(sr),
                               out.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
@pytest.mark.parametrize("d_state,expand", [(8, 1.0), (16, 2.0)])
def test_mambair_sniff_geometries(d_state, expand):
    from test_mambair_parity import _load_ref_mambair
    mod = _load_ref_mambair()
    torch.manual_seed(0)
    tm = mod.MambaIR(upscale=4, in_chans=3, img_size=16, img_range=1.0,
                     embed_dim=32, depths=(2, 2), d_state=d_state,
                     mlp_ratio=expand, drop_path_rate=0.0,
                     upsampler="pixelshuffle", resi_connection="1conv")
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    cfg = sniff_mambair_config(sd)
    assert cfg["embed_dim"] == 32
    assert cfg["depths"] == (2, 2)
    assert cfg["d_state"] == d_state
    assert cfg["mlp_ratio"] == expand
    assert cfg["upscale"] == 4

    model = MambaIR(**cfg)
    params = convert_mambair(sd)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 12, 12, 3)).astype(np.float32)
    sr, _ = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(sr),
                               out.numpy().transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=1e-3)
