"""DAT: numerical parity vs the PyTorch reference (random weights)."""

import numpy as np
import pytest

from reference_loader import has_reference, load_module

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.convert.common import assert_tree_shapes  # noqa: E402
from freqfusion_tpu.convert.dat import convert_dat  # noqa: E402
from freqfusion_tpu.models.dat import DAT  # noqa: E402

SMALL = dict(upscale=4, embed_dim=48, depths=(4, 4), num_heads=4,
             split_size=(4, 8), expansion=2.0)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_dat_matches_torch_reference():
    mod = load_module("src/models/dat/dat_arch.py", "ref_dat_arch")
    torch.manual_seed(0)
    tm = mod.DAT(upscale=4, in_chans=3, img_size=16, img_range=1.0,
                 depth=[4, 4], embed_dim=48, num_heads=[4, 4],
                 expansion_factor=2.0, resi_connection="1conv",
                 split_size=[4, 8], drop_path_rate=0.0,
                 upsampler="pixelshuffle")
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = DAT(**SMALL)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)

    target = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = convert_dat(sd)
    assert_tree_shapes(variables, target, "dat")

    sr, feat = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(sr), out.numpy().transpose(0, 2, 3, 1),
        atol=3e-4, rtol=1e-3)
    assert feat.shape == (1, 16, 16, 48)
