"""HAT: numerical parity vs the PyTorch reference (random weights)."""

import numpy as np
import pytest

from reference_loader import has_reference, load_module

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.convert.common import assert_tree_shapes  # noqa: E402
from freqfusion_tpu.convert.hat import convert_hat  # noqa: E402
from freqfusion_tpu.models.hat import HAT  # noqa: E402

SMALL = dict(upscale=4, embed_dim=48, depths=(2, 2), num_heads=4,
             window_size=8, overlap_ratio=0.5, mlp_ratio=2.0)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_hat_matches_torch_reference():
    mod = load_module("src/models/hat/hat_arch.py", "ref_hat_arch")
    torch.manual_seed(0)
    tm = mod.HAT(upscale=4, in_chans=3, img_size=16, window_size=8,
                 embed_dim=48, depths=(2, 2), num_heads=(4, 4),
                 compress_ratio=3, squeeze_factor=30, conv_scale=0.01,
                 overlap_ratio=0.5, mlp_ratio=2.0, img_range=1.0,
                 drop_path_rate=0.0, upsampler="pixelshuffle",
                 resi_connection="1conv")
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = HAT(**SMALL)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)

    target = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_hat(sd)
    assert_tree_shapes(params, target, "hat")

    sr, feat = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(sr), out.numpy().transpose(0, 2, 3, 1),
        atol=3e-4, rtol=1e-3)
    assert feat.shape == (1, 16, 16, 48)
