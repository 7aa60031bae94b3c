"""EDSR: numerical parity vs the PyTorch reference (random weights)."""

import numpy as np
import pytest

from reference_loader import has_reference, load_module

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.convert.common import assert_tree_shapes  # noqa: E402
from freqfusion_tpu.convert.edsr import convert_edsr  # noqa: E402
from freqfusion_tpu.models.edsr import EDSR  # noqa: E402


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_edsr_matches_torch_reference():
    mod = load_module("src/models/edsr/edsr_arch.py", "ref_edsr_arch")
    torch.manual_seed(0)
    tm = mod.EDSR(num_feat=32, num_block=4, upscale=4, res_scale=0.1,
                  img_range=255.0)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = EDSR(num_feat=32, num_block=4, upscale=4)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 12, 14, 3)).astype(np.float32)

    target = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_edsr(sd)
    assert_tree_shapes(params, target, "edsr")

    sr, feat = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(sr), out.numpy().transpose(0, 2, 3, 1),
        atol=5e-4, rtol=1e-3)
    assert feat.shape == (1, 12, 14, 32)
