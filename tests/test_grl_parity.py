"""GRL-B: numerical parity vs the PyTorch reference (random weights)."""

import numpy as np
import pytest

from reference_loader import has_reference

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.convert.common import assert_tree_shapes  # noqa: E402
from freqfusion_tpu.convert.grl import convert_grl  # noqa: E402
from freqfusion_tpu.models.grl import GRL  # noqa: E402


def _load_ref_grl():
    # grl_arch imports from .common — load it as a package
    import sys
    sys.path.insert(0, "/root/reference/src/models")
    from reference_loader import install_mocks
    install_mocks()
    import types
    # fairscale mock (grl/__init__.py:24-50)
    if "fairscale" not in sys.modules:
        fairscale = types.ModuleType("fairscale")
        fairscale_nn = types.ModuleType("fairscale.nn")
        fairscale_nn.checkpoint_wrapper = lambda m, **k: m
        sys.modules["fairscale"] = fairscale
        sys.modules["fairscale.nn"] = fairscale_nn
    import grl.grl_arch as ga
    return ga


SMALL = dict(upscale=4, embed_dim=48, depths=(2, 2), num_heads_w=3,
             num_heads_s=3, window_size=8, stripe_size=(8, 8),
             anchor_down_factor=2, mlp_ratio=2.0)


def _torch_small(ga):
    torch.manual_seed(0)
    m = ga.GRL(
        upscale=4, img_size=32, window_size=8, embed_dim=48,
        depths=[2, 2], num_heads_window=[3, 3], num_heads_stripe=[3, 3],
        stripe_size=[8, 8], stripe_groups=[None, None], stripe_shift=False,
        mlp_ratio=2.0, qkv_bias=True, qkv_proj_type="linear",
        anchor_proj_type="avgpool", anchor_one_stage=True,
        anchor_window_down_factor=2, out_proj_type="linear",
        local_connection=True, upsampler="pixelshuffle", conv_type="1conv",
        init_method="n", img_range=1.0, fairscale_checkpoint=False,
        drop_path_rate=0.0,
    )
    m.eval()
    return m


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
@pytest.mark.parametrize("shape", [(16, 16), (16, 24)])
def test_grl_matches_torch_reference(shape):
    ga = _load_ref_grl()
    tm = _torch_small(ga)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = GRL(**SMALL)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, *shape, 3)).astype(np.float32)

    target = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_grl(sd)
    assert_tree_shapes(params, target, "grl")

    sr, feat = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(sr), out.numpy().transpose(0, 2, 3, 1),
        atol=3e-4, rtol=1e-3)
    assert feat.shape == (1, *shape, 48)
