"""DRCT nn.scan-over-layers variant == unrolled variant."""

import jax
import jax.numpy as jnp
import numpy as np

from freqfusion_tpu.convert.common import stack_layers
from freqfusion_tpu.models.drct import DRCT

CFG = dict(upscale=4, embed_dim=60, num_layers=3, num_heads=6,
           window_size=8, gc=12)


def test_drct_scan_matches_unrolled():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))

    unrolled = DRCT(**CFG, use_scan=False)
    params = unrolled.init(jax.random.PRNGKey(0), x)
    sr_ref, feat_ref = unrolled.apply(params, x)

    scanned = DRCT(**CFG, use_scan=True)
    stacked = {"params": stack_layers(params["params"])}
    # verify the stacked tree matches what init would produce
    target = jax.eval_shape(lambda: scanned.init(jax.random.PRNGKey(0), x))
    flat_t = jax.tree_util.tree_leaves_with_path(target)
    flat_s = jax.tree_util.tree_leaves_with_path(stacked)
    assert len(flat_t) == len(flat_s)

    sr, feat = scanned.apply(stacked, x)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sr_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(feat_ref),
                               atol=1e-5, rtol=1e-5)


def test_converted_params_through_scan_model():
    """Converter output -> stack_layers -> use_scan model == unrolled model
    (guards the production bench/inference path)."""
    import pytest
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from reference_loader import has_reference, load_module
    if not has_reference():
        pytest.skip("reference repo not mounted")
    from freqfusion_tpu.convert.drct import convert_drct

    mod = load_module("src/models/drct/drct_arch.py", "ref_drct_arch2")
    torch.manual_seed(1)
    tm = mod.DRCT(upscale=4, img_size=32, window_size=8, embed_dim=60,
                  depths=[6] * 3, num_heads=[6] * 3, img_range=1.0,
                  upsampler="pixelshuffle", resi_connection="1conv", gc=12)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_drct(sd)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    unrolled = DRCT(**CFG, use_scan=False)
    sr_ref, _ = unrolled.apply(params, x)

    scanned = DRCT(**CFG, use_scan=True)
    stacked = {"params": stack_layers(params["params"])}
    sr, _ = scanned.apply(stacked, x)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sr_ref),
                               atol=1e-5, rtol=1e-5)
