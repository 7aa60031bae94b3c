"""NAFNet-SR: numerical parity vs the PyTorch reference (random weights)."""

import numpy as np
import pytest

from reference_loader import has_reference, load_module

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.convert.common import assert_tree_shapes  # noqa: E402
from freqfusion_tpu.convert.nafnet import convert_nafnet  # noqa: E402
from freqfusion_tpu.models.nafnet import NAFNetSR  # noqa: E402

SMALL = dict(upscale=4, width=16, middle_blk_num=2,
             enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_nafnet_sr_matches_torch_reference():
    arch = load_module("src/models/nafnet/nafnet_arch.py", "ref_nafnet_arch")
    torch.manual_seed(0)
    tnaf = arch.NAFNet(img_channel=3, width=16, middle_blk_num=2,
                       enc_blk_nums=[1, 1], dec_blk_nums=[1, 1])
    tnaf.eval()
    sd = {k: v.detach().numpy() for k, v in tnaf.state_dict().items()}

    model = NAFNetSR(**SMALL)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 13, 18, 3)).astype(np.float32)

    target = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_nafnet(sd)
    assert_tree_shapes(params, target, "nafnet")

    sr, feat = model.apply(params, jnp.asarray(x))

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        x_up = torch.nn.functional.interpolate(
            xt, scale_factor=4, mode="bicubic", align_corners=False)
        out = tnaf(x_up).clamp(0, 1).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(sr), out, atol=3e-4, rtol=1e-3)
    assert feat.shape == (1, 52, 72, 16)


def test_nafnet_dwshift_route_matches_grouped_conv(monkeypatch):
    """The declined 9-shift-FMA dwconv variant (FREQFUSION_NAFNET_DWSHIFT=1,
    receipt in BENCH_NOTES) stays numerically identical to the shipped
    grouped conv, on the SAME param tree."""
    model = NAFNetSR(**SMALL)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 13, 18, 3)).astype(np.float32))

    monkeypatch.delenv("FREQFUSION_NAFNET_DWSHIFT", raising=False)
    params = model.init(jax.random.PRNGKey(1), x)
    sr_ref, _ = model.apply(params, x)

    monkeypatch.setenv("FREQFUSION_NAFNET_DWSHIFT", "1")
    sr_shift, _ = model.apply(params, x)

    np.testing.assert_allclose(np.asarray(sr_shift), np.asarray(sr_ref),
                               atol=2e-5, rtol=1e-5)


def test_nafnet_dwconv_kernel_route_matches(monkeypatch):
    """FREQFUSION_DWCONV=1 (halo-DMA Pallas dwconv stencil) == the
    grouped-conv route, same params."""
    from freqfusion_tpu.models.nafnet import NAFNetSR

    model = NAFNetSR(width=16, middle_blk_num=1, enc_blk_nums=(1, 1),
                     dec_blk_nums=(1, 1))
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.uniform(0, 1, (1, 24, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    monkeypatch.delenv("FREQFUSION_DWCONV", raising=False)
    sr_ref, feat_ref = model.apply(params, x)
    monkeypatch.setenv("FREQFUSION_DWCONV", "1")
    sr_new, feat_new = model.apply(params, x)

    np.testing.assert_allclose(np.asarray(sr_new), np.asarray(sr_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(feat_new), np.asarray(feat_ref),
                               atol=2e-5, rtol=1e-5)
