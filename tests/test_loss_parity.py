"""Loss components: numerical parity vs the reference's implementations
(SWT GPU approximation, FFT, SSIM, Charbonnier — perceptual_loss.py)."""

import sys
import types

import numpy as np
import pytest

from reference_loader import REFERENCE, has_reference

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.losses.combined import (  # noqa: E402
    charbonnier_loss, fft_loss, ssim_loss, swt_loss,
)


@pytest.fixture(scope="module")
def ref_losses():
    ref = str(REFERENCE)
    if ref not in sys.path:
        sys.path.insert(0, ref)
    if "pywt" not in sys.modules:
        # SWTLoss only touches pywt.Wavelet(...).dec_lo/dec_hi for 'haar'
        # in GPU-approximation mode; provide those constants.
        pywt = types.ModuleType("pywt")

        class Wavelet:
            def __init__(self, name):
                assert name == "haar"
                s = 0.7071067811865476
                self.dec_lo = [s, s]
                self.dec_hi = [-s, s]

        pywt.Wavelet = Wavelet
        sys.modules["pywt"] = pywt
    if "torchvision" not in sys.modules:
        # perceptual_loss.py imports torchvision.models unguarded (:61);
        # only VGGPerceptualLoss (unused here) touches it.
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")

        def _unavailable(*a, **k):
            raise RuntimeError("torchvision mocked out in tests")

        tv_models.vgg19 = _unavailable
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_perceptual_loss", f"{ref}/src/losses/perceptual_loss.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def imgs():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    target = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    return pred, target


def _t(x):
    return torch.from_numpy(x.transpose(0, 3, 1, 2))


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_swt_loss_parity(ref_losses, imgs):
    pred, target = imgs
    ref = ref_losses.SWTLoss(wavelet="haar", level=2,
                             use_gpu_approximation=True)
    expected = float(ref(_t(pred), _t(target)))
    got = float(swt_loss(jnp.asarray(pred), jnp.asarray(target), levels=2))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_fft_loss_parity(ref_losses, imgs):
    pred, target = imgs
    ref = ref_losses.FFTLoss(loss_type="l1", focus_high_freq=True,
                             high_freq_weight=2.0)
    expected = float(ref(_t(pred), _t(target)))
    got = float(fft_loss(jnp.asarray(pred), jnp.asarray(target),
                         high_freq_weight=2.0))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_ssim_loss_parity(ref_losses, imgs):
    pred, target = imgs
    ref = ref_losses.SSIMLoss(window_size=11)
    expected = float(ref(_t(pred), _t(target)))
    got = float(ssim_loss(jnp.asarray(pred), jnp.asarray(target), 11))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_charbonnier_loss_parity(ref_losses, imgs):
    pred, target = imgs
    ref = ref_losses.CharbonnierLoss(eps=1e-6)
    expected = float(ref(_t(pred), _t(target)))
    got = float(charbonnier_loss(jnp.asarray(pred), jnp.asarray(target),
                                 eps=1e-6))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_combined_loss_strictly_obeys_weights(imgs):
    """Reference regression test_loss_bug_fix.py: the total is EXACTLY the
    weighted sum of the active components, zero-weight components are not
    computed, and set_weights hot-swaps cleanly."""
    from freqfusion_tpu.losses.combined import (
        CombinedLoss, charbonnier_loss, l1_loss, swt_loss,
    )

    pred, target = imgs
    pj, tj = jnp.asarray(pred), jnp.asarray(target)

    w = {"l1": 0.7, "swt": 0.2, "charbonnier": 0.0}
    loss = CombinedLoss(weights=w)
    total, comps = loss(pj, tj, return_components=True)
    assert set(comps) == {"l1", "swt"}, comps.keys()
    expected = 0.7 * float(l1_loss(pj, tj)) + 0.2 * float(swt_loss(pj, tj))
    assert abs(float(total) - expected) < 1e-6
    assert loss.get_active_weights() == {"l1": 0.7, "swt": 0.2}

    # stage hot-swap: new weights fully replace participation
    loss.set_weights({"l1": 0.0, "charbonnier": 1.0})
    total2, comps2 = loss(pj, tj, return_components=True)
    assert set(comps2) == {"swt", "charbonnier"}
    expected2 = (0.2 * float(swt_loss(pj, tj))
                 + 1.0 * float(charbonnier_loss(pj, tj)))
    assert abs(float(total2) - expected2) < 1e-6

    # an unknown extra component only fires when weighted
    marker = []

    def extra(p, t):
        marker.append(1)
        return l1_loss(p, t)

    loss3 = CombinedLoss(weights={"l1": 1.0}, extra_components={"vgg": extra})
    loss3(pj, tj)
    assert not marker
    loss3.set_weights({"vgg": 0.5})
    loss3(pj, tj)
    assert marker
