"""Golden tests for core ops against PyTorch-CPU semantics.

These pin the bit-compatibility budget (SURVEY.md hard part #3): resize,
padding, pixel shuffle must match torch.nn.functional exactly, because the
reference composes them dozens of times per forward pass.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from freqfusion_tpu.ops import (
    resize_bilinear, resize_bicubic, upscale_bicubic,
    pad_reflect, pad_to_multiple, pixel_shuffle,
    avg_pool_2x2, global_avg_pool,
)


def to_torch(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)


def to_nhwc(t_nchw):
    return t_nchw.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 16), (64, 64)), ((64, 48), (16, 12)), ((17, 23), (51, 69)),
    ((64, 64), (128, 128)),
])
def test_bilinear_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    want = to_nhwc(F.interpolate(to_torch(x), size=out_hw, mode="bilinear",
                                 align_corners=False))
    got = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 16), (64, 64)), ((32, 24), (128, 96)), ((13, 17), (52, 68)),
])
def test_bicubic_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    want = to_nhwc(F.interpolate(to_torch(x), size=out_hw, mode="bicubic",
                                 align_corners=False))
    got = np.asarray(resize_bicubic(jnp.asarray(x), *out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upscale_bicubic_x4(rng):
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    want = to_nhwc(F.interpolate(to_torch(x), scale_factor=4, mode="bicubic",
                                 align_corners=False))
    got = np.asarray(upscale_bicubic(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pad_reflect_matches_torch(rng):
    x = rng.standard_normal((1, 8, 9, 3), dtype=np.float32)
    want = to_nhwc(F.pad(to_torch(x), (2, 3, 1, 4), mode="reflect"))
    got = np.asarray(pad_reflect(jnp.asarray(x), 1, 4, 2, 3))
    np.testing.assert_allclose(got, want)


def test_pad_to_multiple(rng):
    x = rng.standard_normal((1, 13, 22, 3), dtype=np.float32)
    out = pad_to_multiple(jnp.asarray(x), 16)
    assert out.shape == (1, 16, 32, 3)
    x2 = rng.standard_normal((1, 16, 32, 3), dtype=np.float32)
    assert pad_to_multiple(jnp.asarray(x2), 16).shape == (1, 16, 32, 3)


@pytest.mark.parametrize("r", [2, 4])
def test_pixel_shuffle_matches_torch(rng, r):
    x = rng.standard_normal((2, 5, 7, 12 * r * r), dtype=np.float32)
    want = to_nhwc(F.pixel_shuffle(to_torch(x), r))
    got = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    np.testing.assert_allclose(got, want)


def test_avg_pool(rng):
    x = rng.standard_normal((2, 9, 11, 3), dtype=np.float32)
    want = to_nhwc(F.avg_pool2d(to_torch(x), 2, 2))
    got = np.asarray(avg_pool_2x2(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_global_avg_pool(rng):
    x = rng.standard_normal((2, 8, 8, 5), dtype=np.float32)
    got = np.asarray(global_avg_pool(jnp.asarray(x)))
    assert got.shape == (2, 1, 1, 5)
    np.testing.assert_allclose(got[:, 0, 0, :], x.mean(axis=(1, 2)), rtol=1e-6)


def test_conv1x1_matches_conv_route(monkeypatch):
    """Conv1x1 (dot_general) == nn.Conv 1x1 lowering, same param tree."""
    import flax.linen as nn

    from freqfusion_tpu.ops.conv1x1 import Conv1x1

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 6, 10, 24)).astype(np.float32))
    mod = Conv1x1(16)
    params = mod.init(jax.random.PRNGKey(0), x)
    assert params["params"]["kernel"].shape == (1, 1, 24, 16)
    ref_mod = nn.Conv(16, (1, 1))
    y_ref = ref_mod.apply(params, x)

    monkeypatch.delenv("FREQFUSION_CONV1X1", raising=False)
    y_dot = mod.apply(params, x)
    monkeypatch.setenv("FREQFUSION_CONV1X1", "conv")
    y_conv = mod.apply(params, x)

    np.testing.assert_allclose(np.asarray(y_dot), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)

    nb = Conv1x1(16, use_bias=False)
    p2 = nb.init(jax.random.PRNGKey(1), x)
    assert set(p2["params"]) == {"kernel"}
    assert np.isfinite(np.asarray(nb.apply(p2, x))).all()
