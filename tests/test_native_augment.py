"""Native C crop_geom kernel == numpy fallback for all dihedral variants."""

import numpy as np
import pytest

from freqfusion_tpu.data import augment
from freqfusion_tpu.data.augment import apply_geometry, crop_and_transform


@pytest.mark.parametrize("hflip", [False, True])
@pytest.mark.parametrize("vflip", [False, True])
@pytest.mark.parametrize("rot_k", [0, 1, 2, 3])
def test_crop_and_transform_matches_numpy(hflip, vflip, rot_k):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(20, 24, 3)).astype(np.float32)
    out = crop_and_transform(x, 2, 3, 8, 10, hflip, vflip, rot_k)
    ref = apply_geometry(x[2:10, 3:13], hflip, vflip, rot_k)
    np.testing.assert_array_equal(out, np.ascontiguousarray(ref))


def test_numpy_fallback_path(monkeypatch):
    monkeypatch.setattr(augment, "NATIVE_AVAILABLE", False)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, 16, 3)).astype(np.float32)
    out = crop_and_transform(x, 0, 0, 8, 8, True, False, 1)
    ref = apply_geometry(x[:8, :8], True, False, 1)
    np.testing.assert_array_equal(out, ref)
