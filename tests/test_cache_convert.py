"""Reference .pt cache triplets -> .npz conversion (Decoupled Compute
compat: cached_dataset.py:10-34 format)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from freqfusion_tpu.data.cached import (CachedFeatureDataset,
                                        convert_reference_cache)


def _save_triplet(d, stem, h=8, s=4, with_mamba=True):
    def chw(c, hh, ww):
        return torch.rand(1, c, hh, ww)

    torch.save({"lr": chw(3, h, h), "hr": chw(3, h * s, h * s),
                "outputs": {"drct": chw(3, h * s, h * s)},
                "features": {"drct": chw(180, h, h)}},
               d / f"{stem}_drct_part.pt")
    torch.save({"outputs": {"grl": chw(3, h * s, h * s),
                            "nafnet": chw(3, h * s, h * s)},
                "features": {"grl": chw(180, h, h),
                             "nafnet": chw(64, h, h)}},
               d / f"{stem}_rest_part.pt")
    if with_mamba:
        torch.save({"outputs": {"mamba": chw(3, h * s, h * s).half()},
                    "features": {"mamba": chw(180, h, h).half()}},
                   d / f"{stem}_mamba_part.pt")


def test_convert_reference_cache_roundtrip(tmp_path):
    src = tmp_path / "pt"
    dst = tmp_path / "npz"
    src.mkdir()
    _save_triplet(src, "img_a")
    _save_triplet(src, "img_b", with_mamba=False)  # missing-mamba path

    n = convert_reference_cache(str(src), str(dst))
    assert n == 2

    ds = CachedFeatureDataset(str(dst), augment=False)
    assert len(ds) == 2
    for i in range(2):
        s = ds[i]
        assert s["lr"].shape == (8, 8, 3)
        assert s["hr"].shape == (32, 32, 3)
        for e, c in (("drct", 180), ("grl", 180), ("nafnet", 64),
                     ("mamba", 180)):
            assert s[f"{e}_img"].shape == (32, 32, 3)
            assert s[f"{e}_feat"].shape == (8, 8, c)
            assert s[f"{e}_feat"].dtype == np.float32
    # img_b's mamba degraded to zeros
    sb = ds[[i for i in range(2) if ds[i]["name"] == "img_b"][0]]
    assert np.all(sb["mamba_feat"] == 0)
