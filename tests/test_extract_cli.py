"""extract_features.py -> CachedFeatureDataset chain (degraded pipeline:
no expert checkpoints -> lr/hr-only caches, zero-filled on load)."""

import subprocess
import sys
from pathlib import Path

import numpy as np

from freqfusion_tpu.data.cached import CachedFeatureDataset
from freqfusion_tpu.utils.image_io import write_image

REPO = Path(__file__).resolve().parent.parent


def test_extract_features_degraded(tmp_path):
    rng = np.random.default_rng(0)
    lr_dir, hr_dir = tmp_path / "lr", tmp_path / "hr"
    lr_dir.mkdir()
    hr_dir.mkdir()
    for i in range(2):
        write_image(str(lr_dir / f"{i}.png"),
                    rng.uniform(0, 1, (24, 24, 3)).astype(np.float32))
        write_image(str(hr_dir / f"{i}.png"),
                    rng.uniform(0, 1, (96, 96, 3)).astype(np.float32))

    result = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "extract_features.py"),
         "--model-dir", str(tmp_path / "model_zoo"),
         "--lr-dir", str(lr_dir), "--hr-dir", str(hr_dir),
         "--out-dir", str(tmp_path / "cache"),
         "--crops", "2", "--patch", "16"],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "PYTHONPATH": str(REPO)},
        timeout=300)
    assert result.returncode == 0, result.stderr[-2000:]

    ds = CachedFeatureDataset(str(tmp_path / "cache"), augment=False)
    assert len(ds) == 4  # 2 images x 2 crops
    s = ds[0]
    assert s["lr"].shape == (16, 16, 3)
    assert s["hr"].shape == (64, 64, 3)
    # no experts present -> zero-filled stand-ins
    assert np.all(s["drct_feat"] == 0)
