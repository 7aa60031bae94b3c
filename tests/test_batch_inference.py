"""batch_inference.py: bucketed, data-parallel inference smoke test."""

import subprocess
import sys
from pathlib import Path

import numpy as np

from freqfusion_tpu.utils.image_io import read_image, write_image

REPO = Path(__file__).resolve().parent.parent


def test_batch_inference_cli(tmp_path):
    rng = np.random.default_rng(0)
    lr_dir = tmp_path / "lr"
    lr_dir.mkdir()
    # two images in the same 16-bucket, one in another
    for name, shape in [("a", (14, 14, 3)), ("b", (16, 16, 3)),
                        ("c", (20, 24, 3))]:
        write_image(str(lr_dir / f"{name}.png"),
                    rng.uniform(0, 1, shape).astype(np.float32))

    result = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "batch_inference.py"),
         "--model-dir", str(tmp_path / "model_zoo"),
         "--lr-dir", str(lr_dir), "--out-dir", str(tmp_path / "out"),
         "--batch", "2"],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "PYTHONPATH": str(REPO)},
        timeout=560)
    assert result.returncode == 0, result.stderr[-2000:]
    assert read_image(str(tmp_path / "out" / "a.png")).shape == (56, 56, 3)
    assert read_image(str(tmp_path / "out" / "c.png")).shape == (80, 96, 3)
