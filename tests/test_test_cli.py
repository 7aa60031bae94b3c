"""test.py CLI end-to-end (model_id 29, degraded pipeline)."""

import subprocess
import sys
from pathlib import Path

import numpy as np

from freqfusion_tpu.utils.image_io import write_image

REPO = Path(__file__).resolve().parent.parent


def test_test_cli_runs(tmp_path):
    rng = np.random.default_rng(0)
    test_dir = tmp_path / "lr"
    test_dir.mkdir()
    write_image(str(test_dir / "img.png"),
                rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))

    result = subprocess.run(
        [sys.executable, str(REPO / "test.py"),
         "--test_dir", str(test_dir), "--save_dir", str(tmp_path / "out"),
         "--model_id", "29"],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={"PATH": "/usr/bin:/bin", "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "PYTHONPATH": str(REPO)},
        timeout=420)
    assert result.returncode == 0, result.stderr[-2000:]
    outs = list((tmp_path / "out").rglob("*.png"))
    assert len(outs) == 1
    assert (tmp_path / "results.json").exists()
