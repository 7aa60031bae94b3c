"""eval.py CLI end-to-end on synthetic SR/HR folders."""


import subprocess
import sys
from pathlib import Path

import numpy as np

from freqfusion_tpu.utils.image_io import write_image

REPO = Path(__file__).resolve().parent.parent


def test_eval_cli(tmp_path):
    rng = np.random.default_rng(0)
    out_dir = tmp_path / "sr"
    tgt_dir = tmp_path / "hr"
    out_dir.mkdir()
    tgt_dir.mkdir()
    for i in range(2):
        hr = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        sr = np.clip(hr + rng.normal(0, 0.02, hr.shape), 0, 1).astype(
            np.float32)
        write_image(str(tgt_dir / f"{i}.png"), hr)
        write_image(str(out_dir / f"{i}.png"), sr)

    csv_path = tmp_path / "iqa.csv"
    result = subprocess.run(
        [sys.executable, str(REPO / "eval.py"),
         "--output_folder", str(out_dir), "--target_folder", str(tgt_dir),
         "--results_csv", str(csv_path)],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={"PATH": "/usr/bin:/bin", "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "PYTHONPATH": str(REPO)},
        timeout=240)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Average:" in result.stdout
    assert csv_path.exists()
    # noisy copy of HR should land in a sane PSNR band
    psnr_line = [l for l in result.stdout.splitlines() if "psnr" in l]
    assert psnr_line
