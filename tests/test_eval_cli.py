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


def test_eval_batched_100_pairs(tmp_path):
    """100 mixed-shape pairs evaluated through the bucketed batched path;
    per-image PSNR must match the single-image computation."""
    import jax.numpy as jnp

    import eval as eval_mod
    from freqfusion_tpu.utils.metrics import psnr

    rng = np.random.default_rng(1)
    out_dir = tmp_path / "sr"
    tgt_dir = tmp_path / "hr"
    out_dir.mkdir()
    tgt_dir.mkdir()
    shapes = [(40, 40), (40, 56), (64, 40)]
    raw = {}
    for i in range(100):
        h, w = shapes[i % len(shapes)]
        hr = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        sr = np.clip(hr + rng.normal(0, 0.05, hr.shape), 0, 1).astype(
            np.float32)
        write_image(str(tgt_dir / f"im{i:03d}.png"), hr)
        write_image(str(out_dir / f"im{i:03d}.png"), sr)
        raw[f"im{i:03d}"] = (sr, hr)

    pairs = eval_mod._pairs(str(out_dir), str(tgt_dir))
    assert len(pairs) == 100
    results = eval_mod.evaluate_pairs(pairs, ["psnr", "ssim"],
                                      crop_border=4, batch=16)
    assert len(results) == 100
    # cross-check three images against the unbatched metric (on the
    # PNG-roundtripped pixels)
    from freqfusion_tpu.utils.image_io import read_image
    for stem in ("im000", "im001", "im050"):
        sr = read_image(str(out_dir / f"{stem}.png"))
        hr = read_image(str(tgt_dir / f"{stem}.png"))
        ref = float(psnr(jnp.asarray(sr[None]), jnp.asarray(hr[None]),
                         4, True))
        assert abs(results[stem]["psnr"] - ref) < 1e-3


def test_eval_averages_skip_missing(tmp_path, capsys):
    """A metric missing on some images must not zero-deflate averages."""
    import eval as eval_mod

    avg = eval_mod.total_score({"NIQE": 5.0, "LPIPS": 0.3})
    assert abs(avg - (0.5 + 0.7)) < 1e-9
