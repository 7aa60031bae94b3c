"""NTIRE interface smoke tests: main(model_dir, input_path, output_path)."""

import numpy as np


from freqfusion_tpu.interface.io import main as ntire_main
from freqfusion_tpu.utils.image_io import read_image, write_image


def test_ntire_main_degraded_pipeline(tmp_path):
    """No checkpoints present -> graceful degradation (random fusion,
    bilinear expert stand-ins); x4 outputs still produced."""
    rng = np.random.default_rng(0)
    model_dir = tmp_path / "model_zoo"
    in_dir = tmp_path / "lr"
    out_dir = tmp_path / "sr"
    model_dir.mkdir()
    in_dir.mkdir()

    for i in range(2):
        img = rng.uniform(0, 1, (13, 17, 3)).astype(np.float32)
        write_image(str(in_dir / f"img_{i}.png"), img)

    ntire_main(str(model_dir), str(in_dir), str(out_dir))

    outs = sorted(out_dir.glob("*.png"))
    assert len(outs) == 2
    sr = read_image(str(outs[0]))
    assert sr.shape == (13 * 4, 17 * 4, 3)
    assert np.isfinite(sr).all()
