"""Model-ID 0: DAT baseline NTIRE interface (reference test.py:30-35).

Runs the DAT-S model alone (the challenge's organizer baseline,
model_zoo/team00_dat.pth) through the same main() ABI."""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dat import DAT
from ..ops.pad import pad_reflect
from ..utils.image_io import read_image, write_image

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def main(model_dir: str, input_path: str, output_path: str,
         device=None, scale: int = 4) -> None:
    Path(output_path).mkdir(parents=True, exist_ok=True)
    model = DAT(upscale=scale)

    ckpt = Path(model_dir)
    ckpt = ckpt if ckpt.suffix == ".pth" else ckpt / "team00_dat.pth"
    if ckpt.exists():
        from ..convert.common import load_torch_state_dict
        from ..convert.dat import convert_dat
        variables = convert_dat(load_torch_state_dict(str(ckpt)))
        print(f"  loaded DAT from {ckpt.name}")
    else:
        print(f"  ! {ckpt} not found — random init")
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))

    fwd = jax.jit(lambda v, x: model.apply(v, x)[0])
    files = sorted(p for p in Path(input_path).iterdir()
                   if p.suffix.lower() in _IMG_EXTS)
    for i, path in enumerate(files):
        t0 = time.perf_counter()
        lr = read_image(str(path))
        h, w = lr.shape[:2]
        m = 16  # pad to the max split size
        ph, pw = (m - h % m) % m, (m - w % m) % m
        x = jnp.asarray(lr)[None]
        if ph or pw:
            x = pad_reflect(x, 0, ph, 0, pw)
        sr = np.asarray(fwd(variables, x)[0, : h * scale, : w * scale])
        write_image(str(Path(output_path) / f"{path.stem}.png"),
                    np.clip(sr, 0, 1))
        print(f"  [{i + 1}/{len(files)}] {path.name} "
              f"({time.perf_counter() - t0:.2f}s)")
