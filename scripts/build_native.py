#!/usr/bin/env python
"""Build the native host-side extensions (C, via setuptools).

    python scripts/build_native.py

Produces freqfusion_tpu/data/_native/_augmentc*.so. Everything degrades to
numpy when the extension is absent, so this is an optimization step, not a
requirement.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
NATIVE = ROOT / "freqfusion_tpu" / "data" / "_native"

SETUP = """
import numpy
from setuptools import Extension, setup

setup(
    name="freqfusion_native",
    ext_modules=[
        Extension(
            "_augmentc",
            sources=["augmentc.c"],
            include_dirs=[numpy.get_include()],
            extra_compile_args=["-O3"],
        )
    ],
)
"""


def main() -> int:
    with tempfile.TemporaryDirectory() as tmp:
        tmp_path = Path(tmp)
        shutil.copy(NATIVE / "augmentc.c", tmp_path / "augmentc.c")
        (tmp_path / "setup.py").write_text(SETUP)
        result = subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=tmp_path, capture_output=True, text=True)
        if result.returncode != 0:
            print(result.stdout)
            print(result.stderr)
            return 1
        for so in tmp_path.glob("_augmentc*.so"):
            dst = NATIVE / so.name
            shutil.copy(so, dst)
            print(f"built {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
