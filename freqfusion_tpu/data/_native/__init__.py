"""Native host-side kernels (optional; build with scripts/build_native.py)."""

import os
import sys

_HERE = os.path.dirname(__file__)
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

try:
    import _augmentc

    crop_geom = _augmentc.crop_geom
    NATIVE_AVAILABLE = True
except ImportError:  # pragma: no cover — numpy fallback in augment.py
    crop_geom = None
    NATIVE_AVAILABLE = False
