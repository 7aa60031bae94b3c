"""Perceptual IQA metric wrappers with graceful degradation.

Equivalent of src/utils/perceptual_metrics.py: LPIPS + pyiqa-backed
metrics (DISTS, NIQE, MUSIQ, MANIQA, CLIP-IQA) used by the challenge's
Perception track (eval.py:61-125). These are torch-ecosystem models; they
run on the host CPU when their packages are importable and report
unavailability otherwise — the same import-guard pattern the reference
uses for lpips/pyiqa/clip (perceptual_loss.py:39-59).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

__all__ = ["PerceptualEvaluator", "available_metrics"]

_PYIQA_METRICS = ("lpips", "dists", "niqe", "musiq", "maniqa", "clipiqa")


def available_metrics() -> List[str]:
    out = []
    try:
        import pyiqa  # noqa: F401
        out.extend(_PYIQA_METRICS)
    except ImportError:
        try:
            import lpips  # noqa: F401
            out.append("lpips")
        except ImportError:
            pass
    return out


class PerceptualEvaluator:
    """Lazy-loading metric bank; call with HWC float [0,1] numpy arrays."""

    def __init__(self, metrics: Optional[List[str]] = None,
                 device: str = "cpu"):
        self.device = device
        self.requested = [m.lower() for m in (metrics or ["lpips"])]
        self._models: Dict[str, object] = {}
        self._no_ref = {"niqe", "musiq", "maniqa", "clipiqa"}

    def _get(self, name: str):
        if name in self._models:
            return self._models[name]
        try:
            import pyiqa
            model = pyiqa.create_metric(name, device=self.device)
        except ImportError:
            if name == "lpips":
                try:
                    import lpips
                    model = lpips.LPIPS(net="alex")
                except ImportError:
                    model = None
            else:
                model = None
        self._models[name] = model
        return model

    def __call__(self, sr: np.ndarray,
                 hr: Optional[np.ndarray] = None) -> Dict[str, float]:
        import_ok = True
        try:
            import torch
        except ImportError:
            import_ok = False
        results: Dict[str, float] = {}
        if not import_ok:
            return results
        import torch

        t_sr = torch.from_numpy(
            np.ascontiguousarray(sr.transpose(2, 0, 1))).float()[None]
        t_hr = (None if hr is None else torch.from_numpy(
            np.ascontiguousarray(hr.transpose(2, 0, 1))).float()[None])
        for name in self.requested:
            model = self._get(name)
            if model is None:
                continue
            with torch.no_grad():
                try:
                    if name in self._no_ref:
                        results[name] = float(model(t_sr))
                    elif t_hr is not None:
                        results[name] = float(model(t_sr, t_hr))
                except Exception:  # pragma: no cover — metric-specific failure
                    continue
        return results
