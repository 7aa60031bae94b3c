"""Perceptual IQA metric bank with native backends + graceful degradation.

Equivalent of src/utils/perceptual_metrics.py (the challenge Perception
track, eval.py:61-125). Two metrics run NATIVELY in this framework —
NIQE (utils/niqe.py, given a pristine model), LPIPS-vgg
(utils/lpips.py, given converted weights) and DISTS (utils/dists.py,
given converted weights) — so the track is computable
without pyiqa. MUSIQ/MANIQA/CLIP-IQA remain torch-ecosystem models
behind the reference's import-guard pattern (perceptual_loss.py:39-59):
used when pyiqa is importable, reported unavailable otherwise.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

__all__ = ["PerceptualEvaluator", "available_metrics"]

_PYIQA_METRICS = ("lpips", "dists", "niqe", "musiq", "maniqa", "clipiqa")


def available_metrics(niqe_params: Optional[str] = None,
                      lpips_weights: Optional[str] = None,
                      dists_weights: Optional[str] = None) -> List[str]:
    out = []
    if niqe_params:
        out.append("niqe")
    if lpips_weights:
        out.append("lpips")
    if dists_weights:
        out.append("dists")
    try:
        import pyiqa  # noqa: F401
        out.extend(m for m in _PYIQA_METRICS if m not in out)
    except ImportError:
        try:
            import lpips  # noqa: F401
            if "lpips" not in out:
                out.append("lpips")
        except ImportError:
            pass
    return out


class PerceptualEvaluator:
    """Lazy-loading metric bank; call with HWC float [0,1] numpy arrays.

    niqe_params / lpips_weights / dists_weights activate the native
    backends (they take precedence over pyiqa for those metrics)."""

    def __init__(self, metrics: Optional[List[str]] = None,
                 device: str = "cpu",
                 niqe_params: Optional[str] = None,
                 lpips_weights: Optional[str] = None,
                 dists_weights: Optional[str] = None):
        self.device = device
        self.requested = [m.lower() for m in (metrics or ["lpips"])]
        self._models: Dict[str, object] = {}
        self._no_ref = {"niqe", "musiq", "maniqa", "clipiqa"}
        self._niqe_model = None
        self._lpips_fn = None
        if niqe_params:
            from .niqe import load_niqe_params
            self._niqe_model = (load_niqe_params(niqe_params)
                                if isinstance(niqe_params, str)
                                else niqe_params)
        if lpips_weights:
            import jax
            from .lpips import load_lpips_params, lpips_forward
            params = (load_lpips_params(lpips_weights)
                      if isinstance(lpips_weights, str) else lpips_weights)
            self._lpips_fn = jax.jit(
                lambda a, b: lpips_forward(params, a, b))
        self._dists_fn = None
        if dists_weights:
            import jax
            from .dists import dists_forward, load_dists_params
            dparams = (load_dists_params(dists_weights)
                       if isinstance(dists_weights, str) else dists_weights)
            self._dists_fn = jax.jit(
                lambda a, b: dists_forward(dparams, a, b))

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
        results: Dict[str, float] = {}

        remaining = []
        for name in self.requested:
            if name == "niqe" and self._niqe_model is not None:
                from .niqe import niqe as niqe_fn
                try:
                    results["niqe"] = float(niqe_fn(sr, self._niqe_model))
                except ValueError:
                    pass
                continue
            if name == "lpips" and self._lpips_fn is not None:
                if hr is not None:
                    import jax.numpy as jnp
                    results["lpips"] = float(self._lpips_fn(
                        jnp.asarray(sr)[None], jnp.asarray(hr)[None])[0])
                continue
            if name == "dists" and self._dists_fn is not None:
                if hr is not None:
                    import jax.numpy as jnp
                    results["dists"] = float(self._dists_fn(
                        jnp.asarray(sr)[None], jnp.asarray(hr)[None])[0])
                continue
            remaining.append(name)

        if not remaining:
            return results
        try:
            import torch
        except ImportError:
            return results

        t_sr = torch.from_numpy(
            np.ascontiguousarray(sr.transpose(2, 0, 1))).float()[None]
        t_hr = (None if hr is None else torch.from_numpy(
            np.ascontiguousarray(hr.transpose(2, 0, 1))).float()[None])
        for name in remaining:
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
