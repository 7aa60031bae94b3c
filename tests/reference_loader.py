"""Load reference PyTorch architectures for numerical parity tests.

The reference repo (read-only at /root/reference) is imported module-by-
module with its own mock strategy for missing deps (basicsr/timm), matching
src/models/drct/__init__.py:16-60 and expert_loader.py:197-227. Parity
tests are skipped when the reference tree is absent.
"""

from __future__ import annotations

import collections.abc
import importlib.util
import sys
import types
from itertools import repeat
from pathlib import Path

REFERENCE = Path("/root/reference")


def has_reference() -> bool:
    return REFERENCE.is_dir()


def _ntuple(n):
    def parse(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return tuple(repeat(x, n))
    return parse


def install_mocks() -> None:
    import torch

    if "basicsr" in sys.modules:
        return
    basicsr = types.ModuleType("basicsr")
    utils = types.ModuleType("basicsr.utils")
    registry = types.ModuleType("basicsr.utils.registry")

    class _Registry:
        def register(self, *a, **k):
            if a and callable(a[0]):
                return a[0]

            def deco(cls):
                return cls
            return deco

    registry.ARCH_REGISTRY = _Registry()
    archs = types.ModuleType("basicsr.archs")
    arch_util = types.ModuleType("basicsr.archs.arch_util")
    arch_util.to_2tuple = _ntuple(2)

    def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            t.normal_(mean, std).clamp_(a * std, b * std)
        return t

    arch_util.trunc_normal_ = trunc_normal_
    for name, mod in {
        "basicsr": basicsr, "basicsr.utils": utils,
        "basicsr.utils.registry": registry, "basicsr.archs": archs,
        "basicsr.archs.arch_util": arch_util,
    }.items():
        sys.modules[name] = mod

    if "omegaconf" not in sys.modules:
        omegaconf = types.ModuleType("omegaconf")

        class _NS:
            def __init__(self, d):
                self.__dict__.update(d)

            def get(self, k, default=None):
                return self.__dict__.get(k, default)

        class OmegaConf:
            @staticmethod
            def create(d):
                return _NS(dict(d))

        omegaconf.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = omegaconf

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")
        timm_layers.to_2tuple = _ntuple(2)
        timm_layers.trunc_normal_ = trunc_normal_

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()

            def forward(self, x):
                return x

        timm_layers.DropPath = DropPath
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers


def load_module(rel_path: str, name: str):
    """Import one reference file by path (keeps sys.path clean)."""
    install_mocks()
    path = REFERENCE / rel_path
    spec = importlib.util.spec_from_file_location(name, str(path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
