"""Fusion network: numerical parity vs the PyTorch reference (random
weights) through forward_with_precomputed — the path that holds the
0.05 dB budget for cached training and inference."""

import sys

import numpy as np
import pytest

from reference_loader import REFERENCE, has_reference

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.convert.common import assert_tree_shapes  # noqa: E402
from freqfusion_tpu.convert.fusion import convert_fusion  # noqa: E402
from freqfusion_tpu.models.fusion.fusion_v2 import (  # noqa: E402
    CompleteEnhancedFusionSR,
)

FEATURE_CHANNELS = {"drct": 180, "grl": 180, "nafnet": 64, "mamba": 180}


def _load_ref_fusion():
    ref = str(REFERENCE)
    if ref not in sys.path:
        sys.path.insert(0, ref)
    from src.models.enhanced_fusion_v2 import CompleteEnhancedFusionSR as Ref
    return Ref


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_fusion_matches_torch_reference():
    Ref = _load_ref_fusion()
    torch.manual_seed(0)
    tm = Ref(expert_ensemble=None)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = CompleteEnhancedFusionSR()
    rng = np.random.default_rng(0)
    h, w, s = 16, 16, 4
    lr = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    imgs = {k: rng.uniform(0, 1, (1, h * s, w * s, 3)).astype(np.float32)
            for k in FEATURE_CHANNELS}
    feats = {k: rng.normal(size=(1, h, w, c)).astype(np.float32)
             for k, c in FEATURE_CHANNELS.items()}

    target = model.init(jax.random.PRNGKey(0), jnp.asarray(lr),
                        {k: jnp.asarray(v) for k, v in imgs.items()},
                        {k: jnp.asarray(v) for k, v in feats.items()})
    variables = convert_fusion(sd)
    assert_tree_shapes(variables, target, "fusion")

    sr = model.apply(variables, jnp.asarray(lr),
                     {k: jnp.asarray(v) for k, v in imgs.items()},
                     {k: jnp.asarray(v) for k, v in feats.items()})

    with torch.no_grad():
        out = tm.forward_with_precomputed(
            torch.from_numpy(lr.transpose(0, 3, 1, 2)),
            {k: torch.from_numpy(v.transpose(0, 3, 1, 2))
             for k, v in imgs.items()},
            {k: torch.from_numpy(v.transpose(0, 3, 1, 2))
             for k, v in feats.items()},
        )
    np.testing.assert_allclose(
        np.asarray(sr), out.numpy().transpose(0, 2, 3, 1),
        atol=5e-4, rtol=1e-3)
