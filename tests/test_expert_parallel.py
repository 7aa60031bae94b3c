"""Expert-parallel pipeline: per-device placement + parity with the
sequential single-device pipeline on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freqfusion_tpu.models.drct import DRCT
from freqfusion_tpu.models.grl import GRL
from freqfusion_tpu.models.mambair import MambaIR
from freqfusion_tpu.models.nafnet import NAFNetSR
from freqfusion_tpu.models.fusion.fusion_v2 import CompleteEnhancedFusionSR
from freqfusion_tpu.models.pipeline import FreqFusionPipeline
from freqfusion_tpu.parallel.expert_parallel import ExpertParallelPipeline

FEAT_CH = {"drct": 60, "grl": 48, "nafnet": 16, "mamba": 60}


def _small_models():
    return {
        "drct": DRCT(upscale=4, embed_dim=60, num_layers=1, num_heads=6,
                     window_size=8, gc=12),
        "grl": GRL(upscale=4, embed_dim=48, depths=(2,), num_heads_w=3,
                   num_heads_s=3, window_size=8),
        "nafnet": NAFNetSR(upscale=4, width=16, middle_blk_num=2,
                           enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)),
        "mamba": MambaIR(upscale=4, embed_dim=60, depths=(2,), d_state=8,
                         scan_chunk=64),
    }


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_expert_parallel_matches_sequential():
    models = _small_models()
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    params = {n: m.init(jax.random.PRNGKey(i), lr)
              for i, (n, m) in enumerate(models.items())}
    fusion = CompleteEnhancedFusionSR(upscale=4)
    mock_imgs = {k: jnp.zeros((1, 64, 64, 3)) for k in models}
    mock_feats = {k: jnp.zeros((1, 16, 16, c)) for k, c in FEAT_CH.items()}
    params["fusion"] = fusion.init(jax.random.PRNGKey(9), lr, mock_imgs,
                                   mock_feats)

    seq = FreqFusionPipeline(dict(params), scale=4, fusion_model=fusion)
    seq.models = models
    seq.FEATURE_CHANNELS = FEAT_CH
    seq._jit_one = {n: jax.jit(lambda p, x, m=m: m.apply(p, x))
                    for n, m in models.items()}
    sr_seq = np.asarray(seq(lr))

    ep = ExpertParallelPipeline(dict(params), scale=4, fusion_model=fusion,
                                models=models)
    ep.FEATURE_CHANNELS = FEAT_CH
    # each expert's params live on a distinct device
    devs = {n: ep.expert_devices[n] for n in models}
    assert len(set(devs.values())) == 4, devs
    leaf = jax.tree_util.tree_leaves(ep.params["drct"])[0]
    assert list(leaf.devices())[0] == ep.expert_devices["drct"]

    sr_ep = np.asarray(ep(lr))
    np.testing.assert_allclose(sr_ep, sr_seq, atol=2e-5, rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_expert_parallel_graceful_degradation():
    models = _small_models()
    rng = np.random.default_rng(1)
    lr = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    params = {n: m.init(jax.random.PRNGKey(i), lr)
              for i, (n, m) in enumerate(models.items()) if n != "mamba"}
    fusion = CompleteEnhancedFusionSR(upscale=4)
    mock_imgs = {k: jnp.zeros((1, 64, 64, 3)) for k in models}
    mock_feats = {k: jnp.zeros((1, 16, 16, c)) for k, c in FEAT_CH.items()}
    params["fusion"] = fusion.init(jax.random.PRNGKey(9), lr, mock_imgs,
                                   mock_feats)

    ep = ExpertParallelPipeline(dict(params), scale=4, fusion_model=fusion,
                                models=models)
    ep.FEATURE_CHANNELS = FEAT_CH
    out = np.asarray(ep(lr))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_load_pipeline_expert_parallel_knob(tmp_path, monkeypatch):
    """FREQFUSION_EXPERT_PARALLEL=1 routes load_pipeline to the
    expert-parallel pipeline (random-weight degraded mode)."""
    from freqfusion_tpu.interface.io import load_pipeline

    monkeypatch.setenv("FREQFUSION_EXPERT_PARALLEL", "1")
    pipe = load_pipeline(str(tmp_path), verbose=False)
    assert isinstance(pipe, ExpertParallelPipeline)
