"""Tiny end-to-end pipeline test: 4 small experts + fusion in one jit."""

import jax
import jax.numpy as jnp
import numpy as np


from freqfusion_tpu.models.drct import DRCT
from freqfusion_tpu.models.fusion.fusion_v2 import CompleteEnhancedFusionSR
from freqfusion_tpu.models.grl import GRL
from freqfusion_tpu.models.mambair import MambaIR
from freqfusion_tpu.models.nafnet import NAFNetSR
from freqfusion_tpu.models.pipeline import FreqFusionPipeline


def _tiny_pipeline():
    """Full pipeline with tiny expert configs (matching feature channels)."""
    pipe = FreqFusionPipeline.__new__(FreqFusionPipeline)
    pipe.scale = 4
    pipe.models = {
        "drct": DRCT(upscale=4, embed_dim=180, num_layers=1, num_heads=6,
                     window_size=8, gc=8),
        "grl": GRL(upscale=4, embed_dim=180, depths=(1,), num_heads_w=3,
                   num_heads_s=3, window_size=8),
        "nafnet": NAFNetSR(upscale=4, width=64, middle_blk_num=1,
                           enc_blk_nums=(1,), dec_blk_nums=(1,)),
        "mamba": MambaIR(upscale=4, embed_dim=180, depths=(1,),
                         mlp_ratio=2.0, scan_chunk=64),
    }
    pipe.fusion = CompleteEnhancedFusionSR(upscale=4)
    lr0 = jnp.zeros((1, 16, 16, 3))
    params = {}
    for i, (name, m) in enumerate(pipe.models.items()):
        params[name] = m.init(jax.random.PRNGKey(i), lr0)
    mock_imgs = {k: jnp.zeros((1, 64, 64, 3)) for k in pipe.models}
    mock_feats = {k: jnp.zeros((1, 16, 16, pipe.FEATURE_CHANNELS[k]))
                  for k in pipe.models}
    params["fusion"] = pipe.fusion.init(jax.random.PRNGKey(9), lr0,
                                        mock_imgs, mock_feats)
    pipe.params = params
    pipe.jit_mode = "full"
    pipe.expert_dtype = None
    pipe._jit_full = jax.jit(pipe._forward_full)
    pipe._jit_experts = jax.jit(pipe._run_experts_padded)
    return pipe


def test_full_pipeline_forward_and_experts():
    pipe = _tiny_pipeline()
    rng = np.random.default_rng(0)
    # Non-multiple-of-16 size exercises the pad/crop path (io.py:224-272)
    lr = jnp.asarray(rng.uniform(0, 1, (1, 13, 18, 3)).astype(np.float32))

    sr = pipe(lr)
    assert sr.shape == (1, 52, 72, 3)
    assert np.isfinite(np.asarray(sr)).all()
    assert float(sr.min()) >= 0.0 and float(sr.max()) <= 1.0

    imgs, feats = pipe.run_experts(jnp.zeros((1, 16, 16, 3)))
    assert set(imgs) == {"drct", "grl", "nafnet", "mamba"}
    assert feats["drct"].shape == (1, 16, 16, 180)
    assert feats["nafnet"].shape == (1, 64, 64, 64)  # HR-resolution feature


def test_pipeline_missing_expert_degrades():
    pipe = _tiny_pipeline()
    del pipe.params["mamba"]
    pipe._jit_full = jax.jit(pipe._forward_full)
    lr = jnp.full((1, 16, 16, 3), 0.5)
    sr = pipe(lr)
    assert sr.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(sr)).all()


def test_full_pipeline_all_round5_gates_on(monkeypatch):
    """De-risk battery step [2d] (measure_r5.sh): the FULL 4-expert +
    fusion pipeline with every round-5 byte-floor kernel gated ON must
    trace/run and match the gates-off output. Uses the interpret path on
    CPU; on hardware the same env set feeds bench.py directly."""
    pipe = _tiny_pipeline()
    rng = np.random.default_rng(3)
    lr = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    sr_ref = np.asarray(pipe(lr))

    monkeypatch.setenv("FREQFUSION_NAFBLOCK", "1")
    monkeypatch.setenv("FREQFUSION_MLP", "1")
    monkeypatch.setenv("FREQFUSION_CAB", "1")
    monkeypatch.setenv("FREQFUSION_PALLAS", "1")
    monkeypatch.setenv("FREQFUSION_SCAN", "xla")
    pipe2 = _tiny_pipeline()
    pipe2.params = pipe.params
    sr_got = np.asarray(pipe2(lr))
    assert np.isfinite(sr_got).all()
    np.testing.assert_allclose(sr_got, sr_ref, atol=5e-4, rtol=5e-4)
