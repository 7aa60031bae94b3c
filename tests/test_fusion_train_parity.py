"""Train-mode fusion semantics: torch cross-check + gradient coverage.

Round-1 gap: test_fusion_parity.py pins only eval semantics, but training
optimizes the train path (BN batch statistics, unclamped outputs). This
pins (a) forward_with_precomputed in train mode against the reference
(dropout zeroed on both sides for determinism; BN normalizes by batch
stats and updates running stats on both), and (b) the reference's
gradient-coverage gate (enhanced_fusion_v2.py:1059-1077): every trainable
leaf receives a finite gradient and batch_stats actually update.
"""

import sys

import numpy as np
import pytest

from reference_loader import REFERENCE, has_reference

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.convert.fusion import convert_fusion  # noqa: E402
from freqfusion_tpu.models.fusion.fusion_v2 import (  # noqa: E402
    CompleteEnhancedFusionSR,
)

FEATURE_CHANNELS = {"drct": 180, "grl": 180, "nafnet": 64, "mamba": 180}


def _inputs(rng, h=16, w=16, s=4):
    lr = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    imgs = {k: rng.uniform(0, 1, (1, h * s, w * s, 3)).astype(np.float32)
            for k in FEATURE_CHANNELS}
    feats = {k: rng.normal(size=(1, h, w, c)).astype(np.float32)
             for k, c in FEATURE_CHANNELS.items()}
    return lr, imgs, feats


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_fusion_train_mode_matches_torch_reference():
    ref = str(REFERENCE)
    if ref not in sys.path:
        sys.path.insert(0, ref)
    from src.models.enhanced_fusion_v2 import CompleteEnhancedFusionSR as Ref

    torch.manual_seed(0)
    tm = Ref(expert_ensemble=None)
    tm.train()
    # Zero every dropout so the stochastic layers drop out of the
    # comparison; BN train behavior is what this test is about.
    for m in tm.modules():
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_fusion(sd)

    model = CompleteEnhancedFusionSR(attn_dropout=0.0)
    rng = np.random.default_rng(1)
    lr, imgs, feats = _inputs(rng)
    jl = jnp.asarray(lr)
    ji = {k: jnp.asarray(v) for k, v in imgs.items()}
    jf = {k: jnp.asarray(v) for k, v in feats.items()}

    sr, mutated = model.apply(variables, jl, ji, jf, train=True,
                              mutable=["batch_stats"])

    with torch.no_grad():
        out = tm.forward_with_precomputed(
            torch.from_numpy(lr.transpose(0, 3, 1, 2)),
            {k: torch.from_numpy(v.transpose(0, 3, 1, 2))
             for k, v in imgs.items()},
            {k: torch.from_numpy(v.transpose(0, 3, 1, 2))
             for k, v in feats.items()},
        )
    ref_np = out.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(sr), ref_np, atol=5e-4, rtol=1e-3)

    # Torch's train forward updated its running stats in place; converting
    # the updated state dict must match our mutated batch_stats. (Loose
    # rtol: torch uses Bessel-corrected variance for the running update,
    # flax the biased batch variance — O(1/n) apart.)
    sd_after = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    ref_stats = convert_fusion(sd_after)["batch_stats"]
    got_stats = mutated["batch_stats"]
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_stats)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(got_stats))
    assert flat_ref and len(flat_ref) == len(flat_got)
    for path, leaf in flat_ref:
        np.testing.assert_allclose(np.asarray(flat_got[path]),
                                   np.asarray(leaf),
                                   atol=1e-4, rtol=1e-2,
                                   err_msg=jax.tree_util.keystr(path))


def test_fusion_gradient_coverage():
    """Every trainable fusion leaf gets a finite gradient from one train
    step, and BN batch_stats change (reference gate :1059-1077)."""
    model = CompleteEnhancedFusionSR()
    rng = np.random.default_rng(2)
    lr, imgs, feats = _inputs(rng)
    jl = jnp.asarray(lr)
    ji = {k: jnp.asarray(v) for k, v in imgs.items()}
    jf = {k: jnp.asarray(v) for k, v in feats.items()}
    target = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0), jl, ji, jf)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def loss_fn(p):
        sr, mut = model.apply(
            {"params": p, "batch_stats": stats}, jl, ji, jf, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.abs(sr - target).mean(), mut

    (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))

    total = dead = nonfinite = 0
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        total += 1
        name = jax.tree_util.keystr(path)
        if not bool(jnp.all(jnp.isfinite(g))):
            nonfinite += 1
            print("non-finite grad:", name)
        if float(jnp.max(jnp.abs(g))) == 0.0:
            dead += 1
            print("zero grad:", name)
    assert nonfinite == 0, f"{nonfinite}/{total} leaves non-finite"
    assert dead == 0, f"{dead}/{total} leaves got zero gradient"

    changed = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            mutated["batch_stats"]):
        before = stats
        for k in [p.key for p in path]:
            before = before[k]
        if not np.allclose(np.asarray(leaf), np.asarray(before)):
            changed += 1
    assert changed > 0, "no batch_stats leaf updated in the train step"
