"""host_autograd_loss: the custom_vjp bridge that makes the VGG/CLIP
perceptual losses (reference perceptual_loss.py:455-499, :856-989)
genuinely trainable from JAX. The pretrained backbones need downloads
this environment forbids, so the bridge is pinned with a LOCAL torch
module — the mechanism under test (one host call computing loss + grad,
VJP scaling by the cotangent) is backbone-agnostic."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.losses.perceptual import (  # noqa: E402
    host_autograd_loss, vgg_loss_fn, clip_loss_fn)


def _mini_torch_loss():
    """A small fixed 'backbone': conv + nonlinearity + feature L1, shaped
    like the VGG perceptual loss (pred and target both pass through)."""
    g = torch.Generator().manual_seed(3)
    w = torch.randn(8, 3, 3, 3, generator=g) * 0.3

    def loss(pred_t, target_t):
        def feat(x):
            x = x.permute(0, 3, 1, 2)
            x = torch.nn.functional.conv2d(x, w, padding=1)
            return torch.nn.functional.gelu(x)
        return (feat(pred_t) - feat(target_t)).abs().mean()

    return loss


def test_host_autograd_loss_matches_torch_grad():
    tl = _mini_torch_loss()
    jl = host_autograd_loss(tl)

    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    target = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)

    # forward parity
    pt = torch.from_numpy(pred).requires_grad_(True)
    tt = torch.from_numpy(target)
    ref = tl(pt, tt)
    ref.backward()
    got = jl(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(float(got), float(ref.detach()), rtol=1e-5)

    # gradient parity through jax.grad (THE round-3 gap: pure_callback
    # alone has no VJP — this asserts the custom_vjp route works)
    gj = jax.grad(lambda p: jl(p, jnp.asarray(target)))(jnp.asarray(pred))
    np.testing.assert_allclose(np.asarray(gj), pt.grad.numpy(),
                               rtol=1e-4, atol=1e-6)

    # scalar cotangent scaling (loss used inside a bigger objective)
    gj3 = jax.grad(lambda p: 3.0 * jl(p, jnp.asarray(target)))(
        jnp.asarray(pred))
    np.testing.assert_allclose(np.asarray(gj3), 3.0 * pt.grad.numpy(),
                               rtol=1e-4, atol=1e-6)

    # target cotangent is zero by default (ground truth is data)
    gt = jax.grad(lambda t: jl(jnp.asarray(pred), t))(jnp.asarray(target))
    assert float(jnp.abs(gt).max()) == 0.0


def test_host_autograd_loss_under_jit_and_in_training_objective():
    """The loss must survive jit + value_and_grad exactly as a weight>0
    training stage would use it (make_train_step wraps the criterion in
    value_and_grad under jit)."""
    tl = _mini_torch_loss()
    jl = host_autograd_loss(tl)
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    scale = jnp.asarray(0.7, jnp.float32)

    @jax.jit
    def objective(s):
        pred = jnp.clip(s * x, 0.0, 1.0)
        return 0.5 * jnp.abs(pred - target).mean() + 0.25 * jl(pred, target)

    val, grad = jax.value_and_grad(objective)(scale)
    assert np.isfinite(float(val)) and np.isfinite(float(grad))

    # finite-difference check of the full objective
    eps = 1e-3
    fd = (float(objective(scale + eps)) - float(objective(scale - eps))) / (
        2 * eps)
    np.testing.assert_allclose(float(grad), fd, rtol=2e-2, atol=2e-4)


def test_host_autograd_loss_grad_target_mode():
    tl = _mini_torch_loss()
    jl = host_autograd_loss(tl, grad_target=True)
    rng = np.random.default_rng(2)
    pred = jnp.asarray(rng.uniform(0, 1, (1, 6, 6, 3)).astype(np.float32))
    target_np = rng.uniform(0, 1, (1, 6, 6, 3)).astype(np.float32)

    tt = torch.from_numpy(target_np).requires_grad_(True)
    ref = tl(torch.from_numpy(np.asarray(pred)), tt)
    ref.backward()
    gt = jax.grad(lambda t: jl(pred, t))(jnp.asarray(target_np))
    np.testing.assert_allclose(np.asarray(gt), tt.grad.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_host_autograd_loss_primal_skips_backward_and_guards_target():
    """ADVICE r4: the un-differentiated primal must not pay torch
    backward(); grad_target=True with target=None must raise cleanly."""
    calls = {"fwd": 0, "bwd": 0}

    class _Probe(torch.autograd.Function):
        @staticmethod
        def forward(ctx, x):
            calls["fwd"] += 1
            ctx.n = x.numel()
            return x.mean()

        @staticmethod
        def backward(ctx, g):
            calls["bwd"] += 1
            return g.expand(ctx.n) / ctx.n

    def tl(pred_t):
        return _Probe.apply(pred_t.reshape(-1))

    jl = host_autograd_loss(tl)
    x = jnp.ones((1, 4, 4, 3), jnp.float32)
    float(jl(x, None))           # primal only
    assert calls == {"fwd": 1, "bwd": 0}
    jax.grad(lambda p: jl(p, None))(x)  # differentiated: fwd+bwd host call
    assert calls["bwd"] == 1

    jl_t = host_autograd_loss(_mini_torch_loss(), grad_target=True)
    with pytest.raises(ValueError, match="requires a target"):
        jl_t(x, None)


def test_backbone_gated_factories_degrade_to_none():
    """Without downloadable weights the factories return None (the
    reference's import-guard pattern, perceptual_loss.py:39-59) — and the
    trainer recipe ships them weight-0, so nothing else must break."""
    assert vgg_loss_fn() is None or callable(vgg_loss_fn())
    assert clip_loss_fn() is None or callable(clip_loss_fn())
