"""MambaIR + selective scan: numerical parity vs the PyTorch reference.

mamba_ssm (CUDA) is not installable here — the same situation that forced
the reference's remote-only Decoupled Compute for MambaIR. A pure-torch
``selective_scan_fn`` with the kernel's documented semantics is mocked in
so the surrounding architecture can be compared exactly.
"""

import sys
import types

import numpy as np
import pytest

from reference_loader import has_reference, load_module

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from freqfusion_tpu.convert.common import assert_tree_shapes  # noqa: E402
from freqfusion_tpu.convert.mambair import convert_mambair  # noqa: E402
from freqfusion_tpu.models.mambair import MambaIR  # noqa: E402
from freqfusion_tpu.ops.selective_scan import selective_scan  # noqa: E402


def _naive_selective_scan_torch(u, delta, A, B, C, D=None, z=None,
                                delta_bias=None, delta_softplus=False,
                                return_last_state=False):
    """Reference semantics of mamba_ssm.selective_scan_fn (grouped B/C)."""
    b, d, l = u.shape
    n = A.shape[-1]
    u = u.float()
    delta = delta.float()
    if delta_bias is not None:
        delta = delta + delta_bias.float()[None, :, None]
    if delta_softplus:
        delta = torch.nn.functional.softplus(delta)
    if B.dim() == 4:  # [b, g, n, l] grouped
        g = B.shape[1]
        B = B.repeat_interleave(d // g, dim=1)  # [b, d, n, l]? No —
        # mamba_ssm maps group g to the contiguous channel block of size d/g
        C = C.repeat_interleave(d // g, dim=1)
    h = torch.zeros(b, d, n)
    ys = []
    for t in range(l):
        a = torch.exp(delta[:, :, t, None] * A[None])
        h = a * h + delta[:, :, t, None] * B[:, :, :, t] * u[:, :, t, None]
        ys.append((h * C[:, :, :, t]).sum(-1))
    y = torch.stack(ys, dim=-1)
    if D is not None:
        y = y + D.float()[None, :, None] * u
    return y


def test_selective_scan_matches_naive():
    rng = np.random.default_rng(0)
    b, l, d, n = 2, 37, 6, 4
    u = rng.normal(size=(b, l, d)).astype(np.float32)
    delta = rng.normal(size=(b, l, d)).astype(np.float32) * 0.5
    A = -np.exp(rng.normal(size=(d, n)).astype(np.float32) * 0.3)
    B = rng.normal(size=(b, l, n)).astype(np.float32)
    C = rng.normal(size=(b, l, n)).astype(np.float32)
    D = rng.normal(size=(d,)).astype(np.float32)
    bias = rng.normal(size=(d,)).astype(np.float32)

    y = selective_scan(jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A),
                       jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
                       delta_bias=jnp.asarray(bias), chunk=8)

    yt = _naive_selective_scan_torch(
        torch.from_numpy(u.transpose(0, 2, 1)),
        torch.from_numpy(delta.transpose(0, 2, 1)),
        torch.from_numpy(A),
        torch.from_numpy(B.transpose(0, 2, 1))[:, None],
        torch.from_numpy(C.transpose(0, 2, 1))[:, None],
        torch.from_numpy(D), delta_bias=torch.from_numpy(bias),
        delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), yt.numpy(),
                               atol=1e-4, rtol=1e-4)


def _load_ref_mambair():
    if "mamba_ssm" not in sys.modules:
        mamba = types.ModuleType("mamba_ssm")
        ops = types.ModuleType("mamba_ssm.ops")
        iface = types.ModuleType("mamba_ssm.ops.selective_scan_interface")
        iface.selective_scan_fn = _naive_selective_scan_torch
        iface.selective_scan_ref = _naive_selective_scan_torch
        sys.modules["mamba_ssm"] = mamba
        sys.modules["mamba_ssm.ops"] = ops
        sys.modules["mamba_ssm.ops.selective_scan_interface"] = iface
    if "einops" not in sys.modules:
        import einops  # noqa: F401 — baked in
    return load_module("src/models/mambair/mambair_arch.py", "ref_mambair")


SMALL = dict(upscale=4, embed_dim=32, depths=(2,), d_state=8, mlp_ratio=2.0,
             scan_chunk=64)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_mambair_matches_torch_reference():
    mod = _load_ref_mambair()
    torch.manual_seed(0)
    tm = mod.MambaIR(upscale=4, in_chans=3, img_size=16, embed_dim=32,
                     depths=(2,), d_state=8, mlp_ratio=2.0, img_range=1.0,
                     drop_path_rate=0.0, upsampler="pixelshuffle",
                     resi_connection="1conv")
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = MambaIR(**SMALL)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 12, 16, 3)).astype(np.float32)

    target = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_mambair(sd)
    assert_tree_shapes(params, target, "mambair")

    sr, feat = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(sr), out.numpy().transpose(0, 2, 3, 1),
        atol=3e-4, rtol=1e-3)
    assert feat.shape == (1, 12, 16, 32)
