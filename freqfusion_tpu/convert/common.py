"""Torch-checkpoint -> flax-params conversion utilities.

Host-side tooling (imports torch lazily). Handles the reference's
checkpoint container variants — ``params_ema`` / ``params`` /
``state_dict`` / ``model`` keys and ``module.`` prefixes — like
load_checkpoint_flexible (src/models/expert_loader.py:73-118).

Layout rules (torch -> flax):
  - Conv2d weight  [O, I, kh, kw] -> kernel [kh, kw, I, O]
  - depthwise Conv [C, 1, kh, kw] -> kernel [kh, kw, 1, C]
  - Linear weight  [O, I]         -> kernel [I, O]
  - LayerNorm weight/bias         -> scale/bias
  - BatchNorm weight/bias/mean/var -> batch_stats + params
Buffers that the JAX models recompute statically (relative_position_index,
attn_mask, rgb mean) are dropped.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Mapping, Optional, Tuple

import numpy as np

__all__ = [
    "load_torch_state_dict", "conv_kernel", "dw_conv_kernel", "linear_kernel",
    "unflatten", "assert_tree_shapes", "stack_layers",
]


def stack_layers(params: Mapping[str, Any], prefix: str = "layers_",
                 target: str = "layers", subname: str = "rdg"):
    """Stack per-layer param subtrees onto a leading layer axis.

    {'layers_0': T0, ..., 'layers_11': T11, ...rest} ->
    {'layers': {subname: stack([T0..T11])}, ...rest} — the layout
    nn.scan-over-layers models consume (e.g. DRCT(use_scan=True))."""
    import jax

    layer_keys = sorted((k for k in params if k.startswith(prefix)),
                        key=lambda k: int(k[len(prefix):]))
    if not layer_keys:
        return dict(params)
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *[params[k] for k in layer_keys])
    out = {k: v for k, v in params.items() if k not in layer_keys}
    out[target] = {subname: stacked}
    return out


def stack_layer_runs(params: Mapping[str, Any], depths,
                     prefix: str = "layers_", subname: str = "stage"):
    """Stack layers into runs of consecutive equal depths
    (GRL(use_scan=True): depths (4,4,8,8,8,4,4) -> layers_run{0,1,2})."""
    import jax

    runs = []
    for d in depths:
        if runs and runs[-1][0] == d:
            runs[-1][1] += 1
        else:
            runs.append([d, 1])
    out = {k: v for k, v in params.items() if not k.startswith(prefix)}
    idx = 0
    for ri, (_, count) in enumerate(runs):
        members = [params[f"{prefix}{idx + j}"] for j in range(count)]
        idx += count
        out[f"layers_run{ri}"] = {subname: jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *members)}
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth into {name: np.ndarray}, unwrapping container keys and
    'module.' prefixes (expert_loader.py:81-96)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("params_ema", "params", "state_dict", "model",
                    "model_state_dict"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    out = {}
    for name, tensor in ckpt.items():
        if name.startswith("module."):
            name = name[len("module."):]
        out[name] = np.asarray(tensor.detach().cpu().numpy()
                               if hasattr(tensor, "detach") else tensor)
    return out


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """[O, I, kh, kw] -> [kh, kw, I, O]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def dw_conv_kernel(w: np.ndarray) -> np.ndarray:
    """Depthwise [C, 1, kh, kw] -> [kh, kw, 1, C]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """[O, I] -> [I, O]."""
    return np.ascontiguousarray(w.T)


def unflatten(flat: Mapping[str, np.ndarray], sep: str = "/") -> Dict[str, Any]:
    """{'a/b/c': x} -> nested {'a': {'b': {'c': x}}}."""
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def _flatten(tree: Any, prefix: str = "") -> Iterable[Tuple[str, Any]]:
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}/")
    else:
        yield prefix[:-1], tree


def assert_tree_shapes(converted: Mapping[str, Any],
                       target: Mapping[str, Any],
                       label: str = "") -> None:
    """Verify the converted tree has exactly the target's keys and shapes."""
    conv = dict(_flatten(converted))
    tgt = dict(_flatten(target))
    missing = sorted(set(tgt) - set(conv))
    extra = sorted(set(conv) - set(tgt))
    if missing or extra:
        raise ValueError(
            f"{label}: key mismatch\n  missing ({len(missing)}): "
            f"{missing[:8]}\n  extra ({len(extra)}): {extra[:8]}")
    for k in tgt:
        cs, ts = np.shape(conv[k]), np.shape(tgt[k])
        if cs != ts:
            raise ValueError(f"{label}: shape mismatch at {k}: {cs} vs {ts}")
