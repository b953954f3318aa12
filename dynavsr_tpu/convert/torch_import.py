"""PyTorch .pth -> JAX params converter (SURVEY.md §5 checkpoint row [H]).

The reference ships public .pth checkpoints (EDVR/TOF/DUF/MFDN); loading
them is a stated requirement (BASELINE.json). Our flax modules use the SAME
attribute names as the reference archs (conv_first, pcd_align.L3_dcnpack,
tsa_fusion.tAtt_1, ...), so conversion is mechanical:

  flax path                       torch key
  conv_first/kernel            -> conv_first.weight   (OIHW -> HWIO)
  conv_first/bias              -> conv_first.bias
  feature_extraction/blocks/block/conv1/kernel
                               -> feature_extraction.{i}.conv1.weight
                                  stacked over i (nn.scan trunks store
                                  params with a leading (n_blocks,) axis)

Rules:
  * conv kernels transpose OIHW -> HWIO; linear weights (out,in) -> (in,out)
  * 'kernel' -> 'weight'; scan trunks ('blocks'/'block' path segments)
    expand to indexed torch keys and stack along axis 0
  * DCNSep's own 'weight' param is a conv kernel (OIHW in torch)
  * 'module.' DDP prefixes are stripped (reference save_network did the
    same before saving [H])
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple

import jax
import numpy as np

__all__ = ["load_torch_checkpoint", "convert_state_dict", "flax_to_torch_key"]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth state_dict into {name: np.ndarray} (strips 'module.')."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


_LEAF_MAP = {
    "kernel": "weight",
    "weight": "weight",
    "scale": "weight",         # flax BatchNorm scale -> torch bn.weight
    "mean": "running_mean",    # flax batch_stats      -> torch running stats
    "var": "running_var",
}


def flax_to_torch_key(path: Tuple[str, ...]) -> Tuple[str, bool]:
    """Map a flax param path (without 'params'/'batch_stats' root and scan
    markers) to the torch state_dict key. Returns (key, needs_layout_fix):
    only conv/linear kernels transpose; BN scale is 1-D and passes through."""
    *mods, leaf = path
    is_kernel = leaf in ("kernel", "weight")
    torch_leaf = _LEAF_MAP.get(leaf, leaf)
    return ".".join(list(mods) + [torch_leaf]), is_kernel


def _to_flax(arr: np.ndarray, want_shape, is_weight: bool) -> np.ndarray:
    a = np.asarray(arr)
    if is_weight and a.ndim == 4:
        a = a.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    elif is_weight and a.ndim == 5:
        a = a.transpose(2, 3, 4, 1, 0)  # 3D conv OIDHW -> DHWIO
    elif is_weight and a.ndim == 2 and a.shape != tuple(want_shape):
        a = a.T  # linear (out,in) -> (in,out)
    if tuple(a.shape) != tuple(want_shape):
        raise ValueError(
            f"shape mismatch after layout fix: torch {arr.shape} -> {a.shape}, "
            f"flax wants {tuple(want_shape)}"
        )
    return a


def convert_state_dict(
    state_dict: Mapping[str, np.ndarray], params_template: Any
) -> Any:
    """Fill a flax params pytree (e.g. from jax.eval_shape(model.init, ...))
    with values from a torch state_dict. Raises on any missing key or
    shape mismatch — strict like the reference's load_network default [H]."""
    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
    treedef = jax.tree_util.tree_structure(params_template)
    leaves: List[np.ndarray] = []
    used = set()
    for keypath, leaf in flat:
        names = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        if names and names[0] in ("params", "batch_stats"):
            names = names[1:]
        if "blocks" in names:
            # nn.scan trunk: ('trunkname', 'blocks', 'block', 'convX', leaf)
            i_b = names.index("blocks")
            prefix = names[:i_b]
            suffix = [n for n in names[i_b + 1:] if n != "block"]
            n_blocks = np.shape(leaf)[0]
            key0, is_w = flax_to_torch_key(tuple(list(prefix) + ["0"] + suffix))
            stack = []
            for i in range(n_blocks):
                key, _ = flax_to_torch_key(tuple(list(prefix) + [str(i)] + suffix))
                if key not in state_dict:
                    raise KeyError(f"torch key missing: {key} (for flax {'/'.join(names)})")
                stack.append(_to_flax(state_dict[key], np.shape(leaf)[1:], is_w))
                used.add(key)
            dt = leaf.dtype if hasattr(leaf, "dtype") else np.float32
            leaves.append(np.stack(stack, axis=0).astype(dt))
            continue
        key, is_w = flax_to_torch_key(names)
        if key not in state_dict:
            raise KeyError(f"torch key missing: {key} (for flax {'/'.join(names)})")
        used.add(key)
        val = _to_flax(state_dict[key], np.shape(leaf), is_w)
        dt = leaf.dtype if hasattr(leaf, "dtype") else np.float32
        leaves.append(val.astype(dt))
    return jax.tree_util.tree_unflatten(treedef, leaves)
