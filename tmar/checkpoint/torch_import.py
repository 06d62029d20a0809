"""PyTorch ``.pth`` checkpoint import — torch state_dict → flax pytrees.

Required for parity validation against reference checkpoints (SURVEY.md §5.4;
BASELINE.md north-star: PSNR within 0.1 dB of the reference checkpoint).
Handles the reference's key layouts:

* wrapper prefixes: ``main.`` (the Generator wrapper, reference
  scripts/figure_generation/shared_config.py:121-132) and ``module.``
  (DataParallel);
* checkpoint dict keys ``netG_state_dict`` / ``generator_state_dict`` /
  ``state_dict`` / raw (reference shared_config.py:156-165);
* spectral-norm reparameterisation: ``weight_orig`` + ``weight_u`` /
  ``weight_v`` → our ``kernel`` + ``sn/{u,v}`` state.

Layout conversions: torch Linear [out, in] → flax kernel [in, out]; torch
Conv [out, in/g, kh, kw] → flax HWIO [kh, kw, in/g, out]; LayerNorm
weight/bias → scale/bias.

Tensors arrive as numpy (we accept torch tensors or numpy arrays).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor
    return t.detach().cpu().numpy()


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file into a flat {torch_key: numpy} dict (CPU, no grad)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    return {k: _to_np(v) for k, v in extract_state_dict(blob).items()}


def extract_state_dict(blob: Mapping[str, Any]) -> Mapping[str, Any]:
    """Pick the generator state_dict out of any reference checkpoint layout."""
    if not isinstance(blob, Mapping):
        raise TypeError(f"unexpected checkpoint type {type(blob)}")
    for key in ("netG_state_dict", "generator_state_dict", "state_dict"):
        if key in blob:
            return blob[key]
    return blob  # raw state_dict


def strip_prefixes(sd: Mapping[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        for prefix in ("module.", "main."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        out[k] = v
    return out


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _linear(tree, path, w, b=None):
    _set(tree, path + ("kernel",), np.ascontiguousarray(_to_np(w).T))
    if b is not None:
        _set(tree, path + ("bias",), _to_np(b))


def _conv(tree, path, w, b=None):
    _set(tree, path + ("kernel",), np.ascontiguousarray(_to_np(w).transpose(2, 3, 1, 0)))
    if b is not None:
        _set(tree, path + ("bias",), _to_np(b))


def _layernorm(tree, path, w, b):
    _set(tree, path + ("scale",), _to_np(w))
    _set(tree, path + ("bias",), _to_np(b))


_CONV_LEAVES = {
    "conv1",
    "unigram_embed",
    "merge",
    "depthwise",
    "before_shuffle",
    "to_origin",
}
_LINEAR_LEAVES = {"qkv", "proj", "fc1", "fc2", "reduction", "pointwise", "across_cascade_proj"}
_NORM_LEAVES = {"norm", "norm1", "norm2"}


def import_ngswin_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a reference NGswin state_dict to flax params for tmar NGswin."""
    sd = strip_prefixes(dict(state_dict))
    params: Dict[str, Any] = {}
    # group keys by module path
    grouped: Dict[str, Dict[str, Any]] = {}
    for k, v in sd.items():
        if k.endswith("relative_position_index") or k.endswith("attn_mask"):
            continue  # buffers, recomputed statically
        mod, leaf = k.rsplit(".", 1)
        grouped.setdefault(mod, {})[leaf] = v

    for mod, leaves in grouped.items():
        parts = mod.split(".")
        # rename torch list-module indices: blocks.3 -> blocks_3
        path = []
        skip = False
        i = 0
        while i < len(parts):
            p = parts[i]
            if p == "blocks" and i + 1 < len(parts) and parts[i + 1].isdigit():
                path.append(f"blocks_{parts[i+1]}")
                i += 2
                continue
            if p == "to_target":
                # reconstruction Sequential: to_target.before_shuffle etc.
                nxt = parts[i + 1]
                path.append(f"to_target_{nxt}")
                i += 2
                continue
            path.append(p)
            i += 1
        path = tuple(path)
        leaf_name = path[-1]

        if "logit_scale" in leaves or "relative_position_bias_table" in leaves:
            # WindowAttention container holds direct params
            if "logit_scale" in leaves:
                _set(params, path + ("logit_scale",), _to_np(leaves["logit_scale"]))
            if "relative_position_bias_table" in leaves:
                _set(
                    params,
                    path + ("relative_position_bias_table",),
                    _to_np(leaves["relative_position_bias_table"]),
                )
            continue
        w = leaves.get("weight")
        b = leaves.get("bias")
        if w is None:
            continue
        w_np = _to_np(w)
        if leaf_name in _CONV_LEAVES or (w_np.ndim == 4):
            _conv(params, path, w, b)
        elif leaf_name in _NORM_LEAVES or w_np.ndim == 1:
            _layernorm(params, path, w, b)
        else:
            _linear(params, path, w, b)
    return params


def import_discriminator_state_dict(state_dict: Mapping[str, Any]):
    """Convert a reference MultiScaleDiscriminator state_dict.

    Returns (params, sn_state) flax collections.  Torch spectral_norm stores
    ``weight_orig``, ``weight_u``, ``weight_v`` per conv
    (reference ms_patchgan.py:42-58).
    """
    sd = strip_prefixes(dict(state_dict))
    params: Dict[str, Any] = {}
    sn: Dict[str, Any] = {}
    grouped: Dict[str, Dict[str, Any]] = {}
    for k, v in sd.items():
        mod, leaf = k.rsplit(".", 1)
        grouped.setdefault(mod, {})[leaf] = v

    for mod, leaves in grouped.items():
        parts = mod.split(".")
        path = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if p in ("discriminators", "convs") and i + 1 < len(parts) and parts[i + 1].isdigit():
                if p == "discriminators":
                    path.append(f"discriminators_{parts[i+1]}")
                else:
                    path.append(f"conv_{parts[i+1]}")
                i += 2
                continue
            path.append(p)
            i += 1
        path = tuple(path)

        if "weight_orig" in leaves:  # spectral-normalised conv
            _conv(params, path, leaves["weight_orig"], leaves.get("bias"))
            if "weight_u" in leaves:
                _set(sn, path + ("u",), _to_np(leaves["weight_u"]))
            if "weight_v" in leaves:
                _set(sn, path + ("v",), _to_np(leaves["weight_v"]))
        elif "weight" in leaves:
            w_np = _to_np(leaves["weight"])
            if w_np.ndim == 4:
                _conv(params, path, leaves["weight"], leaves.get("bias"))
            elif w_np.ndim == 2:
                _linear(params, path, leaves["weight"], leaves.get("bias"))
            else:
                _layernorm(params, path, leaves["weight"], leaves.get("bias"))
    return params, sn
