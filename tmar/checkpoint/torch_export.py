"""Flax → PyTorch ``state_dict`` export — the exact inverse of
``tmar.checkpoint.torch_import``.

Lets a TRAINED tmar checkpoint run inside the *reference* torch NGswin
(loaded via the tests/torch_ref.py shim), which closes the BASELINE.md
north-star end-to-end: the same weights through both frameworks must agree
within 0.1 dB on the comparison protocol (reference harness:
evaluation/benchmark_comparison_syndeeplesion.py:317-547 loads each entry
as its own torch process; ours enters through
``tools/adapter_torch_ngswin.py`` + ``tmar.eval.adapters.SubprocessAdapter``).

Key mapping is the importer's, reversed:

* flax module names → torch list-module indices: ``blocks_3`` → ``blocks.3``,
  ``to_target_before_shuffle`` → ``to_target.before_shuffle``;
* flax Linear kernel [in, out] → torch weight [out, in]; flax HWIO conv
  kernel → torch [out, in/g, kh, kw]; LayerNorm scale/bias → weight/bias;
* ``logit_scale`` / ``relative_position_bias_table`` pass through.

Buffers the importer skips (``relative_position_index``, ``attn_mask``) are
not emitted — load with ``strict=False`` (they are recomputed from the
constructor's geometry and never trained).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _flatten(tree: Mapping[str, Any], path=()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _flatten(v, path + (k,))
        else:
            yield path + (k,), np.asarray(v)


def _torch_module_path(parts) -> str:
    out = []
    for p in parts:
        if p.startswith("blocks_") and p[len("blocks_"):].isdigit():
            out += ["blocks", p[len("blocks_"):]]
        elif p.startswith("to_target_"):
            out += ["to_target", p[len("to_target_"):]]
        else:
            out.append(p)
    return ".".join(out)


def export_ngswin_state_dict(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Convert tmar NGswin flax params to a reference-layout torch state_dict
    (numpy values; wrap with ``torch.from_numpy`` or pass to ``save_pth``)."""
    sd: Dict[str, np.ndarray] = {}
    for path, v in _flatten(params):
        mod = _torch_module_path(path[:-1])
        leaf = path[-1]
        v = np.asarray(v, np.float32)
        if leaf == "kernel":
            if v.ndim == 4:  # HWIO -> OIHW
                sd[f"{mod}.weight"] = np.ascontiguousarray(v.transpose(3, 2, 0, 1))
            else:            # [in, out] -> [out, in]
                sd[f"{mod}.weight"] = np.ascontiguousarray(v.T)
        elif leaf == "scale":
            sd[f"{mod}.weight"] = np.ascontiguousarray(v)
        elif leaf == "bias":
            sd[f"{mod}.bias"] = np.ascontiguousarray(v)
        elif leaf in ("logit_scale", "relative_position_bias_table"):
            sd[f"{mod}.{leaf}"] = np.ascontiguousarray(v)
        else:
            raise ValueError(f"unmapped flax leaf {'.'.join(path)!r}")
    return sd


def save_pth(params: Mapping[str, Any], path: str) -> None:
    """Write flax NGswin params as a reference-loadable ``.pth`` checkpoint
    (``{"netG_state_dict": ...}`` — the layout extract_state_dict picks up,
    so the file also round-trips through our own importer)."""
    import torch

    # np.copy: flax leaves can be non-writable views, which torch refuses
    sd = {
        k: torch.from_numpy(np.copy(v))
        for k, v in export_ngswin_state_dict(params).items()
    }
    torch.save({"netG_state_dict": sd}, path)
