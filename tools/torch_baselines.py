"""Pure-torch mirrors of the tmar baseline restorers + weight converters.

These re-state ``tmar.nn.baselines.RedCNN`` / ``DenoisingTransformer``
(themselves NHWC re-designs of the reference
models/baseline/alternative_architectures.py:9-67) as NCHW torch modules,
so a tmar-finetuned parameter pickle can run OUT-OF-PROCESS as a real
torch consumer of the comparison harness's ×255 / sparse-view protocols
(VERDICT r4 next #6; reference per-model loaders:
evaluation/benchmark_comparison_syndeeplesion.py:553-875).

jax-free on purpose: the adapter subprocess must not touch the TPU tunnel.
Converters take the plain numpy pytree that ``tmar-finetune`` pickles.

Parity: tests/test_torch_baselines.py asserts the torch forward matches
the flax forward element-wise on random weights (the same evidence class
as the NGswin importer/exporter round-trip).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.array(a, np.float32))  # copy: torch needs writable


def _conv_w(k) -> torch.Tensor:
    """flax Conv kernel [kh, kw, in, out] -> torch Conv2d [out, in, kh, kw]."""
    return _t(k).permute(3, 2, 0, 1).contiguous()


def _deconv_w(k) -> torch.Tensor:
    """flax ConvTranspose kernel [kh, kw, in, out] -> torch ConvTranspose2d
    [in, out, kh, kw].  flax's conv_transpose correlates the dilated input
    with the UNflipped kernel while torch's is conv's gradient (flipped),
    so the spatial axes flip in the mapping."""
    return _t(np.asarray(k)[::-1, ::-1].copy()).permute(2, 3, 0, 1).contiguous()


class TorchRedCNN(nn.Module):
    """NCHW mirror of tmar.nn.baselines.RedCNN (5 VALID convs + 5 VALID
    deconvs, residuals after conv2/conv4 and at the input)."""

    def __init__(self, features: int = 96, in_chans: int = 1):
        super().__init__()
        f = features
        self.conv1 = nn.Conv2d(in_chans, f, 5)
        self.conv2 = nn.Conv2d(f, f, 5)
        self.conv3 = nn.Conv2d(f, f, 5)
        self.conv4 = nn.Conv2d(f, f, 5)
        self.conv5 = nn.Conv2d(f, f, 5)
        self.deconv1 = nn.ConvTranspose2d(f, f, 5)
        self.deconv2 = nn.ConvTranspose2d(f, f, 5)
        self.deconv3 = nn.ConvTranspose2d(f, f, 5)
        self.deconv4 = nn.ConvTranspose2d(f, f, 5)
        self.deconv5 = nn.ConvTranspose2d(f, in_chans, 5)

    def forward(self, x):
        r0 = x
        h = F.relu(self.conv1(x))
        h = F.relu(self.conv2(h))
        r1 = h
        h = F.relu(self.conv3(h))
        h = F.relu(self.conv4(h))
        r2 = h
        h = F.relu(self.conv5(h))
        h = F.relu(self.deconv1(h) + r2)
        h = F.relu(self.deconv2(h))
        h = F.relu(self.deconv3(h) + r1)
        h = F.relu(self.deconv4(h))
        return F.relu(self.deconv5(h) + r0)


def redcnn_state_dict(params) -> dict:
    sd = {}
    for i in range(1, 6):
        p = params[f"conv{i}"]
        sd[f"conv{i}.weight"] = _conv_w(p["kernel"])
        sd[f"conv{i}.bias"] = _t(p["bias"])
    for i in range(1, 6):
        p = params[f"deconv{i}"]
        sd[f"deconv{i}.weight"] = _deconv_w(p["kernel"])
        sd[f"deconv{i}.bias"] = _t(p["bias"])
    return sd


class TorchDenoisingTransformer(nn.Module):
    """NCHW mirror of tmar.nn.baselines.DenoisingTransformer (patchify
    conv, learned 2-D pos embed, pre-LN MHA/MLP blocks, ConvTranspose up,
    3x3 out conv, global residual).

    The flax module's pos_embed is sized by the TRAINING grid; this mirror
    bilinearly interpolates it to the eval grid (the reference
    DenoisingTransformer does the same, alternative_architectures.py:56),
    so full slices run even when fine-tuning used small patches.  Parity
    with flax holds exactly on the training grid.
    """

    def __init__(self, dim: int = 128, depth: int = 4, num_heads: int = 4,
                 patch: int = 8, in_chans: int = 1):
        super().__init__()
        self.dim, self.depth, self.heads, self.patch = dim, depth, num_heads, patch
        self.proj = nn.Conv2d(in_chans, dim, patch, stride=patch)
        self.pos = nn.Parameter(torch.zeros(1, dim, 8, 8))  # resized in load
        # flax nn.LayerNorm default epsilon is 1e-6 (torch's is 1e-5)
        self.norm1 = nn.ModuleList([nn.LayerNorm(dim, eps=1e-6) for _ in range(depth)])
        self.norm2 = nn.ModuleList([nn.LayerNorm(dim, eps=1e-6) for _ in range(depth)])
        self.qkv = nn.ModuleList([nn.Linear(dim, 3 * dim) for _ in range(depth)])
        self.attn_out = nn.ModuleList([nn.Linear(dim, dim) for _ in range(depth)])
        self.mlp1 = nn.ModuleList([nn.Linear(dim, dim * 4) for _ in range(depth)])
        self.mlp2 = nn.ModuleList([nn.Linear(dim * 4, dim) for _ in range(depth)])
        self.up = nn.ConvTranspose2d(dim, dim // 2, patch, stride=patch)
        self.out = nn.Conv2d(dim // 2, in_chans, 3, padding=1)

    def forward(self, x):
        b = x.shape[0]
        h = self.proj(x)                                   # [B, dim, hh, ww]
        hh, ww = h.shape[2], h.shape[3]
        pos = self.pos
        if pos.shape[2:] != (hh, ww):
            pos = F.interpolate(pos, size=(hh, ww), mode="bilinear",
                                align_corners=False)
        tokens = (h + pos).flatten(2).transpose(1, 2)      # [B, L, dim]
        hd = self.dim // self.heads
        for i in range(self.depth):
            y = self.norm1[i](tokens)
            q, k, v = self.qkv[i](y).chunk(3, dim=-1)
            q = q.view(b, -1, self.heads, hd).transpose(1, 2)
            k = k.view(b, -1, self.heads, hd).transpose(1, 2)
            v = v.view(b, -1, self.heads, hd).transpose(1, 2)
            a = torch.softmax(q @ k.transpose(-2, -1) / hd ** 0.5, dim=-1)
            y = (a @ v).transpose(1, 2).reshape(b, -1, self.dim)
            tokens = tokens + self.attn_out[i](y)
            y = self.norm2[i](tokens)
            y = F.gelu(self.mlp1[i](y), approximate="tanh")
            y = self.mlp2[i](y)
            tokens = tokens + y
        h = tokens.transpose(1, 2).view(b, self.dim, hh, ww)
        h = F.relu(self.up(h))
        return self.out(h) + x


def transformer_state_dict(params, model: TorchDenoisingTransformer) -> dict:
    dim = model.dim
    sd = {
        "proj.weight": _conv_w(params["proj"]["kernel"]),
        "proj.bias": _t(params["proj"]["bias"]),
        # flax pos_embed [1, hh, ww, dim] -> torch [1, dim, hh, ww]
        "pos": _t(params["pos_embed"]).permute(0, 3, 1, 2).contiguous(),
        "up.weight": _deconv_w(params["up"]["kernel"]),
        "up.bias": _t(params["up"]["bias"]),
        "out.weight": _conv_w(params["out"]["kernel"]),
        "out.bias": _t(params["out"]["bias"]),
    }
    for i in range(model.depth):
        a = params[f"attn_{i}"]
        # flax DenseGeneral kernels [dim, heads, hd] -> [dim, dim]; torch
        # Linear stores [out, in] so transpose; MHA applies q/k/v jointly
        wq, wk, wv = (np.asarray(a[n]["kernel"]).reshape(dim, dim)
                      for n in ("query", "key", "value"))
        bq, bk, bv = (np.asarray(a[n]["bias"]).reshape(dim)
                      for n in ("query", "key", "value"))
        sd[f"qkv.{i}.weight"] = _t(np.concatenate([wq.T, wk.T, wv.T], 0))
        sd[f"qkv.{i}.bias"] = _t(np.concatenate([bq, bk, bv]))
        sd[f"attn_out.{i}.weight"] = _t(
            np.asarray(a["out"]["kernel"]).reshape(dim, dim).T
        )
        sd[f"attn_out.{i}.bias"] = _t(a["out"]["bias"])
        for tgt, src in ((f"norm1.{i}", f"norm1_{i}"), (f"norm2.{i}", f"norm2_{i}")):
            sd[f"{tgt}.weight"] = _t(params[src]["scale"])
            sd[f"{tgt}.bias"] = _t(params[src]["bias"])
        for tgt, src in ((f"mlp1.{i}", f"mlp1_{i}"), (f"mlp2.{i}", f"mlp2_{i}")):
            sd[f"{tgt}.weight"] = _t(np.asarray(params[src]["kernel"]).T)
            sd[f"{tgt}.bias"] = _t(params[src]["bias"])
    return sd


def load_baseline(arch: str, params) -> nn.Module:
    """Build + load a torch mirror from a tmar-finetune numpy param tree."""
    if arch == "redcnn":
        f = int(np.asarray(params["conv1"]["kernel"]).shape[-1])
        model = TorchRedCNN(features=f)
        model.load_state_dict(redcnn_state_dict(params))
    elif arch == "transformer":
        dim = int(np.asarray(params["proj"]["kernel"]).shape[-1])
        patch = int(np.asarray(params["proj"]["kernel"]).shape[0])
        depth = len([k for k in params if k.startswith("attn_")])
        pos = np.asarray(params["pos_embed"])
        model = TorchDenoisingTransformer(dim=dim, depth=depth, patch=patch)
        model.pos = nn.Parameter(torch.zeros(1, dim, pos.shape[1], pos.shape[2]))
        model.load_state_dict(transformer_state_dict(params, model))
    else:
        raise ValueError(f"unknown arch {arch!r}")
    model.eval()
    return model
