"""Flax WindowAttention module (scaled-cosine, SwinV2-style).

Parameter layout mirrors the reference (reference
models/generator/components/attention.py:38-61): fused qkv Dense, per-head
log-domain ``logit_scale`` initialised to ln(10), relative-position-bias table
trunc-normal(0.02), output projection Dense.  The attention math lives in
``tmar.ops.attention`` (XLA path); setting ``use_pallas=True`` routes through
the fused VMEM-resident Pallas kernel (``tmar.ops.pallas_attention``) which
never materialises the [B_, nh, N, N] score tensor in HBM — the dominant
memory traffic of the XLA path.  Both paths share the same parameters.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tmar.nn.layers import trunc_normal_init
from tmar.ops.attention import (
    cosine_window_attention,
    gather_rel_pos_bias,
    merge_heads,
    relative_position_index,
    split_heads,
)


class _DenseParams(nn.Module):
    """Declares kernel/bias with nn.Dense's exact param layout and names,
    but hands the raw arrays back so fused kernels can consume them."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", trunc_normal_init, (in_features, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return kernel, bias


def declare_attention_params(
    mod, in_dim, out_dim, attn_dim, num_heads, window_size, qkv_bias
):
    """Declare WindowAttention's exact param tree on ``mod`` (a module in
    compact context) and return the raw arrays + gathered RPB bias —
    single source of truth for both WindowAttention and the fused-NSTB
    path's params-only module (tmar.nn.blocks._AttnParams).

    Returns (wqkv, bqkv, logit_scale, bias, wproj, bproj)."""
    win_h, win_w = window_size
    logit_scale = mod.param(
        "logit_scale",
        lambda key, shape: jnp.full(shape, float(np.log(10.0)), dtype=jnp.float32),
        (num_heads, 1, 1),
    )
    table = mod.param(
        "relative_position_bias_table",
        trunc_normal_init,
        ((2 * win_h - 1) * (2 * win_w - 1), num_heads),
        jnp.float32,
    )
    rel_idx = relative_position_index(win_h, win_w)
    bias = gather_rel_pos_bias(table, rel_idx, num_heads)
    wqkv, bqkv = _DenseParams(attn_dim * 3, use_bias=qkv_bias, name="qkv")(in_dim)
    wproj, bproj = _DenseParams(out_dim, name="proj")(attn_dim)
    return wqkv, bqkv, logit_scale, bias, wproj, bproj


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int]
    head_dim: Optional[int] = None
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False
    xla_window_merge: bool = False
    # "auto" (XLA math under grad) | "pallas" (fused bwd kernel) |
    # "xla" (pallas fwd + recompute-VJP); pallas fwd+bwd measured
    # fastest for training after the r2 kernel fixes (PERF.md)
    attn_backward: str = "auto"

    @nn.compact
    def __call__(
        self,
        x,
        mask: Optional[jnp.ndarray] = None,
        mask_components: Optional[tuple] = None,
        deterministic: bool = True,
    ):
        """x: [B_, N, D] windows; mask: optional [nW, N, N] additive mask, or
        decomposed ``mask_components`` (see tmar.ops.attention)."""
        B_, N, in_dim = x.shape
        head_dim = self.head_dim or self.dim // self.num_heads
        attn_dim = head_dim * self.num_heads

        wqkv, bqkv, logit_scale, bias, wproj, bproj = declare_attention_params(
            self, in_dim, self.dim, attn_dim, self.num_heads,
            self.window_size, self.qkv_bias,
        )

        if self.use_pallas:
            assert self.attn_drop == 0.0 and self.proj_drop == 0.0, (
                "fused pallas attention does not implement dropout"
            )
            assert mask is None, "fused kernel takes mask_components, not a full mask"
            import jax

            from tmar.ops.pallas_attention import fused_window_attention

            interpret = self.pallas_interpret or jax.default_backend() == "cpu"
            return fused_window_attention(
                x.astype(self.dtype),
                wqkv.astype(self.dtype),
                None if bqkv is None else bqkv.astype(self.dtype),
                logit_scale,
                bias,
                wproj.astype(self.dtype),
                jnp.zeros((self.dim,), self.dtype) if bproj is None else bproj.astype(self.dtype),
                self.num_heads,
                mask_components=mask_components,
                interpret=interpret,
                backward=None if self.attn_backward == "auto" else self.attn_backward,
            )

        # ---------------- XLA path (identical math) -------------------------
        if (
            self.xla_window_merge
            and mask is None
            and self.attn_drop == 0
            and self.proj_drop == 0
            and 128 // N > 1
        ):
            # merge windows so score minors hit the 128-lane tile exactly
            # (avoids the 2x lane-padding tax; see merged_window_attention_math)
            from tmar.ops.attention import merged_window_attention_math

            return merged_window_attention_math(
                x.astype(self.dtype),
                wqkv.astype(self.dtype),
                None if bqkv is None else bqkv.astype(self.dtype),
                logit_scale,
                bias,
                wproj.astype(self.dtype),
                None if bproj is None else bproj.astype(self.dtype),
                self.num_heads,
                merge_windows=128 // N,
                mask_components=mask_components,
            )

        if mask is None and self.attn_drop == 0 and self.proj_drop == 0:
            from tmar.ops.attention import window_attention_math

            return window_attention_math(
                x.astype(self.dtype),
                wqkv.astype(self.dtype),
                None if bqkv is None else bqkv.astype(self.dtype),
                logit_scale,
                bias,
                wproj.astype(self.dtype),
                None if bproj is None else bproj.astype(self.dtype),
                self.num_heads,
                mask_components=mask_components,
            )

        qkv = x.astype(self.dtype) @ wqkv.astype(self.dtype)
        if bqkv is not None:
            qkv = qkv + bqkv.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = split_heads(q, self.num_heads)
        k = split_heads(k, self.num_heads)
        v = split_heads(v, self.num_heads)

        out = cosine_window_attention(
            q, k, v, logit_scale, bias, mask=mask, mask_components=mask_components
        )
        if self.attn_drop > 0:
            out = nn.Dropout(self.attn_drop)(out, deterministic=deterministic)
        out = merge_heads(out)
        out = out @ wproj.astype(self.dtype)
        if bproj is not None:
            out = out + bproj.astype(self.dtype)
        if self.proj_drop > 0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out
