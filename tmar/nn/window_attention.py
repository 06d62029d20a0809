"""Flax WindowAttention module (scaled-cosine, SwinV2-style).

Parameter layout mirrors the reference (reference
models/generator/components/attention.py:38-61): fused qkv Dense, per-head
log-domain ``logit_scale`` initialised to ln(10), relative-position-bias table
trunc-normal(0.02), output projection Dense.  The attention math itself lives
in ``tmar.ops.attention`` (XLA path) with a Pallas fused kernel alternative.
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


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int]
    head_dim: Optional[int] = None
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

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
        B_, N, _ = x.shape
        head_dim = self.head_dim or self.dim // self.num_heads
        attn_dim = head_dim * self.num_heads

        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, float(np.log(10.0)), dtype=jnp.float32),
            (self.num_heads, 1, 1),
        )
        win_h, win_w = self.window_size
        table = self.param(
            "relative_position_bias_table",
            trunc_normal_init,
            ((2 * win_h - 1) * (2 * win_w - 1), self.num_heads),
            jnp.float32,
        )
        rel_idx = relative_position_index(win_h, win_w)

        qkv = nn.Dense(
            attn_dim * 3,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros,
            name="qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = split_heads(q, self.num_heads)
        k = split_heads(k, self.num_heads)
        v = split_heads(v, self.num_heads)

        bias = gather_rel_pos_bias(table, rel_idx, self.num_heads)
        out = cosine_window_attention(
            q, k, v, logit_scale, bias, mask=mask, mask_components=mask_components
        )
        if self.attn_drop > 0:
            out = nn.Dropout(self.attn_drop)(out, deterministic=deterministic)
        out = merge_heads(out)
        out = nn.Dense(
            self.dim,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(out)
        if self.proj_drop > 0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out
