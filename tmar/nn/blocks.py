"""NSTB — the N-Gram Swin Transformer Block.

Faithful to reference models/generator/components/transformer_blocks.py:11-120,
including its two idiosyncrasies:

* **post-norm residual order**: ``x + DropPath(norm1(attn(x)))`` then
  ``x + DropPath(norm2(mlp(x)))`` — LayerNorm *after* the sublayer
  (transformer_blocks.py:117-119), unlike standard (pre-norm) Swin.
* the block returns ``(x_in, x_out)`` so stages can apply the within-stage
  residual ``next_input = out + prev_input`` (encoder_decoder.py:138-141).

The SW-MSA shift mask is built at trace time from the static patch grid, so
train/eval shape buckets each get their correct constant-folded mask
(the reference rebuilds eval masks dynamically, transformer_blocks.py:97-101).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tmar.nn.layers import DropPath, Mlp, layer_norm
from tmar.nn.ngram import NGramWindowPartition
from tmar.nn.window_attention import WindowAttention
from tmar.ops.window import (
    reverse_cyclic_shift,
    shift_mask_components,
    window_unpartition,
)


class _LNParams(nn.Module):
    """LayerNorm scale/bias with nn.LayerNorm's param names."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return scale, bias


class _MlpParams(nn.Module):
    """fc1/fc2 kernels+biases with tmar.nn.layers.Mlp's param tree."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        from tmar.nn.window_attention import _DenseParams

        w1, b1 = _DenseParams(self.hidden, name="fc1")(self.dim)
        w2, b2 = _DenseParams(self.dim, name="fc2")(self.hidden)
        return (w1, b1), (w2, b2)


class _AttnParams(nn.Module):
    """WindowAttention's exact param tree (logit_scale, RPB table, qkv,
    proj), returned raw for the fused NSTB kernel."""

    dim: int
    num_heads: int
    window_size: int
    head_dim: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        from tmar.nn.window_attention import declare_attention_params

        attn_dim = self.head_dim * self.num_heads
        ws = self.window_size
        return declare_attention_params(
            self, self.dim, self.dim, attn_dim, self.num_heads, (ws, ws),
            self.qkv_bias,
        )


class NSTB(nn.Module):
    dim: int
    ngram: int
    num_heads: int
    window_size: int
    shift_size: int
    head_dim: Optional[int] = None
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False
    xla_window_merge: bool = False
    # "auto" (XLA math under grad) | "pallas" (fused bwd kernel) |
    # "xla" (pallas fwd + recompute-VJP); pallas fwd+bwd measured
    # fastest for training after the r2 kernel fixes (PERF.md)
    attn_backward: str = "auto"

    @nn.compact
    def __call__(self, x, num_patches: Tuple[int, int], deterministic: bool = True):
        """x: [B, ph*pw, D]; num_patches static (ph, pw).

        Returns (x_in, x_out) for the within-stage residual.
        """
        assert 0 <= self.shift_size < self.window_size
        ph, pw = num_patches
        B, p, D = x.shape
        assert p == ph * pw, "token count does not match patch grid"

        x_in = x
        if (
            self.use_pallas
            and self.drop_path == 0.0
            and self.drop == 0.0
            and self.attn_drop == 0.0
            # the whole-NSTB fused op computes its primal via the XLA math
            # whenever it is differentiated, so with attn_backward="pallas"
            # (training on the attention-level pallas fwd+bwd kernels) the
            # block-level fusion must stand aside
            and self.attn_backward != "pallas"
        ):
            import os

            if os.environ.get("TMAR_NSTB_FUSED", "1") != "0":
                return x_in, self._fused(x, num_patches, deterministic)

        attn_out = self._attention(x, num_patches, deterministic)

        if self.use_pallas and self.drop_path == 0.0 and self.drop == 0.0:
            # fused post-norm residual FFN (tmar.ops.pallas_ffn) — same
            # parameter tree as the separate norm/Mlp modules below
            import jax as _jax

            from tmar.ops.pallas_ffn import fused_residual_ffn

            interpret = self.pallas_interpret or _jax.default_backend() == "cpu"
            hidden = int(self.dim * self.mlp_ratio)
            g1 = _LNParams(self.dim, name="norm1")()
            ffn = _MlpParams(self.dim, hidden, name="ffn")
            (w1, bw1), (w2, bw2) = ffn()
            g2 = _LNParams(self.dim, name="norm2")()
            z = fused_residual_ffn(
                x.reshape(B * p, D).astype(self.dtype),
                attn_out.reshape(B * p, D).astype(self.dtype),
                g1[0], g1[1],
                w1.astype(self.dtype), bw1,
                w2.astype(self.dtype), bw2,
                g2[0], g2[1],
                interpret=interpret,
                # training on the pallas kernels: keep the pallas forward as
                # the primal and run the fused recompute backward (one kernel
                # for all ten cotangents instead of the ~10-kernel XLA chain)
                backward="pallas" if self.attn_backward == "pallas" else None,
            )
            return x_in, z.reshape(B, p, D)

        x = x + DropPath(self.drop_path)(
            layer_norm(self.dtype, name="norm1")(attn_out), deterministic
        )
        ffn_out = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            drop=self.drop,
            dtype=self.dtype,
            name="ffn",
        )(x, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(
            layer_norm(self.dtype, name="norm2")(ffn_out), deterministic
        )
        return x_in, x

    def _fused(self, x, num_patches, deterministic):
        """One Pallas call for the whole block (tmar.ops.pallas_nstb):
        quadrant context add + window attention + post-norm residual FFN.
        Same parameter tree as the unfused path; equivalence-tested."""
        import jax as _jax

        from tmar.ops.pallas_nstb import (
            context_quads,
            fused_nstb,
            quadrant_selector,
        )

        ph, pw = num_patches
        B, p, D = x.shape
        ws = self.window_size
        head_dim = self.head_dim or self.dim // self.num_heads
        interpret = self.pallas_interpret or _jax.default_backend() == "cpu"

        import os

        use_map = os.environ.get("TMAR_NSTB_MAP", "1") != "0"

        xg = x.reshape(B, ph, pw, D)
        windows, (wh, ww), ctx = NGramWindowPartition(
            dim=self.dim,
            window_size=ws,
            ngram=self.ngram,
            ngram_num_heads=self.num_heads,
            shift_size=self.shift_size,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pallas_interpret=self.pallas_interpret,
            xla_window_merge=self.xla_window_merge,
            attn_backward=self.attn_backward,
            return_context="map" if use_map else True,
            name="ngram_window_partition",
        )(xg, deterministic=deterministic)
        # map mode: ``windows`` is the rolled [B, ph, pw, D] map itself

        if not use_map:
            tokens = windows.reshape(-1, ws * ws, D).astype(self.dtype)
        if use_map and self.shift_size == 0:
            # unshifted map blocks: every token reads its OWN window's
            # context — a 1-slot cq (no host-side 4x quad broadcast)
            cq = ctx.reshape(-1, 1, D)
            sel = np.ones((ws * ws, 1), np.float32)
        else:
            cq = context_quads(ctx, self.shift_size).reshape(-1, 4, D)
            sel = quadrant_selector(ws, self.shift_size)

        mask_components = None
        if self.shift_size > 0:
            m_row, m_col = shift_mask_components(ws, self.shift_size)
            mask_components = (m_row, m_col, wh, ww)

        wqkv, bqkv, logit_scale, bias, wproj, bproj = _AttnParams(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=ws,
            head_dim=head_dim,
            qkv_bias=self.qkv_bias,
            name="attn",
        )()
        g1 = _LNParams(self.dim, name="norm1")()
        hidden = int(self.dim * self.mlp_ratio)
        (w1, bw1), (w2, bw2) = _MlpParams(self.dim, hidden, name="ffn")()
        g2 = _LNParams(self.dim, name="norm2")()

        common = dict(
            num_heads=self.num_heads,
            mask_components=mask_components,
            interpret=interpret,
        )
        args = (
            cq.astype(self.dtype),
            sel,
            wqkv.astype(self.dtype),
            None if bqkv is None else bqkv.astype(self.dtype),
            logit_scale,
            bias,
            wproj.astype(self.dtype),
            None if bproj is None else bproj.astype(self.dtype),
            g1,
            (w1.astype(self.dtype), bw1),
            (w2.astype(self.dtype), bw2),
            g2,
        )

        if use_map:
            from tmar.ops.pallas_nstb import fused_nstb_map

            zmap = fused_nstb_map(
                windows.astype(self.dtype), *args, window_size=ws,
                shift=self.shift_size, **common
            )
            out = reverse_cyclic_shift(zmap, self.shift_size)
            return out.reshape(B, ph * pw, D)

        z = fused_nstb(tokens, *args, **common)
        z = z.reshape(-1, ws, ws, D)
        shifted = window_unpartition(z, (wh, ww))
        out = reverse_cyclic_shift(shifted, self.shift_size)
        return out.reshape(B, ph * pw, D)

    def _attention(self, x, num_patches, deterministic):
        ph, pw = num_patches
        B, p, D = x.shape
        ws = self.window_size
        x = x.reshape(B, ph, pw, D)

        windows, (wh, ww) = NGramWindowPartition(
            dim=self.dim,
            window_size=ws,
            ngram=self.ngram,
            ngram_num_heads=self.num_heads,
            shift_size=self.shift_size,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pallas_interpret=self.pallas_interpret,
            xla_window_merge=self.xla_window_merge,
            attn_backward=self.attn_backward,
            name="ngram_window_partition",
        )(x, deterministic=deterministic)

        tokens = windows.reshape(-1, ws * ws, D)
        mask_components = None
        if self.shift_size > 0:
            m_row, m_col = shift_mask_components(ws, self.shift_size)
            mask_components = (m_row, m_col, wh, ww)

        attn_windows = WindowAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=(ws, ws),
            head_dim=self.head_dim,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pallas_interpret=self.pallas_interpret,
            xla_window_merge=self.xla_window_merge,
            attn_backward=self.attn_backward,
            name="attn",
        )(tokens, mask_components=mask_components, deterministic=deterministic)

        attn_windows = attn_windows.reshape(-1, ws, ws, D)
        shifted = window_unpartition(attn_windows, (wh, ww))
        out = reverse_cyclic_shift(shifted, self.shift_size)
        return out.reshape(B, ph * pw, D)
