"""N-Gram context modules (the NGswin paper's novelty).

Faithful re-expression of reference
models/generator/components/window_utils.py:13-153 in NHWC / flax:

* ``NGramContext``: per-window unigram embedding (grouped conv, kernel =
  stride = window), sequence-reflective padding forward & backward, sliding
  n×n window attention at dim/2, token-mean (== the reference's unpartition +
  avg-pool), concat of both directions, 1×1 conv merge.
* ``NGramWindowPartition``: adds the per-window context to every window
  (before the cyclic shift), then applies the SW-MSA shift.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tmar.nn.layers import conv_normal_init
from tmar.nn.window_attention import WindowAttention
from tmar.ops.ngram import seq_refl_win_pad, sliding_patches
from tmar.ops.window import cyclic_shift, window_partition


class _GroupedConvParams(nn.Module):
    """Conv kernel/bias params with flax nn.Conv's layout and names
    ([kh, kw, in_per_group, out]), consumed by the dense-expansion path."""

    features: int
    kernel_size: tuple
    in_per_group: int

    @nn.compact
    def __call__(self):
        from tmar.nn.layers import conv_normal_init

        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", conv_normal_init, (kh, kw, self.in_per_group, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class _NGAttnParams(nn.Module):
    """WindowAttention's exact param tree for the n-gram sliding attention,
    returned raw for the fused context kernel (tmar.ops.pallas_ngram)."""

    dim: int
    num_heads: int
    ngram: int

    @nn.compact
    def __call__(self):
        from tmar.nn.window_attention import declare_attention_params

        head_dim = self.dim // self.num_heads
        attn_dim = head_dim * self.num_heads
        return declare_attention_params(
            self, self.dim, self.dim, attn_dim, self.num_heads,
            (self.ngram, self.ngram), True,
        )


class _ConvParams(nn.Module):
    """nn.Conv's kernel/bias params (layout + names), returned raw."""

    features: int
    in_features: int
    kernel_size: tuple

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", conv_normal_init,
            (kh, kw, self.in_features, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class NGramContext(nn.Module):
    dim: int
    window_size: int
    ngram: int
    ngram_num_heads: int
    padding_mode: str = "seq_refl_win_pad"
    dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False
    xla_window_merge: bool = False
    # "auto" (XLA math under grad) | "pallas" (fused bwd kernel) |
    # "xla" (pallas fwd + recompute-VJP); pallas fwd+bwd measured
    # fastest for training after the r2 kernel fixes (PERF.md)
    attn_backward: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: [B, ph, pw, D] -> context [B, wh, ww, D]."""
        assert self.padding_mode in ("seq_refl_win_pad", "zero_pad")
        half = self.dim // 2
        # Grouped conv (dim -> dim/2, groups=dim/2, kernel=stride=window;
        # reference window_utils.py:36-38) executed as an equivalent DENSE
        # conv: XLA's grouped-conv lowering on TPU is ~2x slower than a dense
        # conv even at 32x the MACs (PERF.md), so the [k,k,2,half] grouped
        # kernel (param layout unchanged -> checkpoint-compatible) is
        # expanded at trace time into a block-diagonal [k,k,D,half] kernel.
        ws = self.window_size
        in_ch = x.shape[-1]
        group_in = in_ch // half
        # keep flax Conv's param naming: unigram_embed/{kernel,bias}
        kernel, bias = _GroupedConvParams(
            half, (ws, ws), group_in, name="unigram_embed"
        )()
        onehot = np.zeros((in_ch, group_in, half), np.float32)
        for c in range(half):
            for t in range(group_in):
                onehot[group_in * c + t, t, c] = 1.0
        dense_kernel = jnp.einsum(
            "ijtc,dtc->ijdc", kernel, jnp.asarray(onehot)
        ).astype(self.dtype)
        unigram = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            dense_kernel,
            window_strides=(ws, ws),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(self.dtype)  # [B, wh, ww, D/2]

        import os

        import jax as _jax

        wh, ww = unigram.shape[1], unigram.shape[2]
        # megakernel default: ON on real hardware (on-chip validated, A/B
        # 16.78 -> 19.89 slices/s at 512² b8), OFF in interpret mode (CPU),
        # where the grid-loop interpreter makes it pathologically slow —
        # TMAR_NGRAM_FUSED=0/1 overrides either way.
        _interp = self.pallas_interpret or _jax.default_backend() == "cpu"
        _fused_default = "0" if _interp else "1"
        if (
            self.ngram == 2
            and self.use_pallas
            and self.padding_mode == "seq_refl_win_pad"
            and wh >= 2
            and ww >= 2
            and os.environ.get("TMAR_NGRAM_FUSED", _fused_default) != "0"
        ):
            # megakernel: both directional sliding attentions + means +
            # merge conv in ONE Pallas call (tmar.ops.pallas_ngram); the
            # custom VJP keeps training on the composition path
            from tmar.ops.pallas_ngram import fused_ngram_context

            wqkv, bqkv, logit_scale, rpb, wproj, bproj = _NGAttnParams(
                dim=half, num_heads=self.ngram_num_heads, ngram=self.ngram,
                name="ngram_attn",
            )()
            mk, mb = _ConvParams(
                features=self.dim, in_features=2 * half, kernel_size=(1, 1),
                name="merge",
            )()
            interpret = self.pallas_interpret or _jax.default_backend() == "cpu"
            return fused_ngram_context(
                unigram,
                wqkv.astype(self.dtype),
                None if bqkv is None else bqkv.astype(self.dtype),
                logit_scale, rpb,
                wproj.astype(self.dtype),
                None if bproj is None else bproj.astype(self.dtype),
                mk.reshape(2 * half, self.dim).astype(self.dtype),
                mb,
                self.ngram_num_heads,
                use_pallas_attn=self.use_pallas,
                attn_backward=self.attn_backward,
                interpret=interpret,
                # training on the pallas kernels: megakernel primal + fused
                # recompute backward (2 kernels/block instead of the ~30-XLA-
                # kernel context fwd+bwd swarm).  The backward is striped
                # over window-rows like the forward, so VMEM stays bounded
                # at any map size (416² full-slice training runs the fused
                # path too — the r2 ≤32×32 gate is gone).
                backward="pallas" if self.attn_backward == "pallas" else None,
            )

        attn = WindowAttention(
            dim=half,
            num_heads=self.ngram_num_heads,
            window_size=(self.ngram, self.ngram),
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pallas_interpret=self.pallas_interpret,
            xla_window_merge=self.xla_window_merge,
            attn_backward=self.attn_backward,
            name="ngram_attn",
        )

        def _context(u, back):
            if self.padding_mode == "seq_refl_win_pad":
                padded = seq_refl_win_pad(u, self.ngram, back=back)
            else:
                p = self.ngram - 1
                cfg = ((0, 0), (0, p), (0, p), (0, 0)) if not back else ((0, 0), (p, 0), (p, 0), (0, 0))
                padded = jnp.pad(u, cfg)
            if self.ngram == 1:
                padded = u
            patches = sliding_patches(padded, self.ngram)  # [B, wh, ww, n, n, C]
            B, wh, ww, n, _, C = patches.shape
            tokens = patches.reshape(B * wh * ww, n * n, C)
            out = attn(tokens, deterministic=deterministic)
            # Mean over window tokens == unpartition + AvgPool2d(ngram)
            # (reference window_utils.py:70-72).
            return out.mean(axis=1).reshape(B, wh, ww, C)

        fwd = _context(unigram, back=False)
        bwd = _context(unigram, back=True)
        both = jnp.concatenate([fwd, bwd], axis=-1)  # [B, wh, ww, D]
        merged = nn.Conv(
            features=self.dim,
            kernel_size=(1, 1),
            dtype=self.dtype,
            kernel_init=conv_normal_init,
            name="merge",
        )(both)
        return merged


class NGramWindowPartition(nn.Module):
    dim: int
    window_size: int
    ngram: int
    ngram_num_heads: int
    shift_size: int = 0
    dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False
    xla_window_merge: bool = False
    # "auto" (XLA math under grad) | "pallas" (fused bwd kernel) |
    # "xla" (pallas fwd + recompute-VJP); pallas fwd+bwd measured
    # fastest for training after the r2 kernel fixes (PERF.md)
    attn_backward: str = "auto"

    return_context: Any = False  # False | True | "map"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: [B, ph, pw, D] -> ([B*wh*ww, ws, ws, D], (wh, ww)).

        With ``return_context=True`` the context is NOT added: returns
        (windows of roll(x), (wh, ww), context [B, wh, ww, D]) so a fused
        kernel can inject it per quadrant (tmar.ops.pallas_nstb).  With
        ``return_context="map"`` the rolled map itself is returned in
        place of the windows: (roll(x) [B, ph, pw, D], (wh, ww), context)."""
        B, ph, pw, D = x.shape
        ws = self.window_size
        wh, ww = ph // ws, pw // ws
        assert wh > 0 and ww > 0, "feature map smaller than window size"

        context = NGramContext(
            dim=self.dim,
            window_size=ws,
            ngram=self.ngram,
            ngram_num_heads=self.ngram_num_heads,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pallas_interpret=self.pallas_interpret,
            xla_window_merge=self.xla_window_merge,
            attn_backward=self.attn_backward,
            name="ngram_context",
        )(x, deterministic=deterministic)  # [B, wh, ww, D]

        if self.return_context == "map":
            # map-level fused path: unrolled map + raw context, no
            # partition — the kernel assembles rolled stripes via halos
            return x, (wh, ww), context

        if self.return_context:
            shifted = cyclic_shift(x, self.shift_size)
            windows, num_windows = window_partition(shifted, ws)
            return windows, num_windows, context

        # Inject context into each window, then (optionally) cyclic-shift.
        xw = x.reshape(B, wh, ws, ww, ws, D)
        xw = xw + context[:, :, None, :, None, :]
        x = xw.reshape(B, ph, pw, D)
        x = cyclic_shift(x, self.shift_size)
        windows, num_windows = window_partition(x, ws)
        return windows, num_windows
