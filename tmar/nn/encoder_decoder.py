"""Encoder/decoder stages, patch merging, ASPC pools, SCDP bottleneck.

Faithful to reference models/generator/components/encoder_decoder.py and
pooling.py, in NHWC / tokens-[B, N, D] form:

* ``EncoderLayer``: optional across-cascade projection (ASPC concat absorb),
  depth NSTBs with alternating shift 0 / ws/2 and the within-stage residual
  ``next_in = out_i + in_i``; optional PatchMerging tail applied to
  ``out_last + in_last`` (encoder_decoder.py:135-145).
* ``PatchMerging``: 2×2 concat → LayerNorm(4D) → Linear 4D→downsample_dim
  (no bias) (encoder_decoder.py:51-74).
* ``SCDPBottleneck``: pixel-shuffle each stage output (plus the
  BottleneckPool-downsampled shallow skip) to full resolution, concat
  (concat_dim = Σ4^i·(D/16)), depthwise 3×3 + GELU, pointwise Linear→dec_dim,
  LayerNorm (encoder_decoder.py:188-200).
* ``DecoderLayer``: NSTB stack with the same within-stage residual.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tmar.nn.blocks import NSTB
from tmar.nn.layers import conv_normal_init, layer_norm, trunc_normal_init


def tokens_to_image(x: jnp.ndarray, num_patches: Tuple[int, int]) -> jnp.ndarray:
    B, N, C = x.shape
    h, w = num_patches
    return x.reshape(B, h, w, C)


def image_to_tokens(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C)


def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def pixel_shuffle_permute(
    x: jnp.ndarray, num_patches: Tuple[int, int], out_size: Tuple[int, int]
) -> jnp.ndarray:
    """[B, h*w, D] -> [B, (h*s)*(w*s), D/s²] (einops '(c ch cw)' channel split,
    reference encoder_decoder.py:159-164)."""
    h, w = num_patches
    s_h = out_size[0] // h
    s_w = out_size[1] // w
    B, N, D = x.shape
    c = D // (s_h * s_w)
    x = x.reshape(B, h, w, c, s_h, s_w)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B, h, s_h, w, s_w, c]
    return x.reshape(B, h * s_h * w * s_w, c)


class ShallowExtractor(nn.Module):
    out_chans: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.out_chans,
            kernel_size=(3, 3),
            padding="SAME",
            dtype=self.dtype,
            kernel_init=conv_normal_init,
            name="conv1",
        )(x)


class InterPool(nn.Module):
    """MaxPool2d(2) re-embedding for the ASPC cascade (pooling.py:7-23)."""

    @nn.compact
    def __call__(self, x, num_patches: Tuple[int, int]):
        img = tokens_to_image(x, num_patches)
        return image_to_tokens(max_pool2(img))


class BottleneckPool(nn.Module):
    """Repeated maxpool + LeakyReLU for the shallow-skip injection
    (pooling.py:25-37)."""

    @nn.compact
    def __call__(self, x, exp: int):
        # x: [B, H, W, D] shallow feature map
        for _ in range(exp):
            x = max_pool2(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        return image_to_tokens(x)


class PatchMerging(nn.Module):
    dim: int
    downsample_dim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, num_patches: Tuple[int, int]):
        ph, pw = num_patches
        B, p, D = x.shape
        assert p == ph * pw and ph % 2 == 0 and pw % 2 == 0
        out_dim = self.downsample_dim or self.dim

        img = x.reshape(B, ph, pw, D)
        x0 = img[:, 0::2, 0::2, :]
        x1 = img[:, 0::2, 1::2, :]
        x2 = img[:, 1::2, 0::2, :]
        x3 = img[:, 1::2, 1::2, :]
        merged = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        merged = merged.reshape(B, (ph // 2) * (pw // 2), 4 * D)
        merged = layer_norm(self.dtype, name="norm")(merged)
        merged = nn.Dense(
            out_dim,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="reduction",
        )(merged)
        return merged, (ph // 2, pw // 2)


class EncoderLayer(nn.Module):
    dim: int
    ngram: int
    depth: int
    num_heads: int
    window_size: int
    head_dim: Optional[int] = None
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    downsample: bool = False
    downsample_dim: Optional[int] = None
    num_cas: int = 1
    dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False
    xla_window_merge: bool = False
    # "auto" (XLA math under grad) | "pallas" (fused bwd kernel) |
    # "xla" (pallas fwd + recompute-VJP); pallas fwd+bwd measured
    # fastest for training after the r2 kernel fixes (PERF.md)
    attn_backward: str = "auto"
    remat: bool = False

    @nn.compact
    def __call__(self, x, num_patches: Tuple[int, int], deterministic: bool = True):
        if self.num_cas != 1:
            x = nn.Dense(
                self.dim,
                dtype=self.dtype,
                kernel_init=trunc_normal_init,
                name="across_cascade_proj",
            )(x)

        dpr = list(self.drop_path) if self.drop_path else [0.0] * self.depth
        # rematerialise each block's activations in backward when requested
        # (jax.checkpoint; enables 512^2-patch training within HBM)
        block_cls = nn.remat(NSTB, static_argnums=(2, 3)) if self.remat else NSTB
        x_prev_in = 0.0
        for i in range(self.depth):
            blk = block_cls(
                dim=self.dim,
                ngram=self.ngram,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                head_dim=self.head_dim,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=dpr[i],
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                pallas_interpret=self.pallas_interpret,
                xla_window_merge=self.xla_window_merge,
                attn_backward=self.attn_backward,
                name=f"blocks_{i}",
            )
            x_prev_in, x = blk(x + x_prev_in, num_patches, deterministic)

        if self.downsample:
            x_down, new_np = PatchMerging(
                dim=self.dim,
                downsample_dim=self.downsample_dim,
                dtype=self.dtype,
                name="downsample",
            )(x + x_prev_in, num_patches)
        else:
            x_down, new_np = x, num_patches
        return x, x_down, new_np


class SCDPBottleneck(nn.Module):
    num_encoder_stages: int
    enc_dim: int
    dec_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        shallow: jnp.ndarray,  # [B, H, W, D]
        x_list: List[jnp.ndarray],
        num_patches_list: List[Tuple[int, int]],
    ):
        assert len(x_list) == self.num_encoder_stages
        concat_dim = sum(4**i for i in range(self.num_encoder_stages)) * (
            self.enc_dim // 16
        )
        pool = BottleneckPool(name="bottleneck_pool")
        out_np = num_patches_list[0]
        shuffled = [
            pixel_shuffle_permute(x + pool(shallow, i), num_patches_list[i], out_np)
            for i, x in enumerate(x_list)
        ]
        x = jnp.concatenate(shuffled, axis=-1)  # [B, HW, concat_dim]
        img = tokens_to_image(x, out_np)
        img = nn.Conv(
            concat_dim,
            kernel_size=(3, 3),
            padding="SAME",
            feature_group_count=concat_dim,
            dtype=self.dtype,
            kernel_init=conv_normal_init,
            name="depthwise",
        )(img)
        img = nn.gelu(img, approximate=False)
        x = image_to_tokens(img)
        x = nn.Dense(
            self.dec_dim,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="pointwise",
        )(x)
        x = layer_norm(self.dtype, name="norm")(x)
        return x, out_np


class DecoderLayer(nn.Module):
    dim: int
    ngram: int
    depth: int
    num_heads: int
    window_size: int
    head_dim: Optional[int] = None
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False
    xla_window_merge: bool = False
    # "auto" (XLA math under grad) | "pallas" (fused bwd kernel) |
    # "xla" (pallas fwd + recompute-VJP); pallas fwd+bwd measured
    # fastest for training after the r2 kernel fixes (PERF.md)
    attn_backward: str = "auto"
    remat: bool = False

    @nn.compact
    def __call__(self, x, num_patches: Tuple[int, int], deterministic: bool = True):
        dpr = list(self.drop_path) if self.drop_path else [0.0] * self.depth
        # rematerialise each block's activations in backward when requested
        # (jax.checkpoint; enables 512^2-patch training within HBM)
        block_cls = nn.remat(NSTB, static_argnums=(2, 3)) if self.remat else NSTB
        x_prev_in = 0.0
        for i in range(self.depth):
            blk = block_cls(
                dim=self.dim,
                ngram=self.ngram,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                head_dim=self.head_dim,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=dpr[i],
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                pallas_interpret=self.pallas_interpret,
                xla_window_merge=self.xla_window_merge,
                attn_backward=self.attn_backward,
                name=f"blocks_{i}",
            )
            x_prev_in, x = blk(x + x_prev_in, num_patches, deterministic)
        return x
