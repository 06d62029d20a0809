"""Baseline architectures for variant/ablation comparison.

NHWC re-designs of reference models/baseline/:
* ``RedCNN`` — 5 conv + 4 deconv residual denoiser
  (alternative_architectures.py:9-37).
* ``DenoisingTransformer`` — conv projection, learned 2-D positional
  embedding, transformer encoder, conv out
  (alternative_architectures.py:40-67).
* ``BAFResNet`` — boosting-attention-fusion ResNet with spatial/channel
  attention blocks (alternative_architectures.py:71-166).
* ``DCGANGenerator``/``DCGANDiscriminator`` — tutorial DCGAN pair; the D is
  the sigmoid-output critic used by the baseline-variant trainer (reference
  training/train_baseline_variants.py:225-251; dcgan_reference.py:93-152,
  which as shipped has a syntax error — capability, not bug, replicated).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tmar.nn.layers import conv_normal_init


class RedCNN(nn.Module):
    features: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, name: nn.Conv(
            f, (5, 5), padding="VALID", dtype=self.dtype,
            kernel_init=conv_normal_init, name=name,
        )
        deconv = lambda f, name: nn.ConvTranspose(
            f, (5, 5), padding="VALID", dtype=self.dtype,
            kernel_init=conv_normal_init, name=name,
        )
        residuals = []
        h = x
        residuals.append(h)
        h = nn.relu(conv(self.features, "conv1")(h))
        h = nn.relu(conv(self.features, "conv2")(h))
        residuals.append(h)
        h = nn.relu(conv(self.features, "conv3")(h))
        h = nn.relu(conv(self.features, "conv4")(h))
        residuals.append(h)
        h = nn.relu(conv(self.features, "conv5")(h))
        h = deconv(self.features, "deconv1")(h)
        h = nn.relu(h + residuals[2])
        h = nn.relu(deconv(self.features, "deconv2")(h))
        h = deconv(self.features, "deconv3")(h)
        h = nn.relu(h + residuals[1])
        h = nn.relu(deconv(self.features, "deconv4")(h))
        h = deconv(x.shape[-1], "deconv5")(h)
        return nn.relu(h + residuals[0])


class DenoisingTransformer(nn.Module):
    dim: int = 128
    depth: int = 4
    num_heads: int = 4
    patch: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.Conv(
            self.dim, (self.patch, self.patch), strides=(self.patch, self.patch),
            dtype=self.dtype, kernel_init=conv_normal_init, name="proj",
        )(x)
        hh, ww = h.shape[1], h.shape[2]
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, hh, ww, self.dim), jnp.float32
        )
        tokens = (h + pos).reshape(B, hh * ww, self.dim)
        for i in range(self.depth):
            y = nn.LayerNorm(name=f"norm1_{i}")(tokens)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype, name=f"attn_{i}"
            )(y, y)
            tokens = tokens + y
            y = nn.LayerNorm(name=f"norm2_{i}")(tokens)
            y = nn.Dense(self.dim * 4, dtype=self.dtype, name=f"mlp1_{i}")(y)
            y = nn.gelu(y)
            y = nn.Dense(self.dim, dtype=self.dtype, name=f"mlp2_{i}")(y)
            tokens = tokens + y
        h = tokens.reshape(B, hh, ww, self.dim)
        h = nn.ConvTranspose(
            self.dim // 2, (self.patch, self.patch), strides=(self.patch, self.patch),
            dtype=self.dtype, kernel_init=conv_normal_init, name="up",
        )(h)
        out = nn.Conv(
            C, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=conv_normal_init, name="out",
        )(nn.relu(h))
        return out + x


class _SpatialAttention(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        a = nn.Conv(1, (7, 7), padding="SAME", dtype=self.dtype, name="conv")(
            jnp.concatenate([avg, mx], axis=-1)
        )
        return x * nn.sigmoid(a)


class _ChannelAttention(nn.Module):
    reduction: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        pooled = jnp.mean(x, axis=(1, 2))
        a = nn.Dense(C // self.reduction, dtype=self.dtype, name="fc1")(pooled)
        a = nn.relu(a)
        a = nn.Dense(C, dtype=self.dtype, name="fc2")(a)
        return x * nn.sigmoid(a)[:, None, None, :]


class _BAFB(nn.Module):
    """Boosting attention fusion block: conv-conv residual + dual attention."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        h = _ChannelAttention(dtype=self.dtype, name="ca")(h)
        h = _SpatialAttention(dtype=self.dtype, name="sa")(h)
        return nn.relu(h + x)


class BAFResNet(nn.Module):
    features: int = 64
    num_blocks: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype, name="head")(x)
        skip = h
        boosted = 0.0
        for i in range(self.num_blocks):
            h = _BAFB(self.features, dtype=self.dtype, name=f"bafb_{i}")(h)
            boosted = boosted + h  # boosting merge (BMG): accumulate block outputs
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype, name="fuse")(
            boosted / self.num_blocks
        )
        h = nn.relu(h + skip)
        return nn.Conv(x.shape[-1], (3, 3), padding="SAME", dtype=self.dtype, name="tail")(h)


class DCGANGenerator(nn.Module):
    """z [B, 1, 1, nz] -> image [B, 64, 64, nc] via ConvTranspose stack."""

    nz: int = 100
    ngf: int = 64
    nc: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = False):
        # torch ConvTranspose2d(k=4, s=2, p=1) == full VALID transpose
        # ((in-1)*2 + 4 = 2*in + 2) center-cropped by p=1 per side -> 2*in.
        # (flax's ConvTranspose padding crops differently, so the crop is
        # explicit; the original padded spec produced 34^2 instead of 64^2.)
        specs = [
            (self.ngf * 8, (1, 1), False),   # 1 -> 4 (VALID, no crop)
            (self.ngf * 4, (2, 2), True),    # 4 -> 8
            (self.ngf * 2, (2, 2), True),    # 8 -> 16
            (self.ngf, (2, 2), True),        # 16 -> 32
        ]
        h = z
        for i, (f, s, crop) in enumerate(specs):
            h = nn.ConvTranspose(
                f, (4, 4), strides=s, padding="VALID", use_bias=False,
                dtype=self.dtype, kernel_init=conv_normal_init, name=f"up_{i}",
            )(h)
            if crop:
                h = h[:, 1:-1, 1:-1, :]
            h = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(h)
            h = nn.relu(h)
        h = nn.ConvTranspose(
            self.nc, (4, 4), strides=(2, 2), padding="VALID", use_bias=False,
            dtype=self.dtype, kernel_init=conv_normal_init, name="out",
        )(h)[:, 1:-1, 1:-1, :]                        # 32 -> 64
        return jnp.tanh(h)


class DCGANCritic(nn.Module):
    """DCGAN strided-conv critic presenting the (logits_list, features_list)
    multiscale interface used by the GAN train step, for the baseline/v1
    variants (reference train_baseline_variants.py:225-251).  Emits
    pre-sigmoid logits so the vanilla BCE losses apply directly."""

    ndf: int = 64
    dtype: Any = jnp.float32
    use_sn: bool = False

    @nn.compact
    def __call__(self, x, update_sn: bool = False, return_features: bool = True):
        h = x
        feats = []
        chans = [self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8]
        for i, f in enumerate(chans):
            h = nn.Conv(
                f, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False,
                dtype=self.dtype, kernel_init=conv_normal_init, name=f"conv_{i}",
            )(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
            feats.append(h)
        h = nn.Conv(
            1, (4, 4), strides=(1, 1), padding="VALID", use_bias=False,
            dtype=self.dtype, kernel_init=conv_normal_init, name="final",
        )(h)
        return [h], ([feats] if return_features else None)


class DCGANDiscriminator(nn.Module):
    """Strided-conv critic with sigmoid output (BCE adversarial loss),
    as used by the baseline-variant trainer (train_baseline_variants.py:225-251)."""

    ndf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        chans = [self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8]
        h = x
        for i, f in enumerate(chans):
            h = nn.Conv(
                f, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False,
                dtype=self.dtype, kernel_init=conv_normal_init, name=f"conv_{i}",
            )(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Conv(
            1, (4, 4), strides=(1, 1), padding="VALID", use_bias=False,
            dtype=self.dtype, kernel_init=conv_normal_init, name="final",
        )(h)
        return nn.sigmoid(h)
