"""Multi-scale conditional PatchGAN discriminator with spectral norm.

Re-design of reference models/discriminator/ms_patchgan.py in NHWC:
* ``SingleScaleDiscriminator``: 5 conv layers, 4×4 kernels, strides
  (2,2,2,2,1), channels 2→64→128→256→512→512 (doubling capped at 8×base),
  LeakyReLU(0.2), spectral norm on every conv including the final 1×1 logit
  conv; returns (logits, [feat_0..feat_3]) for the FM loss
  (ms_patchgan.py:9-85).  Torch ``Conv2d(k=4, stride=2, pad=1)`` halves the
  spatial size; we use explicit ((1,1),(1,1)) padding to match.
* ``MultiScaleDiscriminator``: 3 independent single-scale Ds over 1×, ½×, ¼×
  avg-pooled inputs (ms_patchgan.py:88-151).
* ``ConditionalDiscriminator``: legacy pix2pix-style single D with
  InstanceNorm (reference models/discriminator/conditional_patchgan.py).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tmar.nn.layers import conv_normal_init
from tmar.nn.spectral_norm import SNConv


def _conv(features, kernel, stride, padding, use_sn, dtype, name):
    if use_sn:
        return SNConv(
            features=features,
            kernel_size=kernel,
            strides=stride,
            padding=padding,
            dtype=dtype,
            name=name,
        )
    return nn.Conv(
        features=features,
        kernel_size=kernel,
        strides=stride,
        padding=padding,
        dtype=dtype,
        kernel_init=conv_normal_init,
        name=name,
    )


def avg_pool2(x):
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))


class SingleScaleDiscriminator(nn.Module):
    base_channels: int = 64
    num_layers: int = 5
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_sn: bool = False, return_features: bool = True):
        feats: List[jnp.ndarray] = []
        ch_out = self.base_channels
        h = x
        for i in range(self.num_layers):
            stride = 1 if i == self.num_layers - 1 else 2
            conv = _conv(
                ch_out, (4, 4), stride, ((1, 1), (1, 1)), self.use_sn, self.dtype, f"conv_{i}"
            )
            h = conv(h, update_sn=update_sn) if self.use_sn else conv(h)
            if i != self.num_layers - 1:
                h = nn.leaky_relu(h, negative_slope=0.2)
            if return_features and i < self.num_layers - 1:
                feats.append(h)
            if i < self.num_layers - 2:
                ch_out = min(ch_out * 2, self.base_channels * 8)

        assert h.shape[1] > 0 and h.shape[2] > 0, (
            f"input too small for {self.num_layers}-layer PatchGAN "
            f"(got empty {h.shape} feature map); the reference trains at 128² "
            f"patches for this reason (train_combined.py:89)"
        )
        final = _conv(1, (1, 1), 1, ((0, 0), (0, 0)), self.use_sn, self.dtype, "final_conv")
        logits = final(h, update_sn=update_sn) if self.use_sn else final(h)
        return logits, (feats if return_features else None)


class MultiScaleDiscriminator(nn.Module):
    """Input: concat([condition, real_or_fake], channel axis) -> 2 channels."""

    base_channels: int = 64
    num_layers: int = 5
    num_scales: int = 3
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_sn: bool = False, return_features: bool = True):
        logits_all, features_all = [], []
        x_scale = x
        for s in range(self.num_scales):
            logits, feats = SingleScaleDiscriminator(
                base_channels=self.base_channels,
                num_layers=self.num_layers,
                use_sn=self.use_sn,
                dtype=self.dtype,
                name=f"discriminators_{s}",
            )(x_scale, update_sn=update_sn, return_features=return_features)
            logits_all.append(logits)
            features_all.append(feats)
            x_scale = avg_pool2(x_scale)
        return logits_all, (features_all if return_features else None)


class ConditionalDiscriminator(nn.Module):
    """Legacy pix2pix-style conditional D (InstanceNorm + LeakyReLU blocks),
    parity with reference models/discriminator/conditional_patchgan.py:26-45."""

    base_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        h = jnp.concatenate([x, cond], axis=-1)
        ch = self.base_channels
        for i in range(4):
            h = nn.Conv(
                ch,
                kernel_size=(4, 4),
                strides=(2, 2),
                padding=((1, 1), (1, 1)),
                dtype=self.dtype,
                kernel_init=conv_normal_init,
                name=f"block_{i}_conv",
            )(h)
            if i > 0:
                h = nn.GroupNorm(
                    num_groups=None, group_size=1, epsilon=1e-5, use_bias=False,
                    use_scale=False, name=f"block_{i}_inorm",
                )(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
            ch = min(ch * 2, self.base_channels * 8)
        logits = nn.Conv(
            1,
            kernel_size=(4, 4),
            strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            kernel_init=conv_normal_init,
            name="final_conv",
        )(h)
        return logits
