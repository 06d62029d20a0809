"""NGswin generator — N-Gram Swin encoder–decoder restoration transformer.

TPU-native re-design of reference models/generator/ngswin.py:18-238 in NHWC:
3 encoder stages (depths 6/4/4, patch-merging after stages 1-2) with
Across-Stage Pooling Cascading, SCDP bottleneck, a depth-6 decoder stage at
full resolution with an encoder-stage-1 skip, global shallow residual, conv
reconstruction head with tanh.  Input/output [B, H, W, C] in [-1, 1]; H, W
are padded to multiples of 4·window_size and cropped back
(ngswin.py:158-164, 208).  All shapes static — each (H, W) bucket compiles
once.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tmar.nn.encoder_decoder import (
    DecoderLayer,
    EncoderLayer,
    InterPool,
    SCDPBottleneck,
    ShallowExtractor,
    image_to_tokens,
    tokens_to_image,
)
from tmar.nn.layers import conv_normal_init, layer_norm
from tmar.ops.window import pad_to_multiple


class NGswin(nn.Module):
    ngrams: Tuple[int, ...] = (2, 2, 2, 2)
    in_chans: int = 1
    embed_dim: int = 64
    depths: Tuple[int, ...] = (6, 4, 4)
    num_heads: Tuple[int, ...] = (6, 4, 4)
    head_dim: Optional[int] = None
    dec_dim: int = 64
    dec_depths: int = 6
    dec_num_heads: int = 6
    dec_head_dim: Optional[int] = None
    window_size: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32
    use_pallas_attention: bool = False
    pallas_interpret: bool = False
    remat: bool = False
    xla_window_merge: bool = False
    # "auto" (XLA math under grad) | "pallas" (fused bwd kernel) |
    # "xla" (pallas fwd + recompute-VJP); pallas fwd+bwd measured
    # fastest for training after the r2 kernel fixes (PERF.md)
    attn_backward: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: [B, H, W, C] in [-1, 1] -> restored [B, H, W, C]."""
        B, H_ori, W_ori, C = x.shape
        unit = 4 * self.window_size
        x, (H_ori, W_ori) = pad_to_multiple(x, unit)
        B, H, W, C = x.shape
        n_enc = len(self.depths)

        # stochastic-depth decay schedule over all blocks
        total_depth = sum(self.depths) + self.dec_depths
        dpr = list(np.linspace(0, self.drop_path_rate, total_depth))

        shallow = ShallowExtractor(self.embed_dim, dtype=self.dtype, name="shallow_extract")(x)
        c0 = image_to_tokens(shallow)  # [B, HW, D]
        inter_pool = InterPool(name="inter_pool")

        # ---- encoder with Across-Stage Pooling Cascading -------------------
        cas, num_patches = c0, (H, W)
        pre_merge, np_list = [], []
        for i in range(n_enc):
            np_list.append(num_patches)
            e_, e_down, num_patches_next = EncoderLayer(
                dim=self.embed_dim,
                ngram=self.ngrams[i],
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                head_dim=self.head_dim,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=dpr[sum(self.depths[:i]) : sum(self.depths[: i + 1])],
                downsample=(i + 1) != n_enc,
                downsample_dim=self.embed_dim if (i + 1) != n_enc else None,
                num_cas=i + 1,
                dtype=self.dtype,
                use_pallas=self.use_pallas_attention,
                pallas_interpret=self.pallas_interpret,
                remat=self.remat,
                xla_window_merge=self.xla_window_merge,
                attn_backward=self.attn_backward,
                name=f"encoder_layer{i+1}",
            )(cas, num_patches, deterministic=deterministic)
            pre_merge.append(e_)
            if i + 1 < n_enc:
                cas = jnp.concatenate(
                    [inter_pool(cas, num_patches), e_down], axis=-1
                )
            num_patches = num_patches_next

        # ---- SCDP bottleneck ----------------------------------------------
        bottleneck_out, num_patches_scdp = SCDPBottleneck(
            num_encoder_stages=n_enc,
            enc_dim=self.embed_dim,
            dec_dim=self.dec_dim,
            dtype=self.dtype,
            name="bottleneck",
        )(shallow, pre_merge, np_list)

        # ---- decoder (enc-dec skip with stage-1 pre-merge output) ----------
        e1_ = pre_merge[0]
        dec = DecoderLayer(
            dim=self.dec_dim,
            ngram=self.ngrams[n_enc],
            depth=self.dec_depths,
            num_heads=self.dec_num_heads,
            window_size=self.window_size,
            head_dim=self.dec_head_dim,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop=self.drop_rate,
            attn_drop=self.attn_drop_rate,
            drop_path=dpr[sum(self.depths) :],
            dtype=self.dtype,
            use_pallas=self.use_pallas_attention,
            pallas_interpret=self.pallas_interpret,
            remat=self.remat,
            xla_window_merge=self.xla_window_merge,
            attn_backward=self.attn_backward,
            name="decoder_layer1",
        )(bottleneck_out + e1_, num_patches_scdp, deterministic=deterministic)
        dec = layer_norm(self.dtype, name="norm")(dec)
        dec = dec + c0  # global shallow residual (ngswin.py:204)

        # ---- reconstruction -----------------------------------------------
        img = tokens_to_image(dec, (H, W))
        img = nn.Conv(
            self.in_chans,
            kernel_size=(3, 3),
            padding="SAME",
            dtype=self.dtype,
            kernel_init=conv_normal_init,
            name="to_target_before_shuffle",
        )(img)
        img = nn.Conv(
            self.in_chans,
            kernel_size=(3, 3),
            padding="SAME",
            dtype=self.dtype,
            kernel_init=conv_normal_init,
            name="to_target_to_origin",
        )(img)
        out = jnp.tanh(img.astype(jnp.float32))
        return out[:, :H_ori, :W_ori, :]

    def flops(self, resolution: Tuple[int, int]) -> int:
        """Analytic FLOPs (multiply-add counted as in the reference's
        flops() API, ngswin.py:212-238) for a padded HxW input."""
        unit = 4 * self.window_size
        H = resolution[0] + (-resolution[0]) % unit
        W = resolution[1] + (-resolution[1]) % unit
        D = self.embed_dim
        ws = self.window_size
        total = 0
        # shallow conv
        total += H * W * 9 * self.in_chans * D + H * W * D

        def win_attn_flops(dim, heads, area, num_windows):
            f = area * dim * 3 * dim + 3 * dim
            f += heads * area * (dim // heads) * area * 2
            f += area * dim * dim + dim
            return f * num_windows

        def nstb_flops(h, w, dim, heads, ngram):
            wh, ww = h // ws, w // ws
            f = wh * ww * ws * ws * dim + wh * ww * dim  # unigram conv
            f += 2 * win_attn_flops(dim // 2, heads, ngram * ngram, wh * ww)
            f += wh * ww * 4 * dim + wh * ww * dim * dim  # avgpool + merge
            f += win_attn_flops(dim, heads, ws * ws, wh * ww)
            f += 2 * h * w * dim  # norms
            f += h * w * dim * int(self.mlp_ratio * dim) * 2  # ffn
            return f

        for i, depth in enumerate(self.depths):
            h, w = H // 2**i, W // 2**i
            if i > 0:
                total += h * w * (i + 1) * D * D  # cascade proj
                total += h * w * 4 * (i * D)  # inter pool
            for _ in range(depth):
                total += nstb_flops(h, w, D, self.num_heads[i], self.ngrams[i])
            if i + 1 != len(self.depths):
                total += h * w * 4 * D + (h // 2) * (w // 2) * 4 * D * D  # merging
        concat_dim = sum(4**j for j in range(len(self.depths))) * (D // 16)
        total += H * W * (9 + 2) * concat_dim + H * W * concat_dim * self.dec_dim
        for _ in range(self.dec_depths):
            total += nstb_flops(H, W, self.dec_dim, self.dec_num_heads, self.ngrams[-1])
        total += H * W * self.dec_dim  # final norm
        total += H * W * 9 * self.dec_dim * self.in_chans + H * W * 9 * self.in_chans
        return int(total)
