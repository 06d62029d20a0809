"""Dual-domain unrolled MAR network (InDuDoNet-class), TPU-native.

The reference's flagship fine-tune capability operates external dual-domain
benchmark networks — InDuDoNet / InDuDoNet+ / MEPNet, loaded from benchmark
checkouts and driven with ``(Xma, XLI, M, Sma, SLI, Tr)`` plus in-loop ODL
forward projections (reference scripts/finetune_all_benchmarks.py:1188-1276
loaders, :1523-1650 dual-domain train loop).  None of those architectures is
vendored in the reference tree, so this module provides the framework's own
in-tree member of the class: an unrolled proximal-gradient network that
couples the sinogram and image domains through the native differentiable
:class:`tmar.ops.radon.Radon` operator.

Model (one jit-compilable program, static unroll):

    min_{S,X}  ||Tr ⊙ (S − Sma)||²  +  α ||A X − S||²  +  g₁(S) + g₂(X)

with A the Radon forward projector.  Each of ``stages`` iterations performs
one proximal-gradient step per domain, the prox operators learned as small
residual CNNs that carry ``channels`` memory feature maps across stages
(the InDuDoNet "information fusion" channels):

    S ← proxS_k( S − η1ₖ [ Tr ⊙ (S − Sma) + αₖ (S − A X) ] | Sp, memS )
    X ← proxX_k( X − η2ₖ · FBP( A X − S )                   | Xp, memX )

η1ₖ/η2ₖ/αₖ are learnable per-stage step sizes (reference Args eta1=1,
eta2=5, alpha=0.5, :1199-1205 — here their initial values).  The image-side
descent direction is preconditioned with the ramp-filtered backprojection
(FBP ∘ A ≈ id) instead of the raw adjoint, whose spectrum (AᵀA) is badly
scaled at CT sizes — the standard unrolled-CT trick, and the reason a
handful of stages converges.

A small prior U-Net predicts a coarse artifact-free image Xp from
(Xma, XLI, M) — the InDuDoNet prior-net.  Its forward projection Sp = A(Xp)
conditions the sinogram prox.  Deviation from InDuDoNet (documented): the
prior enters by feature concatenation rather than sinogram *division* —
division by a predicted sinogram is numerically fragile in bf16 and needs
an epsilon-tuned normalisation; conditioning is the TPU-safe equivalent.
With ``x_prior`` passed explicitly the net runs InDuDoNet+-style
(external NMAR prior, reference :1026-1028); the built-in prior-net is
then bypassed.

Conventions match the in-tree fine-tune engine (tmar/train/finetune.py):
images NHWC [B, H, W, 1] in [0, 1], sinograms [B, A, det] raw Radon scale,
``tr`` is the NON-metal trace (1 where the sinogram bin saw no metal,
``Radon(mask) < 0.1``, reference :1606-1608).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from tmar.nn.layers import conv_normal_init


class _ProxNet(nn.Module):
    """Learned proximal operator: residual CNN over [main | memory | cond].

    Returns (main', memory'): the main channel is updated residually from its
    input (prox ≈ id + correction), the memory channels are re-emitted for
    the next stage (InDuDoNet's cross-stage feature reuse).
    """

    channels: int = 32
    blocks: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, main, mem, cond):
        # main [B,H,W,1] · mem [B,H,W,C] · cond [B,H,W,k]
        h = jnp.concatenate([main, mem, cond], axis=-1).astype(self.dtype)
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=conv_normal_init, name="in_conv")(h)
        for i in range(self.blocks):
            r = nn.relu(nn.Conv(self.channels, (3, 3), padding="SAME",
                                dtype=self.dtype, kernel_init=conv_normal_init,
                                name=f"res{i}_a")(h))
            r = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                        kernel_init=conv_normal_init, name=f"res{i}_b")(r)
            h = nn.relu(h + r)
        out = nn.Conv(1 + self.channels, (3, 3), padding="SAME",
                      dtype=self.dtype, kernel_init=conv_normal_init,
                      name="out_conv")(h)
        out = out.astype(jnp.float32)
        return main + out[..., :1], out[..., 1:]


class _PriorUNet(nn.Module):
    """Two-scale U-Net predicting the coarse prior image from (Xma, XLI, M)
    — the InDuDoNet prior-net role."""

    channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        conv = lambda f, name: nn.Conv(f, (3, 3), padding="SAME",
                                       dtype=self.dtype,
                                       kernel_init=conv_normal_init, name=name)
        e0 = nn.relu(conv(c, "e0b")(nn.relu(conv(c, "e0a")(x.astype(self.dtype)))))
        d1 = nn.Conv(2 * c, (3, 3), strides=(2, 2), padding="SAME",
                     dtype=self.dtype, kernel_init=conv_normal_init, name="down")(e0)
        e1 = nn.relu(conv(2 * c, "e1b")(nn.relu(d1)))
        u = nn.ConvTranspose(c, (2, 2), strides=(2, 2), dtype=self.dtype,
                             kernel_init=conv_normal_init, name="up")(e1)
        h = nn.relu(conv(c, "fuse")(jnp.concatenate([u, e0], axis=-1)))
        return nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                       kernel_init=conv_normal_init, name="out")(h).astype(jnp.float32)


class DuDoMARNet(nn.Module):
    """Unrolled dual-domain metal-artifact-reduction network.

    Args:
        projector: a :class:`tmar.ops.radon.Radon` built for the input image
            size (static; shared by every stage).
        stages: unrolled proximal iterations (reference InDuDoNet S=10;
            default 4 keeps the in-tree model fine-tune-sized).
        channels: cross-stage memory feature maps (reference num_channel=32).
        blocks: residual blocks per prox net (reference T).
        share_weights: reuse one (proxS, proxX) pair across stages
            (MEPNet-style weight sharing) instead of per-stage nets.

    ``__call__(xma, xli, m, sma, sli, tr, x_prior=None)`` returns a dict
    with the final image estimate ``x`` [B,H,W,1], final sinogram estimate
    ``s`` [B,A,det], the prior image ``x_prior`` and the per-stage image
    list ``xs`` (the reference loops supervise ListX[-1], :1625-1630).
    """

    projector: Any = None
    stages: int = 4
    channels: int = 32
    blocks: int = 3
    share_weights: bool = False
    eta1_init: float = 1.0    # reference Args eta1 (:1199-1205)
    eta2_init: float = 5.0    # reference Args eta2
    alpha_init: float = 0.5   # reference Args alpha
    dtype: Any = jnp.float32
    dual_domain: bool = True  # marker consumed by tmar.train.finetune

    @nn.compact
    def __call__(self, xma, xli, m, sma, sli, tr, x_prior=None):
        if self.projector is None:
            raise ValueError("DuDoMARNet requires a Radon projector")
        A = self.projector

        xma = xma.astype(jnp.float32)
        xli = xli.astype(jnp.float32)
        sma = sma.astype(jnp.float32)
        sli = sli.astype(jnp.float32)
        tr = tr.astype(jnp.float32)

        # prior image (InDuDoNet prior-net; InDuDoNet+ passes it in)
        if x_prior is None:
            x_prior = xli + _PriorUNet(self.channels, dtype=self.dtype, name="prior_net")(
                jnp.concatenate([xma, xli, m.astype(jnp.float32)], axis=-1)
            )
        sp = A.forward(x_prior)                                   # [B, A, det]

        # per-stage learnable step sizes (positive via softplus of raw params)
        import math

        def step_size(name, init):
            inv = math.log(math.expm1(init))  # softplus⁻¹(init)
            raw = self.param(name, nn.initializers.constant(inv),
                             (self.stages,), jnp.float32)
            return nn.softplus(raw)

        eta1 = step_size("eta1", self.eta1_init)
        eta2 = step_size("eta2", self.eta2_init)
        alpha = step_size("alpha", self.alpha_init)

        # initial estimates: measured data off-metal, LI inside the trace
        s = tr * sma + (1.0 - tr) * sli
        x = xli
        mem_s = jnp.zeros(sma.shape + (self.channels,), jnp.float32)
        mem_x = jnp.zeros(xma.shape[:3] + (self.channels,), jnp.float32)

        sp4 = sp[..., None]
        tr4 = tr[..., None]
        sma4 = sma[..., None]

        if self.share_weights:
            prox_s_nets = [_ProxNet(self.channels, self.blocks, self.dtype,
                                    name="prox_s")] * self.stages
            prox_x_nets = [_ProxNet(self.channels, self.blocks, self.dtype,
                                    name="prox_x")] * self.stages
        else:
            prox_s_nets = [_ProxNet(self.channels, self.blocks, self.dtype,
                                    name=f"prox_s_{k}") for k in range(self.stages)]
            prox_x_nets = [_ProxNet(self.channels, self.blocks, self.dtype,
                                    name=f"prox_x_{k}") for k in range(self.stages)]

        xs = []
        for k in range(self.stages):
            ax = A.forward(x)                                     # [B, A, det]
            grad_s = tr * (s - sma) + alpha[k] * (s - ax)
            s_half = (s - eta1[k] * grad_s)[..., None]            # [B,A,det,1]
            s_new, mem_s = prox_s_nets[k](
                s_half, mem_s, jnp.concatenate([sp4, tr4, sma4], axis=-1)
            )
            s = s_new[..., 0]

            resid = ax - s                                        # [B, A, det]
            # FBP-preconditioned gradient: well-scaled descent direction
            x_half = x - eta2[k] * A.fbp(resid)[..., None]
            x, mem_x = prox_x_nets[k](
                x_half, mem_x, jnp.concatenate([x_prior, xli], axis=-1)
            )
            xs.append(x)

        return {"x": x, "s": s, "x_prior": x_prior, "xs": xs}
