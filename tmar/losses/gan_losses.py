"""GAN and metal-aware loss functions — pure jnp, NHWC.

Faithful re-implementations of reference losses/gan_losses.py (11 functions)
plus the vanilla-BCE variants used by ablation A8 (reference
scripts/run_ablation_studies.py:163-184), and a combined ``generator_loss``
that assembles the canonical recipe (reference train_combined.py:430-500)
under a single jit-friendly weight structure so ablations A0-A8 are pure
config (λ=0 terms are skipped statically).

Default weights — the canonical recipe (train_combined.py:109-120):
λ_adv 0.1, λ_FM 10.0, λ_rec 1.0, λ_edge 0.2, λ_phys 0.02, λ_metal 0.5;
metal threshold 0.6 (data in [-1,1]), dilation radius 5, β 1.0, w_max 3.0.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp

from tmar.ops.gradients import image_gradients
from tmar.ops.morphology import dilate_mask


# --------------------------------------------------------------- adversarial
def hinge_d_loss(real_logits: Sequence[jnp.ndarray], fake_logits: Sequence[jnp.ndarray]):
    """Σ_scales E[relu(1-D(real))] + E[relu(1+D(fake))] (gan_losses.py:7-13)."""
    loss = 0.0
    for r, f in zip(real_logits, fake_logits):
        loss = loss + jnp.mean(jnp.maximum(0.0, 1.0 - r)) + jnp.mean(
            jnp.maximum(0.0, 1.0 + f)
        )
    return loss


def hinge_g_loss(fake_logits: Sequence[jnp.ndarray]):
    """Σ_scales -E[D(fake)] (gan_losses.py:16-20)."""
    loss = 0.0
    for f in fake_logits:
        loss = loss - jnp.mean(f)
    return loss


def _bce_with_logits(logits, target):
    # numerically stable BCE-with-logits
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def vanilla_d_loss(real_logits: Sequence[jnp.ndarray], fake_logits: Sequence[jnp.ndarray]):
    """BCE-with-logits D loss (ablation A8, run_ablation_studies.py:163-173)."""
    loss = 0.0
    for r, f in zip(real_logits, fake_logits):
        loss = loss + _bce_with_logits(r, 1.0) + _bce_with_logits(f, 0.0)
    return loss


def vanilla_g_loss(fake_logits: Sequence[jnp.ndarray]):
    """BCE-with-logits G loss (run_ablation_studies.py:176-184)."""
    loss = 0.0
    for f in fake_logits:
        loss = loss + _bce_with_logits(f, 1.0)
    return loss


def feature_matching_loss(
    real_features: Sequence[Sequence[jnp.ndarray]],
    fake_features: Sequence[Sequence[jnp.ndarray]],
):
    """Σ_{scales,layers} mean|feat_real - feat_fake| (gan_losses.py:24-41).
    Callers stop-gradient the real features (train_combined.py:440-441)."""
    total = 0.0
    for fr_scale, ff_scale in zip(real_features, fake_features):
        for fr, ff in zip(fr_scale, ff_scale):
            total = total + jnp.mean(jnp.abs(fr - ff))
    return total


# --------------------------------------------------------------- metal-aware
def extract_metal_mask(ct: jnp.ndarray, threshold: float = 0.6) -> jnp.ndarray:
    """Binary metal mask M = (ct > thr), data in [-1,1] (gan_losses.py:48-64)."""
    return (ct > threshold).astype(jnp.float32)


def compute_weight_map(
    ct: jnp.ndarray,
    beta: float = 1.0,
    radius: int = 5,
    w_max: float = 3.0,
    threshold: float = 0.6,
) -> jnp.ndarray:
    """w = clip(1 + β·dilate(M, r), max w_max) (gan_losses.py:122-146)."""
    M = extract_metal_mask(ct, threshold)
    B = dilate_mask(M, radius)
    return jnp.clip(1.0 + beta * B, max=w_max)


def compute_metal_aware_loss(
    fake, real, ct, beta=1.0, radius=5, w_max=3.0, threshold=0.6
):
    """mean|w·(fake-real)| (gan_losses.py:87-119)."""
    w = compute_weight_map(ct, beta, radius, w_max, threshold)
    return jnp.mean(jnp.abs(w * (fake - real)))


def compute_metal_aware_edge_loss(fake, real, w):
    """mean[w·(|Δgx| + |Δgy|)] (gan_losses.py:171-198)."""
    gfx, gfy = image_gradients(fake)
    grx, gry = image_gradients(real)
    grad_diff = jnp.abs(gfx - grx) + jnp.abs(gfy - gry)
    return jnp.mean(w * grad_diff)


def metal_consistency_loss(fake, real, M):
    """mean|M ⊙ (fake - real)| — inside-metal accuracy (gan_losses.py:201-219)."""
    return jnp.mean(jnp.abs(M * (fake - real)))


def physics_loss_syn(fake, real, M, projector):
    """Sinogram consistency outside the metal trace (gan_losses.py:222-253):
    mean[(1 - Mp)·|P(fake) - P(real)|], Mp = (P(M) > 0).

    Only P(fake) sits on the gradient path; the clean-image and mask
    projections are constants w.r.t. the generator, so they run as one
    batched stop-gradient Radon call — the transposed-projection backward
    then covers B images instead of 3B."""
    B = fake.shape[0]
    proj_fake = projector.forward(fake)
    const = projector.forward(
        jax.lax.stop_gradient(jnp.concatenate([real, M], axis=0))
    )
    proj_real, m_proj = const[:B], const[B:]
    mp = (m_proj > 0).astype(jnp.float32)
    return jnp.mean((1.0 - mp) * jnp.abs(proj_fake - jax.lax.stop_gradient(proj_real)))


# --------------------------------------------------------------- combined
@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Canonical recipe defaults (train_combined.py:109-120).  Setting a λ to
    0 statically removes the term from the jit'd graph — the variant ladder
    (baseline/v1..v5/full) and ablations A0-A8 are pure config."""

    adv: float = 0.1
    fm: float = 10.0
    rec: float = 1.0
    edge: float = 0.2
    phys: float = 0.02
    metal: float = 0.5
    gan_mode: str = "hinge"  # "hinge" | "vanilla" (A8)
    metal_threshold: float = 0.6
    dilation_radius: int = 5
    beta_weight: float = 1.0
    w_max: float = 3.0


def generator_loss(
    fake: jnp.ndarray,
    real: jnp.ndarray,
    ct: jnp.ndarray,
    fake_logits: Optional[Sequence[jnp.ndarray]],
    fake_feats: Optional[Sequence[Sequence[jnp.ndarray]]],
    real_feats: Optional[Sequence[Sequence[jnp.ndarray]]],
    weights: LossWeights,
    projector=None,
):
    """Assemble the weighted generator objective; returns (total, dict of
    unweighted terms) mirroring the G-step at train_combined.py:430-500."""
    terms = {}
    total = 0.0
    w = weights
    if w.adv and fake_logits is not None:
        g_adv = hinge_g_loss(fake_logits) if w.gan_mode == "hinge" else vanilla_g_loss(fake_logits)
        terms["adv"] = g_adv
        total = total + w.adv * g_adv
    if w.fm and fake_feats is not None and real_feats is not None:
        fm = feature_matching_loss(real_feats, fake_feats)
        terms["fm"] = fm
        total = total + w.fm * fm
    if w.rec:
        rec = compute_metal_aware_loss(
            fake, real, ct, w.beta_weight, w.dilation_radius, w.w_max, w.metal_threshold
        )
        terms["rec"] = rec
        total = total + w.rec * rec
    if w.edge:
        wmap = compute_weight_map(
            ct, w.beta_weight, w.dilation_radius, w.w_max, w.metal_threshold
        )
        edge = compute_metal_aware_edge_loss(fake, real, wmap)
        terms["edge"] = edge
        total = total + w.edge * edge
    if w.phys and projector is not None:
        M = extract_metal_mask(ct, w.metal_threshold)
        phys = physics_loss_syn(fake, real, M, projector)
        terms["phys"] = phys
        total = total + w.phys * phys
    if w.metal:
        M = extract_metal_mask(ct, w.metal_threshold)
        metal = metal_consistency_loss(fake, real, M)
        terms["metal"] = metal
        total = total + w.metal * metal
    terms["total"] = total
    return total, terms
