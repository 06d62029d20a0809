"""jit-compiled GAN train/eval steps over a device mesh.

The reference's hot loop (train_combined.py:388-560) runs eagerly: 3 generator
forwards, 4 discriminator forwards and 2 optimiser steps per iteration.  Here
the entire iteration — D-step then G-step, TTUR Adam updates, spectral-norm
power iterations — is ONE jit-compiled function with donated state.  Data
parallelism comes from sharding the batch over the mesh's ``data`` axis and
replicating the state; XLA inserts the gradient ``psum``s automatically.

Spectral-norm semantics match torch's per-forward power iteration in train
mode (4 D applications per iteration → 4 updates, threaded sequentially
through the step; see tmar.nn.spectral_norm).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from tmar.losses import LossWeights, generator_loss, hinge_d_loss, vanilla_d_loss


class GANTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_opt: Any
    d_params: Any
    d_sn: Any
    d_opt: Any
    # exponential moving average of g_params (None when EMA is off).
    # Beyond-reference capability: standard GAN serving practice — the EMA
    # weights are what validation/inference uses when enabled.
    g_ema: Any = None


def create_train_state(
    rng: jax.Array,
    generator,
    discriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    patch_size: int,
    in_chans: int = 1,
    ema_decay: float = 0.0,
) -> Tuple[GANTrainState, Callable, Callable]:
    """Initialise G/D parameters and optimizer states.

    ``ema_decay > 0`` additionally tracks an exponential moving average of
    the generator parameters (initialised to a copy — no bias correction
    needed), updated by the train step and preferred at validation."""
    g_rng, d_rng = jax.random.split(rng)
    x = jnp.zeros((1, patch_size, patch_size, in_chans))
    g_vars = generator.init(g_rng, x)
    d_vars = discriminator.init(d_rng, jnp.zeros((1, patch_size, patch_size, 2 * in_chans)))
    state = GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        g_opt=g_tx.init(g_vars["params"]),
        d_params=d_vars["params"],
        d_sn=d_vars.get("sn", {}),
        d_opt=d_tx.init(d_vars["params"]),
        g_ema=(
            jax.tree_util.tree_map(jnp.array, g_vars["params"])
            if ema_decay else None
        ),
    )
    return state


def make_train_step(
    generator,
    discriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    weights: LossWeights,
    projector=None,
    mesh=None,
    donate: bool = True,
    fused_pairs: bool = False,
    state_shardings=None,
    ema_decay: float = 0.0,
):
    """Build the fused D+G train step.

    Returns ``step(state, batch) -> (state, metrics)`` where batch is a dict
    with ``ct`` (corrupted input) and ``gt`` (clean target), both
    [B, H, W, C] in [-1, 1].

    ``fused_pairs=True`` runs each loss's real+fake discriminator
    applications as ONE batch-concatenated pass (2 D passes per step instead
    of 4) — exact for the SN-free discriminator (no batch-coupled norms);
    with spectral norm it halves the power iterations per step (2 instead of
    the reference's 4 per-forward updates), a deviation in the u/v estimate
    only.  Kernel-count lever for the dispatch-bound step (PERF.md).
    """
    has_sn = getattr(discriminator, "use_sn", True)

    def apply_d(d_params, d_sn, x, want_features):
        variables = {"params": d_params}
        if has_sn:
            variables["sn"] = d_sn
            (logits, feats), new_vars = discriminator.apply(
                variables, x, update_sn=True, return_features=want_features,
                mutable=["sn"],
            )
            return logits, feats, new_vars["sn"]
        logits, feats = discriminator.apply(
            variables, x, return_features=want_features
        )
        return logits, feats, d_sn

    def train_step(state: GANTrainState, batch):
        ct, real = batch["ct"], batch["gt"]

        # ONE generator forward serves both halves of the iteration: its
        # value (stop-gradded) feeds the D step, its VJP closure feeds the G
        # step.  The reference runs 3 G forwards per iteration
        # (train_combined.py:410,433 + sampling); the split-loss formulation
        # below is numerically identical to re-running the forward because
        # the D update never touches g_params.
        fake, g_vjp = jax.vjp(
            lambda p: generator.apply({"params": p}, ct), state.g_params
        )
        fake_sg = jax.lax.stop_gradient(fake)
        real_pair = jnp.concatenate([ct, real], axis=-1)

        B = ct.shape[0]

        def split_rf(tree):
            """Split every leaf of a (possibly nested) logits/features
            structure along the concatenated batch: (real half, fake half)."""
            real = jax.tree_util.tree_map(lambda l: l[:B], tree)
            fake = jax.tree_util.tree_map(lambda l: l[B:], tree)
            return real, fake

        # ---------------- D step (G frozen) ---------------------------------
        def d_loss_fn(d_params, d_sn):
            fake_pair = jnp.concatenate([ct, fake_sg], axis=-1)
            if fused_pairs:
                both = jnp.concatenate([real_pair, fake_pair], axis=0)
                logits, _, d_sn = apply_d(d_params, d_sn, both, False)
                real_logits, fake_logits = split_rf(logits)
            else:
                real_logits, _, d_sn = apply_d(d_params, d_sn, real_pair, False)
                fake_logits, _, d_sn = apply_d(d_params, d_sn, fake_pair, False)
            if weights.gan_mode == "hinge":
                loss = hinge_d_loss(real_logits, fake_logits)
            else:
                loss = vanilla_d_loss(real_logits, fake_logits)
            return loss, d_sn

        (d_loss, d_sn), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, state.d_sn
        )
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---------------- G step (new D) ------------------------------------
        # Loss as a function of the generator OUTPUT; g_grads = vjp(dL/dfake).
        def g_out_loss_fn(fake, d_sn):
            fake_pair = jnp.concatenate([ct, fake], axis=-1)
            fake_logits, fake_feats, real_feats = None, None, None
            if fused_pairs and weights.fm:
                # one pass over [real ‖ fake]: gradient flows only through
                # the fake half (the real half is a constant input)
                both = jnp.concatenate([real_pair, fake_pair], axis=0)
                logits, feats, d_sn = apply_d(d_params, d_sn, both, True)
                _, fake_logits = split_rf(logits)
                real_feats, fake_feats = split_rf(feats)
                real_feats = jax.lax.stop_gradient(real_feats)
            elif weights.adv or weights.fm:
                fake_logits, fake_feats, d_sn = apply_d(
                    d_params, d_sn, fake_pair, True
                )
                if weights.fm:
                    rl, real_feats, d_sn = apply_d(
                        d_params, d_sn, real_pair, True
                    )
                    real_feats = jax.lax.stop_gradient(real_feats)
            total, terms = generator_loss(
                fake, real, ct, fake_logits, fake_feats, real_feats,
                weights, projector=projector,
            )
            return total, (terms, d_sn)

        (g_loss, (g_terms, d_sn)), dfake = jax.value_and_grad(
            g_out_loss_fn, has_aux=True
        )(fake, d_sn)
        (g_grads,) = g_vjp(dfake)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        g_ema = state.g_ema
        if ema_decay:
            if g_ema is None:
                # trace-time structure check: a silent no-op here would hide
                # a caller wiring mistake (EMA requested but the state was
                # built without it) for the whole run
                raise ValueError(
                    "ema_decay > 0 but state.g_ema is None — build the state "
                    "with create_train_state(..., ema_decay=ema_decay)"
                )
            # ema ← d_t·ema + (1−d_t)·θ with a warmed-up decay
            # d_t = min(d, (1+t)/(10+t)): without warmup, runs much shorter
            # than 1/(1−d) steps would validate/select-best on weights stuck
            # near θ0.
            t = state.step.astype(jnp.float32)
            eff_d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
            g_ema = jax.tree_util.tree_map(
                lambda e, p: e * eff_d.astype(e.dtype)
                + p.astype(e.dtype) * (1.0 - eff_d).astype(e.dtype),
                g_ema, g_params,
            )
        elif g_ema is not None:
            raise ValueError(
                "state carries g_ema but ema_decay=0 — pass the training "
                "ema_decay to make_train_step (a stale EMA would otherwise "
                "be carried forever)"
            )

        metrics = {"loss_d": d_loss, "loss_g": g_loss}
        for k, v in g_terms.items():
            metrics[f"g_{k}"] = v

        new_state = GANTrainState(
            step=state.step + 1,
            g_params=g_params,
            g_opt=g_opt,
            d_params=d_params,
            d_sn=d_sn,
            d_opt=d_opt,
            g_ema=g_ema,
        )
        return new_state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        # state_shardings: an optional GANTrainState-shaped tree (e.g.
        # tmar.core.mesh.gan_state_shardings(..., tensor_parallel=True))
        # overriding the default fully-replicated param layout
        state_sh = repl if state_shardings is None else state_shardings
        return jax.jit(
            train_step,
            in_shardings=(state_sh, data_sh),
            out_shardings=(state_sh, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(generator, mesh=None):
    """Validation forward: returns restored image + PSNR/MSE against gt
    (data-range-2 PSNR formula of the reference, train_combined.py:606-608)."""

    def eval_step(g_params, batch):
        fake = generator.apply({"params": g_params}, batch["ct"])
        mse = jnp.mean(jnp.square(fake - batch["gt"]), axis=(1, 2, 3))
        psnr = 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-12))
        return fake, {"mse": jnp.mean(mse), "psnr": jnp.mean(psnr)}

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        return jax.jit(
            eval_step, in_shardings=(repl, data_sh), out_shardings=(data_sh, repl)
        )
    return jax.jit(eval_step)
