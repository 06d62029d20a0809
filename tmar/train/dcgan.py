"""DCGAN z→image tutorial training loop (reference
models/baseline/dcgan_reference.py:183-228 — which is broken upstream:
it feeds 64² CT batches to a generator that consumes [B, nz, 1, 1] noise
and never reshapes; this is the working TPU-native equivalent).

One jit'd program per step updates D and G together:
  D: BCE(D(x_real), 1) + BCE(D(G(z)), 0)
  G: BCE(D(G(z)), 1)                          (non-saturating, as upstream)
with one shared G(z) forward per step (same ``jax.vjp`` trick as the main
engine, tmar/train/steps.py) and BatchNorm state threaded functionally.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tmar.nn.baselines import DCGANDiscriminator, DCGANGenerator


class DCGANState(flax.struct.PyTreeNode):
    g_params: Any
    g_batch_stats: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def _bce_logits(logits, target: float):
    # stable BCE-with-logits; upstream uses nn.BCELoss on sigmoid outputs
    z = jnp.clip(logits, -30, 30)
    if target == 1.0:
        return jnp.mean(jax.nn.softplus(-z))
    return jnp.mean(jax.nn.softplus(z))


def create_dcgan_state(
    rng: jax.Array,
    gen: DCGANGenerator,
    disc: DCGANDiscriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    image_size: int = 64,
) -> DCGANState:
    rg, rd = jax.random.split(rng)
    z0 = jnp.zeros((1, 1, 1, gen.nz), jnp.float32)
    gv = gen.init(rg, z0, train=True)
    x0 = jnp.zeros((1, image_size, image_size, gen.nc), jnp.float32)
    dv = disc.init(rd, x0)
    return DCGANState(
        g_params=gv["params"],
        g_batch_stats=gv.get("batch_stats", {}),
        d_params=dv["params"],
        g_opt=g_tx.init(gv["params"]),
        d_opt=d_tx.init(dv["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def make_dcgan_step(
    gen: DCGANGenerator,
    disc: DCGANDiscriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
) -> Callable:
    """Returns jit'd ``step(state, real, z) -> (state, metrics)``."""

    def d_logits(p, x):
        out = disc.apply({"params": p}, x)
        return out[0][0] if isinstance(out, tuple) else out

    @jax.jit
    def step(state: DCGANState, real: jnp.ndarray, z: jnp.ndarray):
        # one shared generator forward: value for the D update, closure for G
        def g_fwd(gp):
            fake, mut = gen.apply(
                {"params": gp, "batch_stats": state.g_batch_stats},
                z, train=True, mutable=["batch_stats"],
            )
            return fake, mut["batch_stats"]

        (fake, new_stats), g_vjp = jax.vjp(g_fwd, state.g_params, has_aux=False)

        def d_loss_fn(dp):
            l_real = _bce_logits(d_logits(dp, real), 1.0)
            l_fake = _bce_logits(d_logits(dp, jax.lax.stop_gradient(fake)), 0.0)
            return l_real + l_fake

        loss_d, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        def g_loss_fn(fake_img):
            return _bce_logits(d_logits(d_params, fake_img), 1.0)

        loss_g, fake_grad = jax.value_and_grad(g_loss_fn)(fake)
        (g_grads,) = g_vjp((fake_grad, jax.tree_util.tree_map(jnp.zeros_like, new_stats)))
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = DCGANState(
            g_params=g_params,
            g_batch_stats=new_stats,
            d_params=d_params,
            g_opt=g_opt,
            d_opt=d_opt,
            step=state.step + 1,
        )
        return new_state, {"loss_d": loss_d, "loss_g": loss_g}

    return step


def train_dcgan(
    data: Iterable[np.ndarray],
    steps: int = 200,
    nz: int = 100,
    image_size: int = 64,
    nc: int = 1,
    lr: float = 2e-4,
    seed: int = 0,
    sample_every: Optional[int] = None,
) -> Tuple[DCGANState, Dict[str, list]]:
    """Tutorial loop: iterate ``data`` (batches [B, H, W, nc] in [-1, 1]),
    one G/D update per batch with fresh z ~ N(0, 1).  Returns the final
    state and the loss history (+ optional periodic sample grids)."""
    gen = DCGANGenerator(nz=nz, nc=nc)
    disc = DCGANDiscriminator()
    g_tx = optax.adam(lr, b1=0.5, b2=0.999)
    d_tx = optax.adam(lr, b1=0.5, b2=0.999)
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    state = create_dcgan_state(init_rng, gen, disc, g_tx, d_tx, image_size)
    step = make_dcgan_step(gen, disc, g_tx, d_tx)

    hist: Dict[str, list] = {"loss_d": [], "loss_g": [], "samples": []}
    it = iter(data)
    for i in range(steps):
        try:
            real = next(it)
        except StopIteration:
            it = iter(data)
            real = next(it)
        real = jnp.asarray(real, jnp.float32)
        rng, zr = jax.random.split(rng)
        z = jax.random.normal(zr, (real.shape[0], 1, 1, nz))
        state, metrics = step(state, real, z)
        hist["loss_d"].append(float(metrics["loss_d"]))
        hist["loss_g"].append(float(metrics["loss_g"]))
        if sample_every and (i + 1) % sample_every == 0:
            fake = gen.apply(
                {"params": state.g_params, "batch_stats": state.g_batch_stats},
                z[:8], train=False,
            )
            hist["samples"].append(np.asarray(fake))
    return state, hist
