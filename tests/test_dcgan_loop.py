"""z->image DCGAN tutorial loop (reference dcgan_reference.py:183-228 —
broken upstream; tmar.train.dcgan is the working equivalent)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmar.train.dcgan import (
    DCGANState,
    create_dcgan_state,
    make_dcgan_step,
    train_dcgan,
)


def _disc_batches(n, b=4, size=64, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        # "real" data: soft discs on [-1, 1] background
        yy, xx = np.mgrid[:size, :size]
        imgs = []
        for _ in range(b):
            cy, cx, r = rng.uniform(16, 48, 3)
            img = -np.ones((size, size), np.float32)
            img[(yy - cy) ** 2 + (xx - cx) ** 2 < (r / 2) ** 2] = 1.0
            imgs.append(img)
        yield np.stack(imgs)[..., None]


@pytest.mark.slow
def test_dcgan_loop_trains():
    state, hist = train_dcgan(list(_disc_batches(8)), steps=16, nz=16)
    assert len(hist["loss_d"]) == 16
    assert np.isfinite(hist["loss_d"]).all() and np.isfinite(hist["loss_g"]).all()
    # D learns to separate real/fake at some point in the run (per-step
    # GAN losses oscillate, so assert the minimum, not the endpoint)
    assert min(hist["loss_d"]) < hist["loss_d"][0]
    assert state.step == 16


def test_dcgan_step_shapes_and_updates():
    import optax

    from tmar.nn.baselines import DCGANDiscriminator, DCGANGenerator

    gen = DCGANGenerator(nz=8, ngf=8, nc=1)
    disc = DCGANDiscriminator(ndf=8)
    tx = optax.adam(2e-4)
    state = create_dcgan_state(jax.random.PRNGKey(0), gen, disc, tx, tx)
    step = make_dcgan_step(gen, disc, tx, tx)

    real = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 1)), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 1, 8))
    new_state, metrics = step(state, real, z)
    assert np.isfinite(float(metrics["loss_d"]))
    assert np.isfinite(float(metrics["loss_g"]))
    # both nets actually updated, batch stats advanced
    d0 = jax.tree_util.tree_leaves(state.d_params)[0]
    d1 = jax.tree_util.tree_leaves(new_state.d_params)[0]
    assert float(jnp.max(jnp.abs(d0 - d1))) > 0
    g0 = jax.tree_util.tree_leaves(state.g_params)[0]
    g1 = jax.tree_util.tree_leaves(new_state.g_params)[0]
    assert float(jnp.max(jnp.abs(g0 - g1))) > 0
    s0 = jax.tree_util.tree_leaves(state.g_batch_stats)[0]
    s1 = jax.tree_util.tree_leaves(new_state.g_batch_stats)[0]
    assert float(jnp.max(jnp.abs(s0 - s1))) > 0
    # generator output is a tanh image at the tutorial 64^2 size
    fake = gen.apply(
        {"params": new_state.g_params, "batch_stats": new_state.g_batch_stats},
        z, train=False,
    )
    assert fake.shape == (2, 64, 64, 1)
    assert float(jnp.max(jnp.abs(fake))) <= 1.0
