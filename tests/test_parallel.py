"""Sharded tiled inference across the 8-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from tmar.nn import NGswin
from tmar.parallel import sharded_tiled_eval
from tmar.eval.inference import tiled_eval
import pytest


TINY = dict(
    ngrams=(2, 2, 2, 2), embed_dim=32, depths=(2, 2, 2), num_heads=(2, 2, 2),
    dec_dim=32, dec_depths=2, dec_num_heads=2, window_size=8,
)


@pytest.mark.slow
def test_sharded_tiled_matches_single_device(mesh8, rng):
    gen = NGswin(**TINY)
    ct = rng.uniform(-1, 1, (1, 96, 96, 1)).astype(np.float32)
    params = gen.init(jax.random.PRNGKey(0), jnp.asarray(ct[:, :64, :64]))["params"]

    out_sharded = sharded_tiled_eval(gen, params, mesh8, ct, tile=64, stride=32)

    fwd = jax.jit(lambda t: gen.apply({"params": params}, t))
    out_single = tiled_eval(lambda t: np.asarray(fwd(jnp.asarray(t))), ct, tile=64, stride=32)
    np.testing.assert_allclose(out_sharded, out_single, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_sharded_step_matches_single_device(mesh8, tmp_path):
    """One GAN train step from identical initial states: 8-device
    data-parallel metrics and updated params must match a 1-device run on
    the same batch (VERDICT r1 item 4 — agreement, not just liveness).
    Also: a sharded GANTrainState survives an orbax save/restore roundtrip."""
    import optax

    from tmar.core.mesh import create_mesh, replicate, shard_batch
    from tmar.checkpoint.io import CheckpointManager
    from tmar.data import SyntheticMARDataset
    from tmar.losses import LossWeights
    from tmar.nn import MultiScaleDiscriminator
    from tmar.ops import Radon
    from tmar.train import create_train_state, make_train_step

    size = 64
    gen = NGswin(**TINY)
    disc = MultiScaleDiscriminator(base_channels=16, num_scales=2)
    g_tx = optax.adam(1e-4, b1=0.5, b2=0.999)
    d_tx = optax.adam(2e-4, b1=0.5, b2=0.999)
    host_state = jax.device_get(
        create_train_state(jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, size)
    )
    radon = Radon(size, np.linspace(0, np.pi, 12, endpoint=False))
    ds = SyntheticMARDataset(size=size, length=16)
    host_batch = {
        "ct": np.stack([ds[i]["ct"] for i in range(16)])[..., None],
        "gt": np.stack([ds[i]["gt"] for i in range(16)])[..., None],
    }

    results = {}
    for name, mesh in (("dev8", mesh8), ("dev1", create_mesh(1))):
        state = replicate(mesh, host_state)
        step = make_train_step(
            gen, disc, g_tx, d_tx, LossWeights(dilation_radius=2),
            projector=radon, mesh=mesh,
        )
        new_state, metrics = step(state, shard_batch(mesh, host_batch))
        results[name] = (jax.device_get(new_state), jax.device_get(metrics))

    (s8, m8), (s1, m1) = results["dev8"], results["dev1"]
    for k in m8:
        assert abs(float(m8[k]) - float(m1[k])) < 5e-3, (k, m8[k], m1[k])
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), s8.g_params, s1.g_params
    )
    assert max(jax.tree_util.tree_leaves(deltas)) < 5e-4

    # orbax roundtrip of the SHARDED state
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    sharded = replicate(mesh8, s8)
    mgr.save(sharded, step=1)
    restored, _meta = mgr.restore(replicate(mesh8, host_state), step=1)
    rdeltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)))),
        jax.device_get(restored.g_params), s8.g_params,
    )
    assert max(jax.tree_util.tree_leaves(rdeltas)) == 0.0


@pytest.mark.slow
def test_tensor_parallel_step_matches_single_device():
    """Tensor-parallel GAN step on a (data=4, model=2) mesh: Megatron-split
    generator params + optimizer moments (tmar.core.mesh.gan_state_shardings)
    must produce the same metrics and updated params as a 1-device run —
    GSPMD inserts the activation psums from the annotations alone.  Also
    asserts the layout is REALLY sharded (a qkv kernel holds half its
    columns per model-shard), not silently replicated."""
    import optax

    from tmar.core.mesh import (
        create_mesh, gan_state_shardings, replicate, shard_batch,
    )
    from tmar.data import SyntheticMARDataset
    from tmar.losses import LossWeights
    from tmar.nn import MultiScaleDiscriminator
    from tmar.ops import Radon
    from tmar.train import create_train_state, make_train_step

    size = 64
    gen = NGswin(**TINY)
    disc = MultiScaleDiscriminator(base_channels=16, num_scales=2)
    g_tx = optax.adam(1e-4, b1=0.5, b2=0.999)
    d_tx = optax.adam(2e-4, b1=0.5, b2=0.999)
    host_state = jax.device_get(
        create_train_state(jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, size)
    )
    radon = Radon(size, np.linspace(0, np.pi, 12, endpoint=False))
    ds = SyntheticMARDataset(size=size, length=8)
    host_batch = {
        "ct": np.stack([ds[i]["ct"] for i in range(8)])[..., None],
        "gt": np.stack([ds[i]["gt"] for i in range(8)])[..., None],
    }

    mesh_tp = create_mesh(8, model_parallel=2)
    shardings = gan_state_shardings(mesh_tp, host_state, tensor_parallel=True)
    state_tp = jax.device_put(host_state, shardings)
    qkv = state_tp.g_params["encoder_layer1"]["blocks_0"]["attn"]["qkv"]["kernel"]
    shard_cols = {s.data.shape[1] for s in qkv.addressable_shards}
    assert shard_cols == {qkv.shape[1] // 2}, shard_cols  # really split

    step_tp = make_train_step(
        gen, disc, g_tx, d_tx, LossWeights(dilation_radius=2),
        projector=radon, mesh=mesh_tp, state_shardings=shardings,
    )
    s_tp, m_tp = step_tp(state_tp, shard_batch(mesh_tp, host_batch))
    s_tp, m_tp = jax.device_get(s_tp), jax.device_get(m_tp)

    mesh1 = create_mesh(1)
    step1 = make_train_step(
        gen, disc, g_tx, d_tx, LossWeights(dilation_radius=2),
        projector=radon, mesh=mesh1,
    )
    s1, m1 = step1(replicate(mesh1, host_state), shard_batch(mesh1, host_batch))
    s1, m1 = jax.device_get(s1), jax.device_get(m1)

    for k in m_tp:
        assert abs(float(m_tp[k]) - float(m1[k])) < 5e-3, (k, m_tp[k], m1[k])
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), s_tp.g_params, s1.g_params
    )
    assert max(jax.tree_util.tree_leaves(deltas)) < 5e-4


@pytest.mark.slow
def test_fsdp_step_matches_single_device():
    """ZeRO/FSDP layout: params + optimizer moments of BOTH networks live
    sharded over the data axis (all-gather at use / reduce-scatter on
    grads, inserted by GSPMD); one step must match a 1-device run."""
    import optax

    from tmar.core.mesh import (
        create_mesh, gan_state_shardings, replicate, shard_batch,
    )
    from tmar.data import SyntheticMARDataset
    from tmar.losses import LossWeights
    from tmar.nn import MultiScaleDiscriminator
    from tmar.ops import Radon
    from tmar.train import create_train_state, make_train_step

    size = 64
    gen = NGswin(**TINY)
    disc = MultiScaleDiscriminator(base_channels=16, num_scales=2)
    g_tx = optax.adam(1e-4, b1=0.5, b2=0.999)
    d_tx = optax.adam(2e-4, b1=0.5, b2=0.999)
    host_state = jax.device_get(
        create_train_state(jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, size)
    )
    radon = Radon(size, np.linspace(0, np.pi, 12, endpoint=False))
    ds = SyntheticMARDataset(size=size, length=8)
    host_batch = {
        "ct": np.stack([ds[i]["ct"] for i in range(8)])[..., None],
        "gt": np.stack([ds[i]["gt"] for i in range(8)])[..., None],
    }

    mesh = create_mesh(8)
    shardings = gan_state_shardings(mesh, host_state, fsdp=True)
    state_f = jax.device_put(host_state, shardings)
    qkv = state_f.g_params["encoder_layer1"]["blocks_0"]["attn"]["qkv"]["kernel"]
    shard_cols = {s.data.shape[1] for s in qkv.addressable_shards}
    assert shard_cols == {qkv.shape[1] // 8}, shard_cols  # really ZeRO-sharded

    step_f = make_train_step(
        gen, disc, g_tx, d_tx, LossWeights(dilation_radius=2),
        projector=radon, mesh=mesh, state_shardings=shardings,
    )
    s_f, m_f = step_f(state_f, shard_batch(mesh, host_batch))
    s_f, m_f = jax.device_get(s_f), jax.device_get(m_f)

    mesh1 = create_mesh(1)
    step1 = make_train_step(
        gen, disc, g_tx, d_tx, LossWeights(dilation_radius=2),
        projector=radon, mesh=mesh1,
    )
    s1, m1 = step1(replicate(mesh1, host_state), shard_batch(mesh1, host_batch))
    s1, m1 = jax.device_get(s1), jax.device_get(m1)

    for k in m_f:
        assert abs(float(m_f[k]) - float(m1[k])) < 5e-3, (k, m_f[k], m1[k])
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), s_f.g_params, s1.g_params
    )
    assert max(jax.tree_util.tree_leaves(deltas)) < 5e-4
