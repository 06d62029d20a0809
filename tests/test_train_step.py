"""End-to-end GAN train-step tests on the virtual 8-device CPU mesh."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from tmar.data import Loader, SyntheticMARDataset
from tmar.losses import LossWeights
from tmar.nn import MultiScaleDiscriminator, NGswin
from tmar.ops import Radon
from tmar.train import create_train_state, make_eval_step, make_train_step


SIZE = 64
TINY = dict(
    ngrams=(2, 2, 2, 2), embed_dim=32, depths=(2, 2, 2), num_heads=(2, 2, 2),
    dec_dim=32, dec_depths=2, dec_num_heads=2, window_size=8,
)


@pytest.fixture(scope="module")
def setup(mesh8):
    gen = NGswin(**TINY)
    disc = MultiScaleDiscriminator(base_channels=16, num_scales=2)
    g_tx = optax.adam(1e-4, b1=0.5, b2=0.999)
    d_tx = optax.adam(2e-4, b1=0.5, b2=0.999)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, patch_size=SIZE
    )
    radon = Radon(SIZE, np.linspace(0, np.pi, 24, endpoint=False))
    step = make_train_step(
        gen, disc, g_tx, d_tx, LossWeights(dilation_radius=2), projector=radon,
        mesh=mesh8, donate=False,
    )
    return gen, disc, state, step


def _batch(mesh, n=8, seed=0):
    from tmar.core.mesh import shard_batch

    ds = SyntheticMARDataset(size=SIZE, length=n, base_seed=seed)
    batch = {
        "ct": np.stack([ds[i]["ct"] for i in range(n)])[..., None],
        "gt": np.stack([ds[i]["gt"] for i in range(n)])[..., None],
    }
    return shard_batch(mesh, batch)


@pytest.mark.slow
def test_train_step_runs_and_improves(mesh8, setup):
    gen, disc, state, step = setup
    batch = _batch(mesh8, 8)
    state1, m1 = step(state, batch)
    assert state1.step == 1
    for k, v in m1.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # all loss terms present for the full recipe
    assert {"loss_d", "loss_g", "g_adv", "g_fm", "g_rec", "g_edge", "g_phys", "g_metal"} <= set(m1)

    # a few more steps: generator reconstruction term should drop
    s = state1
    first_rec = float(m1["g_rec"])
    for i in range(6):
        s, m = step(s, _batch(mesh8, 8, seed=100 + i))
    assert float(m["g_rec"]) < first_rec, (
        f"rec loss did not improve: {first_rec} -> {float(m['g_rec'])}"
    )
    # spectral-norm state actually updated
    u0 = jax.tree_util.tree_leaves(state.d_sn)[0]
    u1 = jax.tree_util.tree_leaves(s.d_sn)[0]
    assert not np.allclose(np.asarray(u0), np.asarray(u1))


@pytest.mark.slow
def test_train_step_param_consistency_across_devices(mesh8, setup):
    """Replicated params stay identical after a sharded-batch step."""
    gen, disc, state, step = setup
    state1, _ = step(state, _batch(mesh8, 8))
    leaf = jax.tree_util.tree_leaves(state1.g_params)[0]
    # fully-replicated sharding: committed and consistent
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_mse_only_variant_step(mesh8):
    """A0/MSE-only config: no D applications inside the G step."""
    gen = NGswin(**TINY)
    disc = MultiScaleDiscriminator(base_channels=16, num_scales=2)
    g_tx = optax.adam(1e-4)
    d_tx = optax.adam(2e-4)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, SIZE)
    weights = LossWeights(adv=0, fm=0, edge=0, phys=0, metal=0, beta_weight=0)
    step = make_train_step(gen, disc, g_tx, d_tx, weights, mesh=mesh8, donate=False)
    _, m = step(state, _batch(mesh8, 8))
    assert "g_rec" in m and np.isfinite(float(m["g_rec"]))


@pytest.mark.slow
def test_eval_step(mesh8, setup):
    gen, disc, state, step = setup
    eval_step = make_eval_step(gen, mesh=mesh8)
    batch = _batch(mesh8, 8)
    fake, metrics = eval_step(state.g_params, batch)
    assert fake.shape == (8, SIZE, SIZE, 1)
    assert 0 < float(metrics["psnr"]) < 60


def test_loader_with_mesh(mesh8):
    ds = SyntheticMARDataset(size=32, length=16)
    loader = Loader(ds, batch_size=8, mesh=mesh8, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["ct"].shape == (8, 32, 32, 1)
    # batch axis sharded over 8 devices
    assert len(b["ct"].sharding.device_set) == 8


def test_fused_optimizer_update_matches_per_leaf(mesh8):
    """build_optimizer(fused=True) (optax.flatten over clip+adam) must give
    the same parameters after 2 steps as the per-leaf chain — only the
    optimizer-state layout may differ (PERF.md kernel-count lever)."""
    from tmar.train.schedules import build_optimizer

    gen = NGswin(**TINY)
    disc = MultiScaleDiscriminator(base_channels=16, num_scales=2)
    batch = _batch(mesh8, 8)

    results = []
    for fused in (False, True):
        g_tx = build_optimizer(1e-4, grad_clip=1.0, fused=fused)
        d_tx = build_optimizer(2e-4, grad_clip=1.0, fused=fused)
        state = create_train_state(
            jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, patch_size=SIZE
        )
        step = make_train_step(
            gen, disc, g_tx, d_tx, LossWeights(dilation_radius=2),
            mesh=mesh8, donate=False,
        )
        for _ in range(2):
            state, metrics = step(state, batch)
        results.append((jax.device_get(state.g_params), metrics))

    (p_leaf, m_leaf), (p_flat, m_flat) = results
    assert abs(float(m_leaf["loss_g"]) - float(m_flat["loss_g"])) < 1e-4
    for a, b in zip(
        jax.tree_util.tree_leaves(p_leaf), jax.tree_util.tree_leaves(p_flat)
    ):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)


def test_fused_pairs_matches_separate_passes_without_sn(mesh8):
    """fused_pairs=True (one [real ‖ fake] D pass per loss) must be EXACT
    when the discriminator has no spectral norm (no batch coupling)."""
    gen = NGswin(**TINY)
    disc = MultiScaleDiscriminator(base_channels=16, num_scales=2, use_sn=False)
    batch = _batch(mesh8, 8)

    results = []
    for fused in (False, True):
        g_tx = optax.adam(1e-4, b1=0.5, b2=0.999)
        d_tx = optax.adam(2e-4, b1=0.5, b2=0.999)
        state = create_train_state(
            jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, patch_size=SIZE
        )
        step = make_train_step(
            gen, disc, g_tx, d_tx, LossWeights(dilation_radius=2),
            mesh=mesh8, donate=False, fused_pairs=fused,
        )
        state, metrics = step(state, batch)
        results.append((jax.device_get(state.g_params), metrics))

    (p_sep, m_sep), (p_fused, m_fused) = results
    for k in m_sep:
        assert abs(float(m_sep[k]) - float(m_fused[k])) < 5e-5, k
    for a, b in zip(
        jax.tree_util.tree_leaves(p_sep), jax.tree_util.tree_leaves(p_fused)
    ):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)


def test_fused_pairs_with_sn_trains_finite(mesh8):
    """With SN the fused-pairs step deviates only in power-iteration count;
    it must still run and produce finite losses."""
    gen = NGswin(**TINY)
    disc = MultiScaleDiscriminator(base_channels=16, num_scales=2)
    g_tx = optax.adam(1e-4, b1=0.5, b2=0.999)
    d_tx = optax.adam(2e-4, b1=0.5, b2=0.999)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, patch_size=SIZE
    )
    step = make_train_step(
        gen, disc, g_tx, d_tx, LossWeights(dilation_radius=2),
        mesh=mesh8, donate=False, fused_pairs=True,
    )
    state, metrics = step(state, _batch(mesh8, 8))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_ema_tracks_generator_exactly(mesh8):
    """g_ema is initialised to θ0 and follows ema ← d_t·ema + (1−d_t)·θ with
    the warmed-up decay d_t = min(d, (1+t)/(10+t)) through the jit'd step —
    asserted against a host-side replay of the exact blend over the captured
    g_params trajectory."""
    gen = NGswin(**TINY)
    disc = MultiScaleDiscriminator(base_channels=16, num_scales=2)
    g_tx = optax.adam(1e-3)
    d_tx = optax.adam(2e-3)
    weights = LossWeights(adv=0, fm=0, edge=0, phys=0, metal=0, beta_weight=0)
    d = 0.9
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, SIZE, ema_decay=d
    )
    # initialised to a copy of the params
    for e, p in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.g_ema)),
        jax.tree_util.tree_leaves(jax.device_get(state.g_params)),
    ):
        np.testing.assert_array_equal(e, p)
    step = make_train_step(
        gen, disc, g_tx, d_tx, weights, mesh=mesh8, donate=False, ema_decay=d
    )
    theta0 = jax.device_get(state.g_params)
    expect = theta0
    s = state
    for i in range(3):
        s, _ = step(s, _batch(mesh8, 8, seed=10 + i))
        p = jax.device_get(s.g_params)
        eff_d = min(d, (1.0 + i) / (10.0 + i))  # warmup: t = pre-update step
        expect = jax.tree_util.tree_map(
            lambda e, q: eff_d * e + (1 - eff_d) * q, expect, p
        )
    got = jax.device_get(s.g_ema)
    leaves_e = jax.tree_util.tree_leaves(expect)
    leaves_g = jax.tree_util.tree_leaves(got)
    assert len(leaves_e) == len(leaves_g) > 0
    for e, g in zip(leaves_e, leaves_g):
        np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-6)
    # the EMA must actually have diverged from θ0 (warmup makes early steps
    # track the trained params closely, so this is far from vacuous)
    diverged = max(
        float(np.max(np.abs(np.asarray(g, np.float64) - np.asarray(t0, np.float64))))
        for g, t0 in zip(leaves_g, jax.tree_util.tree_leaves(theta0))
    )
    assert diverged > 0


def test_ema_wiring_mistakes_raise(mesh8):
    """ema_decay>0 with an EMA-less state (and the converse) must raise at
    trace time instead of silently no-opping (ADVICE r2)."""
    gen = NGswin(**TINY)
    disc = MultiScaleDiscriminator(base_channels=16, num_scales=2)
    g_tx, d_tx = optax.adam(1e-3), optax.adam(2e-3)
    weights = LossWeights(adv=0, fm=0, edge=0, phys=0, metal=0, beta_weight=0)
    no_ema = create_train_state(jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, SIZE)
    step = make_train_step(
        gen, disc, g_tx, d_tx, weights, mesh=mesh8, donate=False, ema_decay=0.9
    )
    with pytest.raises(ValueError, match="g_ema is None"):
        step(no_ema, _batch(mesh8, 8))
    with_ema = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, SIZE, ema_decay=0.9
    )
    step0 = make_train_step(gen, disc, g_tx, d_tx, weights, mesh=mesh8, donate=False)
    with pytest.raises(ValueError, match="ema_decay=0"):
        step0(with_ema, _batch(mesh8, 8))


def test_ema_off_keeps_state_structure(mesh8):
    """ema_decay=0 leaves g_ema=None — identical pytree structure to the
    pre-EMA state, so existing checkpoints stay loadable."""
    gen = NGswin(**TINY)
    disc = MultiScaleDiscriminator(base_channels=16, num_scales=2)
    g_tx, d_tx = optax.adam(1e-3), optax.adam(2e-3)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, SIZE)
    assert state.g_ema is None
    weights = LossWeights(adv=0, fm=0, edge=0, phys=0, metal=0, beta_weight=0)
    step = make_train_step(gen, disc, g_tx, d_tx, weights, mesh=mesh8, donate=False)
    s, _ = step(state, _batch(mesh8, 8))
    assert s.g_ema is None


def test_ema_checkpoint_roundtrip(mesh8, tmp_path):
    """A state carrying EMA params survives an orbax save/restore."""
    from tmar.checkpoint.io import CheckpointManager

    gen = NGswin(**TINY)
    disc = MultiScaleDiscriminator(base_channels=16, num_scales=2)
    g_tx, d_tx = optax.adam(1e-3), optax.adam(2e-3)
    weights = LossWeights(adv=0, fm=0, edge=0, phys=0, metal=0, beta_weight=0)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, SIZE, ema_decay=0.9
    )
    step = make_train_step(
        gen, disc, g_tx, d_tx, weights, mesh=mesh8, donate=False, ema_decay=0.9
    )
    state, _ = step(state, _batch(mesh8, 8))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, step=1)
    template = create_train_state(
        jax.random.PRNGKey(1), gen, disc, g_tx, d_tx, SIZE, ema_decay=0.9
    )
    restored, _meta = mgr.restore(template)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.g_ema)),
        jax.tree_util.tree_leaves(jax.device_get(restored.g_ema)),
    ):
        np.testing.assert_array_equal(a, b)
