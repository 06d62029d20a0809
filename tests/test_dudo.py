"""Dual-domain unrolled MAR network (tmar/nn/dudo.py) + its fine-tune /
harness integration — the VERDICT acceptance criteria: fine-tunes on
synthetic data with loss decreasing, stage-freezing keeps frozen params
bit-identical, and the net produces a comparison-harness row through the
runner protocol."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmar.nn import DuDoMARNet
from tmar.ops import Radon

SIZE = 32
ANGLES = np.linspace(0, np.pi, 16, endpoint=False)


@pytest.fixture(scope="module")
def radon():
    return Radon(SIZE, ANGLES)


@pytest.fixture(scope="module")
def tiny_net(radon):
    return DuDoMARNet(projector=radon, stages=2, channels=8, blocks=1)


def _inputs(radon, b=2, seed=0):
    rng = np.random.default_rng(seed)
    xgt = rng.uniform(0, 1, (b, SIZE, SIZE, 1)).astype(np.float32)
    mask = np.zeros_like(xgt)
    mask[:, 12:16, 12:16] = 1.0
    xma = np.clip(xgt + 0.5 * mask + 0.05 * rng.normal(size=xgt.shape), 0, 2).astype(
        np.float32
    )
    xli = np.where(mask > 0, xgt.mean(), xma).astype(np.float32)
    stack = jnp.concatenate([xma[..., 0], xli[..., 0], mask[..., 0]], axis=0)
    sinos = np.asarray(radon.forward(stack))
    sma, sli, trace = sinos[:b], sinos[b : 2 * b], sinos[2 * b :]
    tr = (trace < 0.1).astype(np.float32)
    return dict(xma=xma, xli=xli, m=1.0 - mask, sma=sma, sli=sli, tr=tr, xgt=xgt)


def test_forward_shapes_and_finiteness(tiny_net, radon):
    d = _inputs(radon)
    vars_ = tiny_net.init(jax.random.PRNGKey(0), d["xma"], d["xli"], d["m"],
                          d["sma"], d["sli"], d["tr"])
    out = tiny_net.apply(vars_, d["xma"], d["xli"], d["m"], d["sma"], d["sli"], d["tr"])
    assert out["x"].shape == d["xma"].shape
    assert out["s"].shape == d["sma"].shape
    assert out["x_prior"].shape == d["xma"].shape
    assert len(out["xs"]) == 2
    for v in (out["x"], out["s"], out["x_prior"]):
        assert np.isfinite(np.asarray(v)).all()


def test_external_prior_bypasses_prior_net(tiny_net, radon):
    """InDuDoNet+ mode: an explicit x_prior short-circuits the prior U-Net."""
    d = _inputs(radon)
    vars_ = tiny_net.init(jax.random.PRNGKey(0), d["xma"], d["xli"], d["m"],
                          d["sma"], d["sli"], d["tr"])
    out = tiny_net.apply(vars_, d["xma"], d["xli"], d["m"], d["sma"], d["sli"],
                         d["tr"], x_prior=d["xli"])
    np.testing.assert_array_equal(np.asarray(out["x_prior"]), d["xli"])


def test_share_weights_halves_stage_params(radon):
    d = _inputs(radon)
    args = (d["xma"], d["xli"], d["m"], d["sma"], d["sli"], d["tr"])
    unshared = DuDoMARNet(projector=radon, stages=2, channels=8, blocks=1)
    shared = DuDoMARNet(projector=radon, stages=2, channels=8, blocks=1,
                        share_weights=True)
    pu = unshared.init(jax.random.PRNGKey(0), *args)["params"]
    ps = shared.init(jax.random.PRNGKey(0), *args)["params"]
    assert "prox_s_0" in pu and "prox_s_1" in pu
    assert "prox_s" in ps and "prox_s_1" not in ps


def test_gradients_flow_to_all_stages(tiny_net, radon):
    d = _inputs(radon)
    vars_ = tiny_net.init(jax.random.PRNGKey(0), d["xma"], d["xli"], d["m"],
                          d["sma"], d["sli"], d["tr"])

    def loss(params):
        out = tiny_net.apply({"params": params}, d["xma"], d["xli"], d["m"],
                             d["sma"], d["sli"], d["tr"])
        return jnp.mean(jnp.abs(out["x"] - d["xgt"]))

    grads = jax.grad(loss)(vars_["params"])
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = {
        "/".join(str(getattr(k, "key", k)) for k in path).split("/")[0]
        for path, g in leaves
        if float(jnp.max(jnp.abs(g))) > 0
    }
    for sub in ("prior_net", "prox_s_0", "prox_x_0", "prox_s_1", "prox_x_1",
                "eta1", "eta2", "alpha"):
        assert sub in nonzero, f"no gradient reached {sub}"


# ---------------------------------------------------------------- fine-tune
@pytest.fixture(scope="module")
def pairs_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dudo_pairs")
    art, cln = root / "artifact", root / "clean"
    os.makedirs(art)
    os.makedirs(cln)
    rng = np.random.default_rng(1)
    for i in range(8):
        gt_hu = rng.uniform(-1000, 800, (SIZE, SIZE)).astype(np.float32)
        ma_hu = gt_hu.copy()
        ma_hu[12:16, 12:16] += 2500.0
        ma_hu += rng.normal(0, 30, ma_hu.shape)
        np.save(art / f"{i}.npy", ma_hu)
        np.save(cln / f"{i}.npy", gt_hu)
    return str(art), str(cln)


def test_finetune_dual_domain_loss_decreases(pairs_root, tiny_net):
    from tmar.data import BenchmarkFinetuneDataset
    from tmar.train.finetune import finetune

    art, cln = pairs_root
    ds = BenchmarkFinetuneDataset(art, cln, patch_size=SIZE, mode="resize")
    result = finetune(tiny_net, ds, num_epochs=4, batch_size=4, lr=1e-3, seed=0)
    hist = result["history"]
    assert all(np.isfinite(h["loss"]) for h in hist)
    assert "sino" in hist[0], "dual-domain run must include the sinogram term"
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_finetune_stage_freezing(pairs_root, tiny_net):
    """Frozen prior-net + stage-0 params stay bit-identical; later stages
    train (reference --mepnet_freeze_stages, finetune_all_benchmarks.py:84)."""
    from tmar.data import BenchmarkFinetuneDataset
    from tmar.train.finetune import dudo_freeze_prefixes, finetune

    art, cln = pairs_root
    ds = BenchmarkFinetuneDataset(art, cln, patch_size=SIZE, mode="resize")
    prefixes = dudo_freeze_prefixes(1)
    assert set(prefixes) == {"prior_net", "prox_s_0", "prox_x_0"}

    init_params = jax.device_get(
        tiny_net.init(
            jax.random.PRNGKey(0),
            **{k: v for k, v in zip(
                ("xma", "xli", "m", "sma", "sli", "tr"),
                (jnp.zeros((1, SIZE, SIZE, 1)),) * 3
                + (jnp.zeros((1, 16, SIZE)),) * 2
                + (jnp.ones((1, 16, SIZE)),),
            )}
        )["params"]
    )
    result = finetune(tiny_net, ds, num_epochs=1, batch_size=4, lr=1e-3, seed=0,
                      freeze_prefixes=prefixes)
    final = jax.device_get(result["state"].params)

    def max_delta(sub):
        da = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(a - b))), init_params[sub], final[sub]
        )
        return max(jax.tree_util.tree_leaves(da))

    assert max_delta("prior_net") == 0.0
    assert max_delta("prox_s_0") == 0.0
    assert max_delta("prox_x_0") == 0.0
    assert max_delta("prox_s_1") > 0.0
    assert max_delta("prox_x_1") > 0.0


# ------------------------------------------------------------------ harness
def test_dudo_runner_through_harness_row(tiny_net, radon):
    from tmar.eval.adapters import enrich_sample, make_dudo_runner

    rng = np.random.default_rng(2)
    gt = rng.uniform(-1, 1, (SIZE, SIZE)).astype(np.float32)
    ct = np.clip(gt + 0.8 * (rng.uniform(size=gt.shape) > 0.98), -1, 1).astype(
        np.float32
    )
    sample = enrich_sample({"ct": ct, "gt": gt}, radon=radon)
    d = _inputs(radon, b=1)
    vars_ = tiny_net.init(jax.random.PRNGKey(0), d["xma"], d["xli"], d["m"],
                          d["sma"], d["sli"], d["tr"])
    run = make_dudo_runner(tiny_net, vars_["params"], li_mode="sample")
    out = run(sample)
    assert out.shape == (SIZE, SIZE)
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1

    # li_mode='train' (the CLI default) rebuilds XLI/SLI with the finetune
    # engine's mean-fill construction — the entry's per-model preprocessing
    run_tr = make_dudo_runner(tiny_net, vars_["params"], radon=radon,
                              li_mode="train")
    out_tr = run_tr(sample)
    assert out_tr.shape == (SIZE, SIZE)
    assert np.isfinite(out_tr).all() and 0 <= out_tr.min() and out_tr.max() <= 1
    # the rebuilt XLI really differs from the sample's (metal mean-filled)
    from tmar.data.finetune import create_li_image

    li_train = create_li_image(sample["Xma"], (sample["Mask"] > 0.5).astype(np.float32))
    assert np.abs(li_train - sample["XLI"]).max() > 1e-4

    with np.testing.assert_raises(ValueError):
        make_dudo_runner(tiny_net, vars_["params"], li_mode="train")  # no radon
    with np.testing.assert_raises(ValueError):
        make_dudo_runner(tiny_net, vars_["params"], li_mode="bogus")
