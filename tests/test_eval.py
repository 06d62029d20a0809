"""Tests for eval metrics and inference paths."""

import numpy as np
import pytest

from tmar.eval import (
    compute_hu_accuracy,
    compute_regional_metrics,
    full_slice_eval,
    hu_tolerance_rates,
    mae,
    psnr,
    rmse,
    ssim,
    tiled_eval,
)


def _ssim_bruteforce(x, y, data_range=1.0, win=7):
    """Independent sliding-window SSIM (sample covariance, border-cropped)."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    H, W = x.shape
    vals = []
    n = win * win
    for i in range(H - win + 1):
        for j in range(W - win + 1):
            a = x[i : i + win, j : j + win].astype(np.float64)
            b = y[i : i + win, j : j + win].astype(np.float64)
            ua, ub = a.mean(), b.mean()
            va = ((a - ua) ** 2).sum() / (n - 1)
            vb = ((b - ub) ** 2).sum() / (n - 1)
            cov = ((a - ua) * (b - ub)).sum() / (n - 1)
            vals.append(
                ((2 * ua * ub + c1) * (2 * cov + c2))
                / ((ua**2 + ub**2 + c1) * (va + vb + c2))
            )
    return float(np.mean(vals))


def test_psnr_basics(rng):
    x = rng.random((32, 32))
    assert psnr(x, x) == float("inf")
    y = x + 0.1
    np.testing.assert_allclose(psnr(x, y), 20.0, atol=1e-6)  # mse=0.01, range 1
    np.testing.assert_allclose(psnr(x, y, data_range=2.0), 26.0206, atol=1e-3)


def test_ssim_identity_and_bruteforce(rng):
    x = rng.random((24, 24)).astype(np.float32)
    assert abs(ssim(x, x) - 1.0) < 1e-9
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
    fast = ssim(x, y)
    slow = _ssim_bruteforce(x, y)
    np.testing.assert_allclose(fast, slow, atol=1e-6)
    assert fast < 1.0


def test_mae_rmse(rng):
    x, y = rng.random((8, 8)), rng.random((8, 8))
    np.testing.assert_allclose(mae(x, y), np.abs(x - y).mean())
    np.testing.assert_allclose(rmse(x, y), np.sqrt(((x - y) ** 2).mean()))


def test_regional_metrics(rng):
    ct = rng.uniform(-1, 0.5, (64, 64)).astype(np.float32)
    ct[30:34, 30:34] = 0.9  # metal
    pred = rng.uniform(-1, 1, (64, 64)).astype(np.float32)
    target = pred.copy()
    target[30:34, 30:34] += 0.5  # error only inside metal
    out = compute_regional_metrics(pred, target, ct, radius=3)
    assert out["metal_MSE"] > 0
    assert out["non_metal_MSE"] == 0.0
    assert out["metal_PSNR"] < out["non_metal_PSNR"] or out["non_metal_PSNR"] == 10 * np.log10(4.0 / 1e-10)


def test_hu_metrics():
    target = np.full((16, 16), 0.25, np.float32)   # 0 HU, soft tissue
    pred = target + 0.005                          # +20 HU error
    out = compute_hu_accuracy(pred, target)
    np.testing.assert_allclose(out["overall_HU_MAE"], 20.0, atol=1e-4)
    np.testing.assert_allclose(out["soft_tissue_HU_MAE"], 20.0, atol=1e-4)
    rates = hu_tolerance_rates(pred, target)
    assert rates["within_10HU"] == 0.0
    assert rates["within_20HU"] == 1.0
    assert rates["within_50HU"] == 1.0


def test_tiled_eval_identity():
    """With an identity 'model', tiled accumulation must reproduce the input."""
    rng = np.random.default_rng(0)
    ct = rng.standard_normal((2, 100, 80, 1)).astype(np.float32)
    out = tiled_eval(lambda x: x, ct, tile=32, stride=16, tile_batch=8)
    np.testing.assert_allclose(out, ct, atol=1e-6)
    out2 = full_slice_eval(lambda x: x, ct)
    np.testing.assert_allclose(out2, ct)


def test_tiled_eval_matches_model(rng):
    """Tiled inference of a linear shift-invariant 'model' == full-slice."""
    f = lambda x: 0.5 * x + 0.25
    ct = rng.standard_normal((1, 64, 64, 1)).astype(np.float32)
    out_tiled = tiled_eval(f, ct, tile=32, stride=16, tile_batch=4)
    np.testing.assert_allclose(out_tiled, f(ct), atol=1e-6)


def test_device_profile_rows():
    import jax
    import jax.numpy as jnp

    from tmar.utils.profiling import device_profile

    rows = device_profile(jax.jit(lambda x: (x @ x).sum()), jnp.ones((128, 128)))
    assert rows and all({"op", "ms", "count"} <= set(r) for r in rows)
    assert any(r["op"] == "dot_general" or "dot" in r["op"] for r in rows)


def test_tiled_eval_jit_matches_host_path(rng):
    """Device-side tiled eval (one-jit extraction+forward+assembly) must
    equal the host-assembled tiled_eval for the same forward."""
    import jax
    import jax.numpy as jnp

    from tmar.eval.inference import make_tiled_eval_jit, tiled_eval
    from tmar.nn import NGswin

    gen = NGswin(ngrams=(2, 2, 2, 2), embed_dim=32, depths=(2, 2, 2),
                 num_heads=(2, 2, 2), dec_dim=32, dec_depths=2,
                 dec_num_heads=2, window_size=8)
    ct = rng.uniform(-1, 1, (2, 96, 96, 1)).astype(np.float32)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), jnp.asarray(ct))["params"]
    fwd = jax.jit(lambda t: gen.apply({"params": params}, t))

    host = tiled_eval(lambda t: np.asarray(fwd(jnp.asarray(t))), ct,
                      tile=64, stride=32)
    dev = make_tiled_eval_jit(gen, params, tile=64, stride=32)(ct)
    np.testing.assert_allclose(dev, host, atol=2e-5, rtol=1e-4)


def test_tiled_eval_jit_unaligned_geometry(rng):
    """A geometry with a tail tile ((H − tile) % stride != 0) takes the
    general scatter-add path; it must still equal the host assembly.
    The aligned phase-grouped fast path is covered by the 96² test above."""
    import jax
    import jax.numpy as jnp

    from tmar.eval.inference import make_tiled_eval_jit, tiled_eval
    from tmar.nn import NGswin

    gen = NGswin(ngrams=(2, 2, 2, 2), embed_dim=32, depths=(1, 1, 1),
                 num_heads=(2, 2, 2), dec_dim=32, dec_depths=1,
                 dec_num_heads=2, window_size=8)
    ct = rng.uniform(-1, 1, (1, 100, 84, 1)).astype(np.float32)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1))
    )["params"]
    fwd = jax.jit(lambda t: gen.apply({"params": params}, t))

    host = tiled_eval(lambda t: np.asarray(fwd(jnp.asarray(t))), ct,
                      tile=64, stride=32)
    dev = make_tiled_eval_jit(gen, params, tile=64, stride=32)(ct)
    np.testing.assert_allclose(dev, host, atol=2e-5, rtol=1e-4)
