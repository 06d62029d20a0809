"""Fused NSTB kernel (tmar.ops.pallas_nstb): quadrant context
reconstruction, forward equivalence vs the unfused module path, gradients
through the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmar.nn.blocks import NSTB
from tmar.ops.pallas_nstb import context_quads, quadrant_selector


def test_quadrant_selector_shift0():
    sel = quadrant_selector(8, 0)
    assert sel.shape == (64, 4)
    np.testing.assert_array_equal(sel[:, 0], np.ones(64))
    np.testing.assert_array_equal(sel[:, 1:], np.zeros((64, 3)))


def test_quadrant_selector_shift4():
    sel = quadrant_selector(8, 4)
    # token (r, c): quadrant (r >= 4, c >= 4)
    for r in range(8):
        for c in range(8):
            q = 2 * (r >= 4) + (c >= 4)
            expect = np.zeros(4)
            expect[q] = 1.0
            np.testing.assert_array_equal(sel[r * 8 + c], expect)


def test_context_quads_matches_preadd_shift():
    """Reconstructing the per-token context from the quadrant stack must
    equal adding the context pre-shift then rolling."""
    rng = np.random.default_rng(0)
    B, wh, ww, ws, D = 2, 4, 4, 8, 6
    ph, pw = wh * ws, ww * ws
    x = jnp.asarray(rng.normal(size=(B, ph, pw, D)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(B, wh, ww, D)).astype(np.float32))
    for shift in (0, 4):
        # reference: add per window, then roll
        xw = x.reshape(B, wh, ws, ww, ws, D) + ctx[:, :, None, :, None, :]
        ref = jnp.roll(
            xw.reshape(B, ph, pw, D), (-shift, -shift), axis=(1, 2)
        )
        ref_win = (
            ref.reshape(B, wh, ws, ww, ws, D)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B * wh * ww, ws * ws, D)
        )
        # fused-path: roll x alone, reconstruct ctx from quads
        rolled = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        win = (
            rolled.reshape(B, wh, ws, ww, ws, D)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B * wh * ww, ws * ws, D)
        )
        cq = context_quads(ctx, shift).reshape(B * wh * ww, 4, D)
        sel = jnp.asarray(quadrant_selector(ws, shift))
        got = win + jnp.einsum("nq,bqd->bnd", sel, cq)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref_win), atol=1e-6)


@pytest.mark.parametrize("mapmode", ["0", "1"])
@pytest.mark.parametrize("shift", [0, 4])
def test_fused_nstb_matches_unfused(monkeypatch, shift, mapmode):
    rng = np.random.default_rng(1)
    B, ph, pw, D = 2, 16, 24, 8
    blk = NSTB(dim=D, ngram=2, num_heads=2, window_size=8, shift_size=shift,
               use_pallas=True, pallas_interpret=True)
    x = jnp.asarray(rng.normal(size=(B, ph * pw, D)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, (ph, pw))["params"]

    monkeypatch.setenv("TMAR_NSTB_FUSED", "1")
    monkeypatch.setenv("TMAR_NSTB_MAP", mapmode)
    _, fused = blk.apply({"params": params}, x, (ph, pw))
    monkeypatch.setenv("TMAR_NSTB_FUSED", "0")
    _, unfused = blk.apply({"params": params}, x, (ph, pw))
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(unfused), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("mapmode", ["0", "1"])
def test_fused_nstb_grad_matches(monkeypatch, mapmode):
    rng = np.random.default_rng(2)
    B, ph, pw, D = 1, 16, 16, 8
    blk = NSTB(dim=D, ngram=2, num_heads=2, window_size=8, shift_size=4,
               use_pallas=True, pallas_interpret=True)
    x = jnp.asarray(rng.normal(size=(B, ph * pw, D)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, (ph, pw))["params"]
    monkeypatch.setenv("TMAR_NSTB_MAP", mapmode)

    def loss(p, xx, fused):
        monkeypatch.setenv("TMAR_NSTB_FUSED", "1" if fused else "0")
        _, out = blk.apply({"params": p}, xx, (ph, pw))
        return jnp.sum(out * out)

    g1 = jax.grad(loss)(params, x, True)
    g0 = jax.grad(loss)(params, x, False)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat0 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g0)}
    for k, v in flat1:
        ref = flat0[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref), atol=5e-4, rtol=5e-4,
            err_msg=jax.tree_util.keystr(k),
        )


@pytest.mark.parametrize("mapmode", ["0", "1"])
def test_fused_nstb_finite_at_saturated_logit_scale(monkeypatch, mapmode):
    """With logit_scale at its ln(100) clamp the logits reach ~100; the
    softmax must stay finite (a max-free-softmax variant regressed here —
    entire rows can underflow because cos(q_i, k_i) != 1)."""
    rng = np.random.default_rng(7)
    B, ph, pw, D = 1, 16, 16, 8
    blk = NSTB(dim=D, ngram=2, num_heads=2, window_size=8, shift_size=4,
               use_pallas=True, pallas_interpret=True)
    x = jnp.asarray(rng.normal(size=(B, ph * pw, D)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, (ph, pw))["params"]
    params = jax.tree_util.tree_map(lambda v: v, params)
    # saturate every logit_scale in the tree
    def saturate(path, leaf):
        if path[-1].key == "logit_scale":
            return jnp.full_like(leaf, 10.0)  # exp(clip(10)) -> 100
        return leaf
    params = jax.tree_util.tree_map_with_path(saturate, params)

    monkeypatch.setenv("TMAR_NSTB_FUSED", "1")
    monkeypatch.setenv("TMAR_NSTB_MAP", mapmode)
    _, fused = blk.apply({"params": params}, x, (ph, pw))
    assert np.isfinite(np.asarray(fused)).all()
    monkeypatch.setenv("TMAR_NSTB_FUSED", "0")
    _, unfused = blk.apply({"params": params}, x, (ph, pw))
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(unfused), atol=5e-5, rtol=5e-5
    )


@pytest.mark.parametrize("shift", [0, 4])
def test_fused_nstb_map_odd_stripe(monkeypatch, shift):
    """Odd windows-per-stripe (ww=3 here; stage 3 of a 416² slice is ww=13):
    the map kernel's context-quad block is padded to an even window count
    host-side and sliced back in-kernel (Mosaic needs Tw·4 divisible by 8)."""
    rng = np.random.default_rng(3)
    B, ph, pw, D = 2, 16, 24, 8
    blk = NSTB(dim=D, ngram=2, num_heads=2, window_size=8, shift_size=shift,
               use_pallas=True, pallas_interpret=True)
    x = jnp.asarray(rng.normal(size=(B, ph * pw, D)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, (ph, pw))["params"]

    monkeypatch.setenv("TMAR_NSTB_FUSED", "1")
    monkeypatch.setenv("TMAR_NSTB_MAP", "1")
    monkeypatch.setenv("TMAR_NSTB_TMAX", "3")  # force Tw=3 (odd) stripes
    _, fused = blk.apply({"params": params}, x, (ph, pw))
    monkeypatch.setenv("TMAR_NSTB_FUSED", "0")
    _, unfused = blk.apply({"params": params}, x, (ph, pw))
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(unfused), atol=2e-5, rtol=2e-5
    )
