"""NGswin with fused Pallas attention == NGswin with XLA attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmar.nn import NGswin

pytestmark = pytest.mark.slow

TINY = dict(
    ngrams=(2, 2, 2, 2), embed_dim=32, depths=(2, 2, 2), num_heads=(2, 2, 2),
    dec_dim=32, dec_depths=2, dec_num_heads=2, window_size=8,
)


def test_pallas_model_matches_xla(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 1)).astype(np.float32))
    m_xla = NGswin(**TINY)
    m_pl = NGswin(**TINY, use_pallas_attention=True, pallas_interpret=True)
    params = m_xla.init(jax.random.PRNGKey(0), x)["params"]

    # identical parameter trees (fused path reuses the same params)
    p2 = m_pl.init(jax.random.PRNGKey(0), x)["params"]
    t1 = jax.tree_util.tree_structure(params)
    t2 = jax.tree_util.tree_structure(p2)
    assert t1 == t2

    out_xla = m_xla.apply({"params": params}, x)
    out_pl = m_pl.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_xla), atol=5e-5, rtol=1e-4
    )


def test_remat_model_matches(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 1)).astype(np.float32))
    m0 = NGswin(**TINY)
    m1 = NGswin(**TINY, remat=True)
    p = m0.init(jax.random.PRNGKey(0), x)["params"]
    np.testing.assert_array_equal(
        np.asarray(m0.apply({"params": p}, x)), np.asarray(m1.apply({"params": p}, x))
    )
    g = jax.grad(lambda pp: jnp.sum(m1.apply({"params": pp}, x) ** 2))(p)
    assert np.isfinite(float(jax.tree_util.tree_leaves(g)[0].sum()))


def test_pallas_backward_model_grad_matches_xla(rng):
    """attn_backward="pallas" (the bench training config: pallas fwd + the
    hand-written fused backward kernels) must produce the same gradients as
    the pure-XLA model."""
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 1)).astype(np.float32))
    m_xla = NGswin(**TINY)
    m_pl = NGswin(**TINY, use_pallas_attention=True, pallas_interpret=True,
                  attn_backward="pallas")
    params = m_xla.init(jax.random.PRNGKey(0), x)["params"]

    def loss(m, p):
        return jnp.sum(m.apply({"params": p}, x) ** 2)

    from jax.flatten_util import ravel_pytree

    g_xla = jax.grad(lambda p: loss(m_xla, p))(params)
    g_pl = jax.grad(lambda p: loss(m_pl, p))(params)
    flat_x, _ = ravel_pytree(g_xla)
    flat_p, _ = ravel_pytree(g_pl)
    scale = float(jnp.max(jnp.abs(flat_x))) + 1e-12
    np.testing.assert_allclose(
        np.asarray(flat_p) / scale, np.asarray(flat_x) / scale,
        atol=2e-4, rtol=5e-4,
    )


def test_ngram_megakernel_model_grad_matches_xla(rng, monkeypatch):
    """TMAR_NGRAM_FUSED=1 + attn_backward="pallas": context megakernel primal
    with the fused recompute backward — full-model outputs AND gradients must
    match the pure-XLA model."""
    monkeypatch.setenv("TMAR_NGRAM_FUSED", "1")
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 1)).astype(np.float32))
    m_xla = NGswin(**TINY)
    m_pl = NGswin(**TINY, use_pallas_attention=True, pallas_interpret=True,
                  attn_backward="pallas")
    params = m_xla.init(jax.random.PRNGKey(0), x)["params"]

    out_xla = m_xla.apply({"params": params}, x)
    out_pl = m_pl.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_xla), atol=5e-5, rtol=1e-4
    )

    def loss(m, p):
        out = m.apply({"params": p}, x)
        return jnp.mean(jnp.square(out)) + jnp.mean(jnp.abs(out))

    g_xla = jax.grad(lambda p: loss(m_xla, p))(params)
    g_pl = jax.grad(lambda p: loss(m_pl, p))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(g_xla)
    flat_p = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g_pl)
    )
    for k, a in flat_x:
        b = flat_p[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4,
            err_msg=jax.tree_util.keystr(k),
        )
