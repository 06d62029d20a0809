"""Equivalence of the fused n-gram context megakernel (tmar.ops.pallas_ngram)
against the unfused NGramContext composition (pads + sliding patches +
window attention + mean + merge), including the flagship's non-dividing
head count (dim/2 = 32, heads = 6 -> head_dim 5) and non-multiple-of-8
window grids."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmar.nn.ngram import NGramContext


def _make(dim, heads, wh, ww, ws=4, seed=0):
    module = NGramContext(
        dim=dim, window_size=ws, ngram=2, ngram_num_heads=heads,
        use_pallas=True, pallas_interpret=True,
    )
    rng = np.random.default_rng(seed)
    x = jnp.asarray(
        rng.standard_normal((2, wh * ws, ww * ws, dim)).astype(np.float32)
    )
    params = module.init(jax.random.PRNGKey(seed), x)["params"]
    return module, params, x


@pytest.mark.parametrize(
    "dim,heads,wh,ww",
    [
        (64, 6, 8, 8),    # flagship stage-1 geometry: head_dim 32//6 = 5
        (64, 4, 6, 5),    # stage-2 head count, odd/non-8 window grid
        (32, 2, 2, 2),    # smallest legal grid (reflection index == 0 edge)
    ],
)
def test_fused_ngram_context_matches_unfused(monkeypatch, dim, heads, wh, ww):
    module, params, x = _make(dim, heads, wh, ww)

    monkeypatch.setenv("TMAR_NGRAM_FUSED", "0")
    ref = module.apply({"params": params}, x)
    monkeypatch.setenv("TMAR_NGRAM_FUSED", "1")
    fused = module.apply({"params": params}, x)

    assert fused.shape == ref.shape == (2, wh, ww, dim)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=3e-5, rtol=3e-5
    )


def test_fused_ngram_context_grad_matches(monkeypatch):
    module, params, x = _make(64, 6, 4, 4)

    def loss(path_env, p, xx):
        monkeypatch.setenv("TMAR_NGRAM_FUSED", path_env)
        out = module.apply({"params": p}, xx)
        return jnp.sum(out * jnp.cos(out))

    g_ref = jax.grad(lambda p: loss("0", p, x))(params)
    g_fused = jax.grad(lambda p: loss("1", p, x))(params)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    assert len(flat_r) == len(flat_f)
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)

    gx_ref = jax.grad(lambda xx: loss("0", params, xx))(x)
    gx_fused = jax.grad(lambda xx: loss("1", params, xx))(x)
    np.testing.assert_allclose(
        np.asarray(gx_fused), np.asarray(gx_ref), atol=2e-5, rtol=2e-5
    )


def test_fused_ngram_param_tree_identical(monkeypatch):
    """Both paths must declare byte-identical parameter trees (checkpoint
    compatibility across the env gate)."""
    module = NGramContext(
        dim=64, window_size=4, ngram=2, ngram_num_heads=6,
        use_pallas=True, pallas_interpret=True,
    )
    x = jnp.zeros((1, 16, 16, 64))
    monkeypatch.setenv("TMAR_NGRAM_FUSED", "0")
    p0 = module.init(jax.random.PRNGKey(0), x)["params"]
    monkeypatch.setenv("TMAR_NGRAM_FUSED", "1")
    p1 = module.init(jax.random.PRNGKey(0), x)["params"]
    s0 = jax.tree_util.tree_structure(p0)
    s1 = jax.tree_util.tree_structure(p1)
    assert s0 == s1
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("dim,heads,wh,ww", [(64, 6, 4, 4), (64, 4, 3, 5), (32, 2, 2, 2)])
def test_fused_ngram_backward_kernel_matches_math(dim, heads, wh, ww):
    """backward="pallas" (fused recompute backward kernel) must match the
    jax.vjp of the composition math for ALL nine cotangents + the input."""
    from tmar.nn.window_attention import declare_attention_params  # noqa: F401
    from tmar.ops.attention import gather_rel_pos_bias, relative_position_index
    from tmar.ops.pallas_ngram import fused_ngram_context

    half = dim // 2
    hd = half // heads
    A = hd * heads
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((2, wh, ww, half)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((half, 3 * A)).astype(np.float32) * 0.2)
    bqkv = jnp.asarray(rng.standard_normal((3 * A,)).astype(np.float32) * 0.1)
    ls = jnp.asarray(rng.standard_normal((heads, 1, 1)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((9, heads)).astype(np.float32) * 0.02)
    bias = gather_rel_pos_bias(table, relative_position_index(2, 2), heads)
    wproj = jnp.asarray(rng.standard_normal((A, half)).astype(np.float32) * 0.2)
    bproj = jnp.asarray(rng.standard_normal((half,)).astype(np.float32) * 0.1)
    wmerge = jnp.asarray(rng.standard_normal((dim, dim)).astype(np.float32) * 0.2)
    bmerge = jnp.asarray(rng.standard_normal((dim,)).astype(np.float32) * 0.1)
    args = (u, wqkv, bqkv, ls, bias, wproj, bproj, wmerge, bmerge)

    def loss(mode, *a):
        out = fused_ngram_context(
            *a, heads, interpret=True, backward=mode,
        )
        return jnp.sum(out * jnp.cos(out))

    gp = jax.grad(lambda *a: loss("pallas", *a), argnums=tuple(range(9)))(*args)
    gm = jax.grad(lambda *a: loss(None, *a), argnums=tuple(range(9)))(*args)
    names = ["u", "wqkv", "bqkv", "logit_scale", "bias", "wproj", "bproj",
             "wmerge", "bmerge"]
    for nm, a, b in zip(names, gp, gm):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5, err_msg=nm
        )


def test_fused_ngram_bf16_dtype_plumbing(monkeypatch):
    """bf16 module dtype through the megakernel primal AND the fused
    recompute backward (interpret): the fused path must agree with the
    unfused composition at the same dtype, and emit finite cotangents of
    the parameters' own dtypes."""
    module = NGramContext(
        dim=64, window_size=4, ngram=2, ngram_num_heads=6,
        use_pallas=True, pallas_interpret=True, dtype=jnp.bfloat16,
        attn_backward="pallas",
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64)).astype(np.float32))
    params = module.init(jax.random.PRNGKey(0), x)["params"]

    monkeypatch.setenv("TMAR_NGRAM_FUSED", "0")
    ref = module.apply({"params": params}, x)
    monkeypatch.setenv("TMAR_NGRAM_FUSED", "1")
    fused = module.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )

    def loss(p):
        out = module.apply({"params": p}, x)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    grads = jax.grad(loss)(params)
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        leaf = params
        for k in path:
            leaf = leaf[k.key]
        assert g.dtype == leaf.dtype, jax.tree_util.keystr(path)
        assert np.isfinite(np.asarray(g, np.float32)).all(), (
            jax.tree_util.keystr(path)
        )


@pytest.mark.parametrize("wh,ww,stripes", [(8, 8, 2), (8, 8, 4), (6, 5, 3), (4, 4, 2)])
def test_striped_forward_matches_single_stripe(wh, ww, stripes):
    """The striped kernel (grid over window-rows with ±1-row halo) must be
    exact vs the single-stripe whole-map evaluation for middle/first/last
    stripe variants, incl. the seq_refl boundary rows."""
    from tmar.ops.attention import gather_rel_pos_bias, relative_position_index
    from tmar.ops.pallas_ngram import fused_ngram_context

    dim, heads = 64, 6
    half = dim // 2
    A = (half // heads) * heads
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((2, wh, ww, half)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((half, 3 * A)).astype(np.float32) * 0.2)
    bqkv = jnp.asarray(rng.standard_normal((3 * A,)).astype(np.float32) * 0.1)
    ls = jnp.asarray(rng.standard_normal((heads, 1, 1)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((9, heads)).astype(np.float32) * 0.02)
    bias = gather_rel_pos_bias(table, relative_position_index(2, 2), heads)
    wproj = jnp.asarray(rng.standard_normal((A, half)).astype(np.float32) * 0.2)
    bproj = jnp.asarray(rng.standard_normal((half,)).astype(np.float32) * 0.1)
    wmerge = jnp.asarray(rng.standard_normal((dim, dim)).astype(np.float32) * 0.2)
    bmerge = jnp.asarray(rng.standard_normal((dim,)).astype(np.float32) * 0.1)
    args = (u, wqkv, bqkv, ls, bias, wproj, bproj, wmerge, bmerge)

    whole = fused_ngram_context(*args, heads, interpret=True, stripe_rows=wh)
    striped = fused_ngram_context(
        *args, heads, interpret=True, stripe_rows=wh // stripes
    )
    # interpret-mode matmul blocking varies with row count (RE differs per
    # stripe choice) => f32 noise, not a stripe-logic error
    np.testing.assert_allclose(
        np.asarray(striped), np.asarray(whole), atol=1e-5, rtol=0
    )


def test_default_stripe_geometry_matches_math(monkeypatch):
    """A geometry whose DEFAULT stripe choice is multi-stripe (24x24 grid,
    wh*ww > 512 => S=12, 2 stripes) must match the unfused composition."""
    from tmar.nn.ngram import NGramContext
    from tmar.ops.pallas_ngram import _stripe_rows

    assert _stripe_rows(24, 24) == 12         # actually striped (2 stripes)
    assert _stripe_rows(64, 64) == 8          # 512² stage-1 geometry
    assert 64 % _stripe_rows(64, 64) == 0

    module = NGramContext(
        dim=32, window_size=4, ngram=2, ngram_num_heads=2,
        use_pallas=True, pallas_interpret=True,
    )
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 96, 96, 32)).astype(np.float32))
    params = module.init(jax.random.PRNGKey(0), x)["params"]

    monkeypatch.setenv("TMAR_NGRAM_FUSED", "1")
    fused = module.apply({"params": params}, x)
    monkeypatch.setenv("TMAR_NGRAM_FUSED", "0")
    ref = module.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=3e-5, rtol=3e-5
    )


def _rand_args(dim, heads, wh, ww, seed=7):
    from tmar.ops.attention import gather_rel_pos_bias, relative_position_index

    half = dim // 2
    A = (half // heads) * heads
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal((2, wh, ww, half)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((half, 3 * A)).astype(np.float32) * 0.2)
    bqkv = jnp.asarray(rng.standard_normal((3 * A,)).astype(np.float32) * 0.1)
    ls = jnp.asarray(rng.standard_normal((heads, 1, 1)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((9, heads)).astype(np.float32) * 0.02)
    bias = gather_rel_pos_bias(table, relative_position_index(2, 2), heads)
    wproj = jnp.asarray(rng.standard_normal((A, half)).astype(np.float32) * 0.2)
    bproj = jnp.asarray(rng.standard_normal((half,)).astype(np.float32) * 0.1)
    wmerge = jnp.asarray(rng.standard_normal((dim, dim)).astype(np.float32) * 0.2)
    bmerge = jnp.asarray(rng.standard_normal((dim,)).astype(np.float32) * 0.1)
    return (u, wqkv, bqkv, ls, bias, wproj, bproj, wmerge, bmerge)


@pytest.mark.parametrize(
    "wh,ww,stripes",
    [
        (8, 8, 2),     # middle/first/last stripe variants
        (8, 8, 4),     # single-halo-dominated stripes
        (6, 5, 3),     # odd ww (packed-reshape detour) + S=2 minimum
        (4, 4, 2),
    ],
)
def test_striped_backward_matches_math(wh, ww, stripes):
    """The STRIPED recompute backward (grid over window-rows, du halo
    assembly on the host) must match the jax.vjp of the composition for all
    nine parameter cotangents + the input at multi-stripe geometries —
    the r2 whole-map backward was gated to ≤32×32 grids (VERDICT r2 #5)."""
    from tmar.ops.pallas_ngram import fused_ngram_context

    heads = 6
    args = _rand_args(64, heads, wh, ww)

    def loss(mode, S, *a):
        out = fused_ngram_context(
            *a, heads, interpret=True, backward=mode, stripe_rows=S,
        )
        return jnp.sum(out * jnp.cos(out))

    S = wh // stripes
    gp = jax.grad(
        lambda *a: loss("pallas", S, *a), argnums=tuple(range(9))
    )(*args)
    gm = jax.grad(lambda *a: loss(None, None, *a), argnums=tuple(range(9)))(*args)
    names = ["u", "wqkv", "bqkv", "logit_scale", "bias", "wproj", "bproj",
             "wmerge", "bmerge"]
    for nm, a, b in zip(names, gp, gm):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5, err_msg=nm
        )


@pytest.mark.slow
def test_fullslice_grid_striped_backward_matches_math():
    """The 416² full-slice geometry (52×52 window grid — the exact shape the
    r2 gate silently demoted to the composition backward) through the
    DEFAULT stripe choice: grads must match the composition vjp."""
    from tmar.ops.pallas_ngram import _stripe_rows, fused_ngram_context

    wh = ww = 52
    heads = 6
    S = _stripe_rows(wh, ww)
    assert S < wh and wh % S == 0  # really multi-stripe at this size
    args = _rand_args(64, heads, wh, ww, seed=13)

    def loss(mode, *a):
        out = fused_ngram_context(*a, heads, interpret=True, backward=mode)
        return jnp.sum(out * jnp.cos(out))

    gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 3, 7))(*args)
    gm = jax.grad(lambda *a: loss(None, *a), argnums=(0, 1, 3, 7))(*args)
    for nm, a, b in zip(["u", "wqkv", "logit_scale", "wmerge"], gp, gm):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=nm
        )


@pytest.mark.slow
def test_flagship_grid_striping_exact():
    """The DEFAULT stripe choice at the 512² stage-1 geometry (64x64 grid
    -> S=8, 8 stripes) must reproduce the whole-map evaluation exactly
    (same per-row math; only the gridding differs)."""
    from tmar.ops.attention import gather_rel_pos_bias, relative_position_index
    from tmar.ops.pallas_ngram import fused_ngram_context, _stripe_rows

    dim, heads, wh, ww = 64, 6, 64, 64
    half = dim // 2
    A = (half // heads) * heads
    rng = np.random.default_rng(42)
    u = jnp.asarray(rng.standard_normal((1, wh, ww, half)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((half, 3 * A)).astype(np.float32) * 0.2)
    bqkv = jnp.asarray(rng.standard_normal((3 * A,)).astype(np.float32) * 0.1)
    ls = jnp.asarray(rng.standard_normal((heads, 1, 1)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((9, heads)).astype(np.float32) * 0.02)
    bias = gather_rel_pos_bias(table, relative_position_index(2, 2), heads)
    wproj = jnp.asarray(rng.standard_normal((A, half)).astype(np.float32) * 0.2)
    bproj = jnp.asarray(rng.standard_normal((half,)).astype(np.float32) * 0.1)
    wmerge = jnp.asarray(rng.standard_normal((dim, dim)).astype(np.float32) * 0.2)
    bmerge = jnp.asarray(rng.standard_normal((dim,)).astype(np.float32) * 0.1)
    args = (u, wqkv, bqkv, ls, bias, wproj, bproj, wmerge, bmerge)

    assert _stripe_rows(wh, ww) == 8
    striped = fused_ngram_context(*args, heads, interpret=True)
    whole = fused_ngram_context(*args, heads, interpret=True, stripe_rows=wh)
    np.testing.assert_allclose(
        np.asarray(striped), np.asarray(whole), atol=1e-5, rtol=0
    )
