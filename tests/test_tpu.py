"""On-hardware test tier (VERDICT r1 item 3): real Mosaic lowerings + bf16
numerics for the fused kernels, and the Radon operator's adjoint identity,
asserted ON the TPU rather than in CPU interpret mode.

Run with::

    TMAR_TESTS_TPU=1 python -m pytest tests/test_tpu.py -m tpu -q

Under the default (CPU-pinned) test platform every test here auto-skips.
Tolerances: f32 paths are tight; bf16 paths use bf16-scale tolerances (the
compute-dtype dots accumulate in f32 but round operands to 8-bit mantissa).
A Mosaic lowering regression — the failure mode bench.py cannot assert —
fails these tests instead of silently shipping slower-or-NaN kernels.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

if jax.default_backend() == "cpu":
    pytest.skip("on-TPU tier needs real hardware (TMAR_TESTS_TPU=1)",
                allow_module_level=True)

from tmar.ops.attention import (  # noqa: E402
    gather_rel_pos_bias,
    relative_position_index,
    window_attention_math,
)
from tmar.ops.pallas_attention import fused_window_attention  # noqa: E402
from tmar.ops.window import shift_mask_components  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def _assert_same_precision_class(got, baseline, truth, names, factor=1.5):
    """Assert each ``got`` cotangent is as close to the HIGHEST-precision
    ``truth`` as the default-precision XLA ``baseline`` is (within
    ``factor``, plus a small truth-scaled floor for cotangents the baseline
    happens to nail exactly).  This is the meaningful on-chip equivalence
    statement for kernels whose bf16-operand dots match the XLA path's own
    precision class — fixed elementwise tolerances fail BOTH paths on
    large-row-sum gradients."""
    for nm, a, b, t in zip(names, got, baseline, truth):
        a, b, t = (np.asarray(v, np.float64) for v in (a, b, t))
        scale = max(float(np.abs(t).max()), 1e-9)
        err_got = float(np.abs(a - t).max())
        err_base = float(np.abs(b - t).max())
        assert err_got <= factor * err_base + 1e-3 * scale, (
            f"{nm}: fused err {err_got:.6f} vs xla err {err_base:.6f} "
            f"(|truth|max {scale:.3f}) — worse precision class"
        )


def _attn_operands(rng, ws=8, nh=3, hd=10, D=32, wh=2, ww=2, B=2):
    N = ws * ws
    A = nh * hd
    B_ = B * wh * ww
    x = rng.standard_normal((B_, N, D)).astype(np.float32)
    wqkv = rng.standard_normal((D, 3 * A)).astype(np.float32) * 0.1
    bqkv = rng.standard_normal((3 * A,)).astype(np.float32) * 0.1
    ls = rng.standard_normal((nh, 1, 1)).astype(np.float32)
    table = rng.standard_normal(((2 * ws - 1) ** 2, nh)).astype(np.float32) * 0.02
    bias = gather_rel_pos_bias(
        jnp.asarray(table), relative_position_index(ws, ws), nh
    )
    wproj = rng.standard_normal((A, D)).astype(np.float32) * 0.1
    bproj = rng.standard_normal((D,)).astype(np.float32) * 0.1
    return map(jnp.asarray, (x, wqkv, bqkv, ls)), bias, map(
        jnp.asarray, (wproj, bproj)
    ), (nh, ws, wh, ww)


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 3e-3), (jnp.bfloat16, 6e-2)])
def test_fused_attention_matches_xla_on_chip(rng, dtype, atol):
    """Real-hardware fused window attention (shifted) vs the XLA math at the
    SAME input dtype — covers the Mosaic batched/blockdiag lowerings and the
    compute-dtype (bf16) score/AV dots."""
    (x, wqkv, bqkv, ls), bias, (wproj, bproj), (nh, ws, wh, ww) = _attn_operands(rng)
    m_row, m_col = shift_mask_components(ws, 4)
    mc = (m_row, m_col, wh, ww)
    xt = x.astype(dtype)

    ref = jax.jit(
        lambda x_: window_attention_math(
            x_, wqkv, bqkv, ls, bias, wproj, bproj, nh, mask_components=mc
        )
    )(xt)
    fused = jax.jit(
        lambda x_: fused_window_attention(
            x_, wqkv, bqkv, ls, bias, wproj, bproj, nh,
            mask_components=mc, windows_per_step=4,
        )
    )(xt)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(ref, np.float32),
        atol=atol, rtol=atol,
    )


@pytest.mark.parametrize("impl", ["batched", "blockdiag"])
def test_attention_impls_agree_on_chip(rng, impl):
    """Both production kernel impls lower and agree with XLA on hardware."""
    (x, wqkv, bqkv, ls), bias, (wproj, bproj), (nh, ws, wh, ww) = _attn_operands(rng)
    ref = jax.jit(
        lambda x_: window_attention_math(
            x_, wqkv, bqkv, ls, bias, wproj, bproj, nh
        )
    )(x)
    fused = jax.jit(
        lambda x_: fused_window_attention(
            x_, wqkv, bqkv, ls, bias, wproj, bproj, nh,
            windows_per_step=4, impl=impl,
        )
    )(x)
    # f32 *inputs*, but on TPU both paths run their dots with bf16 operands
    # (XLA default matmul precision / the kernels' compute_dtype), so the
    # agreement scale is bf16 rounding (measured max delta ~7e-4)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=3e-3, rtol=3e-3
    )


@pytest.mark.parametrize("mapmode", ["0", "1"])
@pytest.mark.parametrize("geometry", [(2, 32, 32, 64), (1, 104, 104, 64)])
def test_fused_nstb_matches_unfused_on_chip(rng, mapmode, geometry, monkeypatch):
    """Whole-NSTB fused kernel (context quads + attention + FFN) on real
    hardware vs the unfused module path, f32 (exact-path check).

    The 104² geometry is stage 3 of a 416² slice: 13 windows/row — an ODD
    stripe count whose context-quad block needs the even-padding path to
    satisfy Mosaic's (8, 128) block divisibility (regression: 416² eval
    failed to lower before the fix)."""
    from tmar.nn.blocks import NSTB

    # production-like geometry: real Mosaic requires block last-two dims
    # divisible by (8, 128) or equal to the array dims — the interpret-mode
    # tiny shapes (D=8, pw=24) do NOT lower on hardware
    B, ph, pw, D = geometry
    blk = NSTB(dim=D, ngram=2, num_heads=2, window_size=8, shift_size=4,
               use_pallas=True)
    x = jnp.asarray(rng.standard_normal((B, ph * pw, D)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, (ph, pw))["params"]

    monkeypatch.setenv("TMAR_NSTB_FUSED", "1")
    monkeypatch.setenv("TMAR_NSTB_MAP", mapmode)
    _, fused = jax.jit(lambda p, xx: blk.apply({"params": p}, xx, (ph, pw)))(params, x)
    monkeypatch.setenv("TMAR_NSTB_FUSED", "0")
    _, unfused = jax.jit(lambda p, xx: blk.apply({"params": p}, xx, (ph, pw)))(params, x)
    # A whole block (LN → attn → residual → LN → GELU-FFN) amplifies the
    # bf16-operand dot noise: measured on-chip, BOTH paths sit 0.065 from
    # the matmul_precision('highest') reference (outputs |max| ≈ 7.8) and
    # 0.036 from each other — identical precision class, no kernel error.
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(unfused), atol=5e-2, rtol=5e-2
    )


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 5e-3), (jnp.bfloat16, 6e-2)])
@pytest.mark.parametrize("grid", [(8, 8), (13, 13), (64, 64)])
def test_fused_ngram_context_on_chip(rng, dtype, atol, grid, monkeypatch):
    """N-gram context megakernel (tmar.ops.pallas_ngram) on real hardware vs
    the unfused composition — covers the reflect-spliced shifted-map halo
    logic, the one-hot head matmuls (head_dim 5 at the flagship's 32/6
    split), the odd 13x13 grid of a 416² slice's stage 3, and the 64x64
    512² stage-1 grid that exercises the MULTI-STRIPE path (8 row-stripes,
    halo BlockSpecs + boundary-variant selects)."""
    from tmar.nn.ngram import NGramContext

    wh, ww = grid
    ws, D = 8, 64
    module = NGramContext(
        dim=D, window_size=ws, ngram=2, ngram_num_heads=6,
        use_pallas=True, dtype=dtype,
    )
    x = jnp.asarray(
        rng.standard_normal((2, wh * ws, ww * ws, D)).astype(np.float32)
    )
    params = module.init(jax.random.PRNGKey(0), x)["params"]

    monkeypatch.setenv("TMAR_NGRAM_FUSED", "1")
    fused = jax.jit(lambda p, xx: module.apply({"params": p}, xx))(params, x)
    monkeypatch.setenv("TMAR_NGRAM_FUSED", "0")
    ref = jax.jit(lambda p, xx: module.apply({"params": p}, xx))(params, x)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(ref, np.float32),
        atol=atol, rtol=atol,
    )


def test_saturated_logit_scale_finite_on_chip(rng):
    """ln(100)-clamped logit scale => logits ~100: the on-chip softmax must
    stay finite (the reverted max-free softmax would NaN exactly here)."""
    (x, wqkv, bqkv, _ls), bias, (wproj, bproj), (nh, ws, wh, ww) = _attn_operands(rng)
    ls_sat = jnp.full((nh, 1, 1), float(np.log(100.0)))
    for dtype in (jnp.float32, jnp.bfloat16):
        out = jax.jit(
            lambda x_: fused_window_attention(
                x_, wqkv, bqkv, ls_sat, bias, wproj, bproj, nh,
                windows_per_step=4,
            )
        )(x.astype(dtype))
        assert np.isfinite(np.asarray(out, np.float32)).all(), dtype


def test_fused_ffn_matches_on_chip(rng):
    from tmar.ops.pallas_ffn import ffn_math, fused_residual_ffn

    M, D, H = 512, 32, 64
    x = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    ao = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    g1 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1 + 1)
    b1 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((D, H)).astype(np.float32) * 0.1)
    bb1 = jnp.asarray(rng.standard_normal((H,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((H, D)).astype(np.float32) * 0.1)
    bb2 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    g2 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1 + 1)
    b2 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    ref = jax.jit(ffn_math)(x, ao, g1, b1, w1, bb1, w2, bb2, g2, b2)
    got = jax.jit(
        lambda *a: fused_residual_ffn(*a, block_rows=256)
    )(x, ao, g1, b1, w1, bb1, w2, bb2, g2, b2)
    # measured on-chip delta vs the default-precision XLA path: 5.5e-4 on
    # outputs of magnitude ~7 (bf16-operand dots both sides)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3, rtol=3e-3)


def test_fused_ffn_backward_on_chip(rng):
    """Fused FFN recompute-backward kernel vs jax.vjp of the math path on
    real hardware (bf16-operand dots both sides)."""
    from tmar.ops.pallas_ffn import ffn_math, fused_residual_ffn

    M, D, H = 1024, 64, 128
    x = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    ao = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    g1 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1 + 1)
    b1 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((D, H)).astype(np.float32) * 0.1)
    bb1 = jnp.asarray(rng.standard_normal((H,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((H, D)).astype(np.float32) * 0.1)
    bb2 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    g2 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1 + 1)
    b2 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    args = (x, ao, g1, b1, w1, bb1, w2, bb2, g2, b2)

    def loss_pallas(*a):
        out = fused_residual_ffn(*a, backward="pallas")
        return jnp.sum(out * jnp.sin(out))

    def loss_math(*a):
        return jnp.sum(ffn_math(*a) * jnp.sin(ffn_math(*a)))

    gp = jax.jit(jax.grad(loss_pallas, argnums=tuple(range(10))))(*args)
    gm = jax.jit(jax.grad(loss_math, argnums=tuple(range(10))))(*args)
    with jax.default_matmul_precision("highest"):
        gt = jax.jit(jax.grad(loss_math, argnums=tuple(range(10))))(*args)
    # Both paths run bf16-operand dots; gradients are sums over M=1024 rows,
    # so a fixed elementwise tolerance misstates the precision class.  The
    # honest assertion: the fused kernel's error against a HIGHEST-precision
    # truth is within a factor of the XLA math path's own error (measured
    # on-chip 2026-08-18: ratio <= 1.01 across all ten cotangents, with the
    # fused kernel CLOSER to truth on g1/b1/w1/w2).
    _assert_same_precision_class(gp, gm, gt, names=[
        "x", "ao", "g1", "b1", "w1", "bb1", "w2", "bb2", "g2", "b2",
    ])


def test_radon_adjoint_identity_on_chip(rng):
    """<A x, y> == <x, Aᵀ y> on hardware (HIGHEST-precision einsum path)."""
    from tmar.ops import Radon

    size = 64
    radon = Radon(size, np.linspace(0, np.pi, 24, endpoint=False))
    x = jnp.asarray(rng.standard_normal((2, size, size)).astype(np.float32))
    y = jnp.asarray(
        rng.standard_normal((2, 24, radon.det_count)).astype(np.float32)
    )
    ax = jax.jit(radon.forward)(x)
    aty = jax.jit(radon.backward)(y)
    lhs = float(jnp.vdot(ax, y))
    rhs = float(jnp.vdot(x, aty))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)
    # FBP of a centered disc reconstructs something disc-like and finite
    img = np.zeros((1, size, size), np.float32)
    yy, xx = np.mgrid[:size, :size]
    img[0, (yy - 32) ** 2 + (xx - 32) ** 2 < 100] = 1.0
    rec = np.asarray(jax.jit(radon.fbp)(jax.jit(radon.forward)(jnp.asarray(img))))
    assert np.isfinite(rec).all()
    assert rec[0, 32, 32] > rec[0, 4, 4]


def test_fused_ngram_backward_on_chip(rng):
    """Fused ngram recompute-backward kernel (backward="pallas") vs jax.vjp
    of the unfused composition on real hardware — all nine parameter
    cotangents + the input grad at bf16-operand-dot tolerances."""
    from tmar.ops.attention import gather_rel_pos_bias, relative_position_index
    from tmar.ops.pallas_ngram import fused_ngram_context

    dim, heads, wh, ww = 64, 6, 8, 8
    half = dim // 2
    A = (half // heads) * heads
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
        out = fused_ngram_context(*a, 6, backward=mode)
        return jnp.sum(out * jnp.cos(out))

    gp = jax.jit(jax.grad(lambda *a: loss("pallas", *a), argnums=tuple(range(9))))(*args)
    gm = jax.jit(jax.grad(lambda *a: loss(None, *a), argnums=tuple(range(9))))(*args)
    with jax.default_matmul_precision("highest"):
        gt = jax.jit(jax.grad(lambda *a: loss(None, *a), argnums=tuple(range(9))))(*args)
    # Same-precision-class assertion (see test_fused_ffn_backward_on_chip):
    # measured on-chip 2026-08-18 the worst fused/math truth-error ratio is
    # 1.14 (bqkv); a fixed 2e-2 elementwise tolerance fails BOTH paths.
    _assert_same_precision_class(gp, gm, gt, names=[
        "u", "wqkv", "bqkv", "logit_scale", "bias", "wproj", "bproj",
        "wmerge", "bmerge",
    ])


def test_striped_ngram_backward_on_chip(rng):
    """The STRIPED recompute backward (multi-stripe grid + host halo folds)
    on real hardware, at a geometry the r2 whole-map kernel was gated away
    from serving: grads must land in the same precision class as the math
    path.  stripe_rows=2 over an 8-row grid exercises first/middle/last
    stripe transposes and both halo directions."""
    from tmar.ops.attention import gather_rel_pos_bias, relative_position_index
    from tmar.ops.pallas_ngram import fused_ngram_context

    dim, heads, wh, ww = 64, 6, 8, 8
    half = dim // 2
    A = (half // heads) * heads
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

    def loss(mode, S, *a):
        out = fused_ngram_context(*a, 6, backward=mode, stripe_rows=S)
        return jnp.sum(out * jnp.cos(out))

    gp = jax.jit(jax.grad(
        lambda *a: loss("pallas", 2, *a), argnums=tuple(range(9))
    ))(*args)
    gm = jax.jit(jax.grad(
        lambda *a: loss(None, None, *a), argnums=tuple(range(9))
    ))(*args)
    with jax.default_matmul_precision("highest"):
        gt = jax.jit(jax.grad(
            lambda *a: loss(None, None, *a), argnums=tuple(range(9))
        ))(*args)
    _assert_same_precision_class(gp, gm, gt, names=[
        "u", "wqkv", "bqkv", "logit_scale", "bias", "wproj", "bproj",
        "wmerge", "bmerge",
    ])


def test_promoted_train_recipe_smoke_on_chip(rng):
    """Ten steps of the EXACT promoted training recipe (pallas fwd+bwd
    attention, ngram megakernel hardware default, batched real/fake D
    passes, all 11 losses incl. the 180-angle Radon physics term) on real
    hardware: losses stay finite and the generator actually moves.  Shapes
    and config mirror tools/ab_train.py so the compiled program comes from
    the persistent cache."""
    import optax

    from tmar.losses import LossWeights
    from tmar.nn import MultiScaleDiscriminator, NGswin
    from tmar.ops import Radon
    from tmar.train import create_train_state, make_train_step

    B, PATCH = 8, 128
    gen = NGswin(dtype=jnp.bfloat16, use_pallas_attention=True,
                 attn_backward="pallas")
    disc = MultiScaleDiscriminator(dtype=jnp.bfloat16)
    g_tx = optax.adam(1e-4, b1=0.5, b2=0.999)
    d_tx = optax.adam(2e-4, b1=0.5, b2=0.999)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, patch_size=PATCH
    )
    radon = Radon(PATCH, np.linspace(0, np.pi, 180, endpoint=False))
    step = make_train_step(gen, disc, g_tx, d_tx, LossWeights(),
                           projector=radon, donate=False, fused_pairs=True)
    batch = {
        "ct": jnp.asarray(rng.uniform(-1, 1, (B, PATCH, PATCH, 1)).astype(np.float32)),
        "gt": jnp.asarray(rng.uniform(-1, 1, (B, PATCH, PATCH, 1)).astype(np.float32)),
    }
    g0 = jax.tree_util.tree_leaves(state.g_params)[0].copy()
    metrics = None
    for _ in range(10):
        state, metrics = step(state, batch)
    host = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in host.values()), host
    g1 = jax.tree_util.tree_leaves(state.g_params)[0]
    assert float(jnp.abs(g1 - g0).max()) > 0.0, "generator params did not move"
