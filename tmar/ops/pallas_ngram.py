"""Fused N-Gram context megakernel.

The n-gram context (reference models/generator/components/window_utils.py:43-90)
is, per NSTB, a swarm of tiny XLA ops on a [B, wh, ww, D/2] unigram grid:
2 sequence-reflective pads, 2 sliding-patch extractions (8 slice/stack copies),
2 four-token window attentions (~10 dispatches each through qkv/norm/softmax/
proj), 2 token means, a concat and a 1x1 merge conv.  At 512^2 the whole pool
is ~68 ms of dispatch-bound sub-roofline kernels (PERF.md).

This kernel computes the ENTIRE context — both directional sliding attentions,
token means and the merge conv — in ONE Pallas call, gridded over
(image, window-row stripe) with ±1-row halo refs so VMEM stays bounded at
any map size (``_stripe_rows``; a whole 64×64 stage-1 map would need tens
of MB), operating in *map layout* throughout (no [R, 4, C] token
materialisation):

* qkv is computed once per grid position ([R, C] @ [C, A] dots); a sliding
  window's token p is just the map shifted by p's (di, dj) offset, with the
  sequence-reflective edge column/row spliced in (the same concat-of-slices
  trick the in-kernel SW-MSA roll uses, tmar.ops.pallas_nstb).
* per-head L2 norms and the per-(token-pair) cosine scores are computed with
  one-hot head-membership matmuls ([R, A] @ [A, nh]) — no lane-dim reshapes,
  which Mosaic rejects (see PERF.md's capability matrix).
* the 4-way softmax runs as elementwise max/exp/sum over four [R, nh] maps.
* token-mean and output projection commute (the projection is affine and
  shared across tokens), so the mean is taken BEFORE the [A, C] proj dot.
* the [2C, D] merge conv is split into two [C, D] matmuls (fwd/bwd halves),
  avoiding the lane-dim concat Mosaic restricts.

Differentiation has two modes (``backward`` arg):

* default (None/"auto"): the custom VJP's op_fwd — which only runs when the
  op is differentiated — delegates to the exact composition NGramContext
  uses today (seq_refl pad + sliding patches + window attention + mean +
  merge), including the per-window Pallas attention kernels with the
  configured ``attn_backward`` mode, so TRAINING numerics and performance
  are byte-identical to the unfused path; inference (no grad) gets the
  megakernel.
* ``backward="pallas"``: the megakernel stays the training primal and the
  backward runs ``_ngram_bwd_kernel`` — one fused recompute kernel per
  image emitting all nine parameter cotangents + du (2 kernels/block
  instead of the ~30-XLA-kernel context fwd+bwd swarm).  Numerics then
  match the composition to recompute-VJP tolerances (~3e-4 f32, tested),
  not byte-identically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tmar.ops.ngram import seq_refl_win_pad, sliding_patches


def _head_onehot(attn_dim: int, num_heads: int) -> np.ndarray:
    """[A, nh] head-membership one-hot: h1[c, h] = 1 iff c // hd == h."""
    hd = attn_dim // num_heads
    h1 = np.zeros((attn_dim, num_heads), np.float32)
    for c in range(attn_dim):
        h1[c, c // hd] = 1.0
    return h1


def ngram_context_math(
    u, wqkv, bqkv, logit_scale, bias, wproj, bproj, wmerge, bmerge,
    *, num_heads, use_pallas_attn=False, attn_backward="auto",
    interpret=False, compute_dtype=None,
):
    """Pure composition reference of the fused kernel — the exact op sequence
    NGramContext runs today (window_utils.py:43-90 semantics).  Used as the
    custom VJP's primal under differentiation, so the training path keeps the
    per-window attention kernels (and their fused backward) unchanged."""
    cd = compute_dtype or u.dtype

    def _dir(back):
        padded = seq_refl_win_pad(u, 2, back=back)
        patches = sliding_patches(padded, 2)
        B, wh, ww, n, _, C = patches.shape
        tokens = patches.reshape(B * wh * ww, n * n, C).astype(cd)
        if use_pallas_attn:
            from tmar.ops.pallas_attention import fused_window_attention

            out = fused_window_attention(
                tokens, wqkv.astype(cd),
                None if bqkv is None else bqkv.astype(cd),
                logit_scale, bias, wproj.astype(cd),
                jnp.zeros((wproj.shape[1],), cd) if bproj is None
                else bproj.astype(cd),
                num_heads, interpret=interpret,
                backward=None if attn_backward == "auto" else attn_backward,
            )
        else:
            from tmar.ops.attention import window_attention_math

            out = window_attention_math(
                tokens, wqkv.astype(cd),
                None if bqkv is None else bqkv.astype(cd),
                logit_scale, bias, wproj.astype(cd),
                None if bproj is None else bproj.astype(cd),
                num_heads,
            )
        return out.mean(axis=1).reshape(B, wh, ww, C)

    both = jnp.concatenate([_dir(False), _dir(True)], axis=-1).astype(cd)
    return jnp.tensordot(both, wmerge.astype(cd), axes=1) + bmerge.astype(cd)


def fused_ngram_context(
    u: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: Optional[jnp.ndarray],
    logit_scale: jnp.ndarray,
    bias: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: Optional[jnp.ndarray],
    wmerge: jnp.ndarray,
    bmerge: jnp.ndarray,
    num_heads: int,
    *,
    use_pallas_attn: bool = False,
    attn_backward: str = "auto",
    interpret: bool = False,
    backward: Optional[str] = None,
    stripe_rows: Optional[int] = None,
) -> jnp.ndarray:
    """u: [B, wh, ww, C] unigram grid -> context [B, wh, ww, D] where
    D = wmerge.shape[-1].  ngram == 2 only (the flagship config; callers
    fall back to the unfused path otherwise).

    wqkv [C, 3A], logit_scale [nh, 1, 1] (raw log-domain), bias [nh, 4, 4]
    (gathered RPB), wproj [A, C], wmerge [2C, D] (squeezed 1x1 conv kernel).

    ``backward``: None/"auto" = under differentiation the primal+backward
    run through the unfused composition (incl. its per-window pallas
    kernels with ``attn_backward``); "pallas" = the megakernel stays the
    primal and the backward runs the fused recompute kernel
    (_ngram_bwd_kernel) — two kernels per block instead of the ~30-XLA-
    kernel fwd+bwd context swarm, for the kernel-count-bound train step.
    """
    B, wh, ww, C = u.shape
    assert wh >= 2 and ww >= 2, "fused ngram context needs a >=2x2 window grid"
    A3 = wqkv.shape[1]
    A = A3 // 3
    has_bqkv = bqkv is not None
    has_bproj = bproj is not None
    zeros_b3 = jnp.zeros((A3,), u.dtype)
    zeros_bp = jnp.zeros((wproj.shape[1],), u.dtype)

    @jax.custom_vjp
    def op(u, wqkv, bqkv, logit_scale, bias, wproj, bproj, wmerge, bmerge):
        return _forward(
            u, wqkv, bqkv if has_bqkv else None, logit_scale, bias, wproj,
            bproj if has_bproj else None, wmerge, bmerge,
            num_heads=num_heads, interpret=interpret, stripe_rows=stripe_rows,
        )

    def math_fn(u, wqkv, bqkv, logit_scale, bias, wproj, bproj, wmerge, bmerge):
        return ngram_context_math(
            u, wqkv, bqkv if has_bqkv else None, logit_scale, bias, wproj,
            bproj if has_bproj else None, wmerge, bmerge,
            num_heads=num_heads, use_pallas_attn=use_pallas_attn,
            attn_backward=attn_backward, interpret=interpret,
        )

    if backward == "pallas":
        def op_fwd(*a):
            return (
                _forward(
                    a[0], a[1], a[2] if has_bqkv else None, a[3], a[4], a[5],
                    a[6] if has_bproj else None, a[7], a[8],
                    num_heads=num_heads, interpret=interpret,
                    stripe_rows=stripe_rows,
                ),
                a,
            )

        def op_bwd(res, g):
            return _backward(
                *res, g, num_heads=num_heads, interpret=interpret,
                has_bqkv=has_bqkv, has_bproj=has_bproj,
                stripe_rows=stripe_rows,
            )
    else:
        def op_fwd(*a):
            # only runs UNDER DIFFERENTIATION: keep training on the
            # composition path (incl. its per-window pallas bwd kernels)
            return math_fn(*a), a

        def op_bwd(res, g):
            _, vjp = jax.vjp(math_fn, *res)
            return vjp(g.astype(res[0].dtype))

    op.defvjp(op_fwd, op_bwd)
    return op(
        u, wqkv, bqkv if has_bqkv else zeros_b3, logit_scale, bias, wproj,
        bproj if has_bproj else zeros_bp, wmerge, bmerge,
    )


def _prep_params(
    wqkv, bqkv, logit_scale, bias, wproj, bproj, wmerge, bmerge,
    *, C, A, nh, D, cd,
):
    """Host-side param prep shared by ``_forward`` and ``_backward``: split
    qkv, squeeze the merge conv into fwd/bwd halves, pre-exp the clipped
    logit scale, flatten the RPB to per-(p, q) rows.  The recompute backward
    MUST prep identically to the primal — keep this the single source."""
    from tmar.ops.attention import LOGIT_SCALE_MAX

    wq, wk, wv = jnp.split(wqkv, 3, axis=1)
    if bqkv is None:
        bq = bk = bv = jnp.zeros((1, A), jnp.float32)
    else:
        bq, bk, bv = (b.reshape(1, A) for b in jnp.split(bqkv, 3))
    scale = jnp.exp(
        jnp.clip(logit_scale.astype(jnp.float32), max=LOGIT_SCALE_MAX)
    ).reshape(1, nh)
    bias_pq = bias.astype(jnp.float32).transpose(1, 2, 0).reshape(16, nh)
    wm_f, wm_b = wmerge[:C], wmerge[C:]
    bp = (bproj if bproj is not None else jnp.zeros((C,))).reshape(1, C)
    h1 = jnp.asarray(_head_onehot(A, nh))
    return dict(
        wq=wq.astype(cd), wk=wk.astype(cd), wv=wv.astype(cd),
        bq=bq.astype(jnp.float32), bk=bk.astype(jnp.float32),
        bv=bv.astype(jnp.float32),
        scale=scale, bias_pq=bias_pq,
        wproj=wproj.astype(cd), bp=bp.astype(jnp.float32),
        wm_f=wm_f.astype(cd), wm_b=wm_b.astype(cd),
        bm=bmerge.reshape(1, D).astype(jnp.float32),
        h1=h1.astype(cd), h1T=h1.T.astype(cd),
    )


def _stripe_rows(wh: int, ww: int, budget: int = 512) -> int:
    """Grid-rows per stripe for the striped forward kernel.

    The largest divisor S >= 2 of ``wh`` with ``S * ww <= budget`` bounds
    every in-kernel [(S+2)·ww, A] buffer to a few hundred KB regardless of
    map size — a whole-map kernel at 512² stage 1 (64×64 grid) would need
    tens of MB of VMEM, over the ~16 MB scoped-vmem budget.  If the whole
    map already fits (or ``wh`` is tiny/prime), one stripe covers it.
    """
    import os

    try:
        forced = int(os.environ.get("TMAR_NGRAM_STRIPE", "0") or "0")
    except ValueError:
        forced = 0  # malformed override — fall through to the default rule
    if forced >= 2 and wh % forced == 0:  # measurement override
        return forced
    if wh * ww <= budget:
        return wh
    for s in range(min(wh - 1, budget // max(ww, 1)), 1, -1):
        if wh % s == 0:
            return s
    return wh


def _forward(
    u, wqkv, bqkv, logit_scale, bias, wproj, bproj, wmerge, bmerge,
    *, num_heads, interpret, stripe_rows=None,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, wh, ww, C = u.shape
    A3 = wqkv.shape[1]
    A = A3 // 3
    nh = num_heads
    D = wmerge.shape[1]
    cd = u.dtype
    p = _prep_params(
        wqkv, bqkv, logit_scale, bias, wproj, bproj, wmerge, bmerge,
        C=C, A=A, nh=nh, D=D, cd=cd,
    )

    S = stripe_rows if stripe_rows is not None else _stripe_rows(wh, ww)
    assert wh % S == 0 and (S >= 2 or S == wh), (wh, S)
    nr = wh // S
    kernel = functools.partial(
        _ngram_stripe_kernel, S=S, nr=nr, ww=ww, C=C, A=A, nh=nh, D=D,
    )
    c0 = lambda b, r: (0, 0)  # noqa: E731
    # ONE ordered list drives both the BlockSpecs and the operand tuple —
    # the two can never drift out of alignment
    extras = [
        (p["wq"], (C, A)), (p["wk"], (C, A)), (p["wv"], (C, A)),
        (p["bq"], (1, A)), (p["bk"], (1, A)), (p["bv"], (1, A)),
        (p["scale"], (1, nh)), (p["bias_pq"], (16, nh)),
        (p["wproj"], (A, C)), (p["bp"], (1, C)),
        (p["wm_f"], (C, D)), (p["wm_b"], (C, D)), (p["bm"], (1, D)),
        (p["h1"], (A, nh)), (p["h1T"], (nh, A)),
    ]
    # the same input rides in three times: the own stripe plus two
    # single-row halo blocks (the previous stripe's last row and the next
    # stripe's first row) for the vertical shifts — row-unit index maps,
    # clamped at the boundary; the boundary shift variants never read the
    # clamped garbage
    row_spec = lambda f: pl.BlockSpec(  # noqa: E731
        (1, 1, ww, C), f, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, nr),
        in_specs=[
            row_spec(lambda b, r: (b, jnp.maximum(S * r - 1, 0), 0, 0)),
            pl.BlockSpec(
                (1, S, ww, C), lambda b, r: (b, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            row_spec(lambda b, r: (b, jnp.minimum(S * (r + 1), wh - 1), 0, 0)),
        ] + [pl.BlockSpec(shape, c0, memory_space=pltpu.VMEM) for _, shape in extras],
        out_specs=pl.BlockSpec(
            (1, S, ww, D), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, wh, ww, D), cd),
        interpret=interpret,
    )(u, u, u, *[a for a, _ in extras])
    return out


def _backward(
    u, wqkv, bqkv, logit_scale, bias, wproj, bproj, wmerge, bmerge, g,
    *, num_heads, interpret, has_bqkv, has_bproj, stripe_rows=None,
):
    """Fused recompute backward, striped over window-rows like the forward.

    Grid = (image, window-row stripe) with ±1-row halo refs, so VMEM stays
    bounded at ANY map size (the r2 whole-map kernel was gated to ≤32×32
    grids; full-slice 416² training needs 52×52).  Each stripe emits

    * its ``[S+2]``-row du contribution in f32 — own rows plus one halo row
      on each side, because the shift transposes scatter cotangents into the
      vertical neighbours; two host-side adds fold the halo rows into the
      neighbouring stripes' cores, and
    * grid-accumulated f32 parameter cotangents.  Exactness: every stripe
      pushes only its OWN rows' attention cotangents through the (linear in
      the cotangent) norm/projection tails, using primal values recomputed
      at halo rows identically to the owning stripe — so summing per-stripe
      contributions equals the whole-map backward.

    With S == wh (one stripe) this reduces exactly to the whole-map kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tmar.ops.attention import LOGIT_SCALE_MAX

    B, wh, ww, C = u.shape
    A3 = wqkv.shape[1]
    A = A3 // 3
    nh = num_heads
    D = wmerge.shape[1]
    cd = u.dtype
    g = g.astype(cd)

    # identical prep to the primal (_forward) — required for the recompute
    p = _prep_params(
        wqkv, bqkv, logit_scale, bias, wproj, bproj, wmerge, bmerge,
        C=C, A=A, nh=nh, D=D, cd=cd,
    )

    S = stripe_rows if stripe_rows is not None else _stripe_rows(wh, ww)
    assert wh % S == 0 and (S >= 2 or S == wh), (wh, S)
    nr = wh // S
    kernel = functools.partial(
        _ngram_bwd_stripe_kernel, S=S, nr=nr, ww=ww, C=C, A=A, nh=nh, D=D,
    )
    c0 = lambda b, r: (0, 0)  # noqa: E731
    # ONE ordered list drives both the BlockSpecs and the operand tuple
    extras = [
        (p["wq"], (C, A)), (p["wk"], (C, A)), (p["wv"], (C, A)),
        (p["bq"], (1, A)), (p["bk"], (1, A)), (p["bv"], (1, A)),
        (p["scale"], (1, nh)), (p["bias_pq"], (16, nh)),
        (p["wproj"], (A, C)), (p["bp"], (1, C)),
        (p["wm_f"], (C, D)), (p["wm_b"], (C, D)),
        # pre-transposed weights for the input-gradient dots
        (p["wq"].T, (A, C)), (p["wk"].T, (A, C)), (p["wv"].T, (A, C)),
        (p["wproj"].T, (C, A)), (p["wm_f"].T, (D, C)), (p["wm_b"].T, (D, C)),
        (p["h1"], (A, nh)), (p["h1T"], (nh, A)),
    ]
    out_decl = [
        # per-stripe du contribution: own S rows + 1 halo row each side
        ((B, nr, S + 2, ww, C), jnp.float32, pl.BlockSpec(
            (1, 1, S + 2, ww, C), lambda b, r: (b, r, 0, 0, 0),
            memory_space=pltpu.VMEM)),
        ((C, A), jnp.float32, pl.BlockSpec((C, A), c0, memory_space=pltpu.VMEM)),   # dwq
        ((C, A), jnp.float32, pl.BlockSpec((C, A), c0, memory_space=pltpu.VMEM)),   # dwk
        ((C, A), jnp.float32, pl.BlockSpec((C, A), c0, memory_space=pltpu.VMEM)),   # dwv
        ((1, A), jnp.float32, pl.BlockSpec((1, A), c0, memory_space=pltpu.VMEM)),   # dbq
        ((1, A), jnp.float32, pl.BlockSpec((1, A), c0, memory_space=pltpu.VMEM)),   # dbk
        ((1, A), jnp.float32, pl.BlockSpec((1, A), c0, memory_space=pltpu.VMEM)),   # dbv
        ((1, nh), jnp.float32, pl.BlockSpec((1, nh), c0, memory_space=pltpu.VMEM)), # dscale(exp)
        ((16, nh), jnp.float32, pl.BlockSpec((16, nh), c0, memory_space=pltpu.VMEM)),  # dbias_pq
        ((A, C), jnp.float32, pl.BlockSpec((A, C), c0, memory_space=pltpu.VMEM)),   # dwproj
        ((1, C), jnp.float32, pl.BlockSpec((1, C), c0, memory_space=pltpu.VMEM)),   # dbproj
        ((C, D), jnp.float32, pl.BlockSpec((C, D), c0, memory_space=pltpu.VMEM)),   # dwm_f
        ((C, D), jnp.float32, pl.BlockSpec((C, D), c0, memory_space=pltpu.VMEM)),   # dwm_b
        ((1, D), jnp.float32, pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM)),   # dbm
    ]
    # the input rides in three times (own stripe + single-row halo blocks,
    # clamped at the boundary) exactly as in the striped forward
    row_spec = lambda f: pl.BlockSpec(  # noqa: E731
        (1, 1, ww, C), f, memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B, nr),
        in_specs=[
            row_spec(lambda b, r: (b, jnp.maximum(S * r - 1, 0), 0, 0)),
            pl.BlockSpec(
                (1, S, ww, C), lambda b, r: (b, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            row_spec(lambda b, r: (b, jnp.minimum(S * (r + 1), wh - 1), 0, 0)),
            pl.BlockSpec(
                (1, S, ww, D), lambda b, r: (b, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + [pl.BlockSpec(shape, c0, memory_space=pltpu.VMEM) for _, shape in extras],
        out_specs=[spec for _, _, spec in out_decl],
        out_shape=[jax.ShapeDtypeStruct(shape, dt) for shape, dt, _ in out_decl],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(u, u, u, g, *[a for a, _ in extras])
    (du_ext, dwq_, dwk_, dwv_, dbq_, dbk_, dbv_, dscale_e, dbias_pq_, dwproj_,
     dbproj_, dwm_f_, dwm_b_, dbm_) = outs

    # fold the halo rows into the neighbouring stripes' cores: the top halo
    # of stripe r targets global row r·S−1 (stripe r−1, local S−1), the
    # bottom halo targets row (r+1)·S (stripe r+1, local 0).  Boundary
    # halos are zero by construction (the seq_refl variants never write
    # outside the map).
    core = du_ext[:, :, 1 : S + 1]                  # (B, nr, S, ww, C) f32
    if nr > 1:
        core = core.at[:, :-1, S - 1].add(du_ext[:, 1:, 0])
        core = core.at[:, 1:, 0].add(du_ext[:, :-1, S + 1])
    du = core.reshape(B, wh, ww, C).astype(cd)

    dwqkv = jnp.concatenate([dwq_, dwk_, dwv_], axis=1).astype(wqkv.dtype)
    dbqkv = jnp.concatenate(
        [dbq_[0], dbk_[0], dbv_[0]]
    ).astype(bqkv.dtype)
    # route the scale grad through exp(clip(·)); un-transpose the RPB grad
    _, vjp_scale = jax.vjp(
        lambda t: jnp.exp(
            jnp.clip(t.astype(jnp.float32), max=LOGIT_SCALE_MAX)
        ).reshape(1, nh),
        logit_scale,
    )
    (dls,) = vjp_scale(dscale_e)
    dbias = dbias_pq_.reshape(4, 4, nh).transpose(2, 0, 1).astype(bias.dtype)
    return (
        du,
        dwqkv,
        dbqkv if has_bqkv else jnp.zeros_like(bqkv),
        dls.astype(logit_scale.dtype),
        dbias,
        dwproj_.astype(wproj.dtype),
        (dbproj_.reshape(C) if has_bproj else jnp.zeros_like(bproj)).astype(bproj.dtype),
        jnp.concatenate([dwm_f_, dwm_b_], axis=0).astype(wmerge.dtype),
        dbm_.reshape(D).astype(bmerge.dtype),
    )


def _rs(t, shape, rows):
    """Reshape that Mosaic can lower for packed dtypes.

    Collapsing/expanding a grid-row dim into the sublane dim is an
    "unsupported shape cast" for packed layouts when the row count is not a
    multiple of the dtype's sublane packing (bf16 packs 2 rows per (8, 128)
    sublane tile, so e.g. [15, 13, 32]bf16 -> [195, 32]bf16 fails on
    hardware while the f32 twin lowers fine).  ``rows`` is the row factor
    being merged/split (``ww`` for the kernels here); when it is not
    packing-aligned the reshape detours via f32 (exact: widening cast)."""
    packing = 4 // t.dtype.itemsize
    if packing > 1 and rows % packing:
        return t.astype(jnp.float32).reshape(shape).astype(t.dtype)
    return t.reshape(shape)


def _zeros_rows(n, ww, X, dt):
    return jnp.zeros((n, ww, X), dt)


def _zeros_cols(wh, n, X, dt):
    return jnp.zeros((wh, n, X), dt)


def _right_T(dy, wh, ww):
    """Transpose of the forward 'right' shift (col j+1, reflect ww-2):
    dx[:, 1:] = dy[:, :ww-1]; dx[:, ww-2] += dy[:, ww-1]."""
    X, dt = dy.shape[-1], dy.dtype
    base = jnp.concatenate([_zeros_cols(wh, 1, X, dt), dy[:, : ww - 1, :]], axis=1)
    refl_pieces = []
    if ww - 2 > 0:
        refl_pieces.append(_zeros_cols(wh, ww - 2, X, dt))
    refl_pieces.append(dy[:, ww - 1 : ww, :])
    refl_pieces.append(_zeros_cols(wh, 1, X, dt))
    return base + jnp.concatenate(refl_pieces, axis=1)


def _left_T(dy, wh, ww):
    """Transpose of the backward 'left' shift (col j-1, reflect col 1):
    dx[:, :ww-1] = dy[:, 1:]; dx[:, 1] += dy[:, 0]."""
    X, dt = dy.shape[-1], dy.dtype
    base = jnp.concatenate([dy[:, 1:, :], _zeros_cols(wh, 1, X, dt)], axis=1)
    refl_pieces = [_zeros_cols(wh, 1, X, dt), dy[:, 0:1, :]]
    if ww - 2 > 0:
        refl_pieces.append(_zeros_cols(wh, ww - 2, X, dt))
    return base + jnp.concatenate(refl_pieces, axis=1)


def _ngram_bwd_stripe_kernel(
    xp_ref, xo_ref, xn_ref, g_ref,
    wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
    scale_ref, biaspq_ref, wproj_ref, bproj_ref, wmf_ref, wmb_ref,
    wqT_ref, wkT_ref, wvT_ref, wprojT_ref, wmfT_ref, wmbT_ref,
    h1_ref, h1t_ref,
    du_ref, dwq_ref, dwk_ref, dwv_ref, dbq_ref, dbk_ref, dbv_ref,
    dscale_ref, dbias_ref, dwproj_ref, dbproj_ref, dwmf_ref, dwmb_ref,
    dbm_ref, *, S, nr, ww, C, A, nh, D,
):
    """Recompute backward for one stripe of S grid-rows (grid = (B, wh/S));
    ``xp``/``xn`` carry single halo rows exactly like the striped forward.
    Attention cotangents of the stripe's OWN rows are unshifted (transposed)
    into the ``[S+2]``-row ext coordinate frame — the vertical transposes
    write one row past the stripe on each side — and pushed through the
    norm/qkv backward using ext-row primal values.  du contributions leave
    the kernel per-stripe (host folds the halo rows); parameter cotangents
    accumulate across the whole grid."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    r = pl.program_id(1)
    is_first = r == 0
    is_last = r == nr - 1

    @pl.when((b == 0) & (r == 0))
    def _init():
        for rf in (dwq_ref, dwk_ref, dwv_ref, dbq_ref, dbk_ref, dbv_ref,
                   dscale_ref, dbias_ref, dwproj_ref, dbproj_ref, dwmf_ref,
                   dwmb_ref, dbm_ref):
            rf[:] = jnp.zeros_like(rf)

    cd = xo_ref.dtype
    h1_cd = h1_ref[:]
    h1t_cd = h1t_ref[:]
    scale = scale_ref[:]

    # ---- recompute the forward over the ext rows (identically to the
    # striped forward kernel, so halo-row primals match the owning stripe) --
    ext = jnp.concatenate([xp_ref[0], xo_ref[0], xn_ref[0]], axis=0)
    RE = (S + 2) * ww
    RS = S * ww
    u2 = _rs(ext, (RE, C), ww)

    def _proj(w_ref, b_ref):
        return jnp.dot(u2, w_ref[:], preferred_element_type=jnp.float32) + b_ref[:]

    q = _proj(wq_ref, bq_ref)
    k = _proj(wk_ref, bk_ref)
    v = _proj(wv_ref, bv_ref).astype(cd)

    def _norm_state(t):
        n2 = jnp.dot(
            jnp.square(t).astype(cd), h1_cd, preferred_element_type=jnp.float32
        )                                            # [RE, nh] = r²
        r_ = jnp.sqrt(n2)
        inv = (r_ + 1e-12).astype(cd) ** -1          # [RE, nh]
        invA = jnp.dot(inv, h1t_cd, preferred_element_type=jnp.float32)
        tn = (t * invA).astype(cd)
        return tn, r_, inv

    qn, q_r, q_inv = _norm_state(q)
    kn, k_r, k_inv = _norm_state(k)

    qn3 = _rs(qn, (S + 2, ww, A), ww)
    kn3 = _rs(kn, (S + 2, ww, A), ww)
    v3 = _rs(v, (S + 2, ww, A), ww)

    dm = _rs(g_ref[0], (RS, D), ww).astype(jnp.float32)
    dbm_ref[:] += jnp.sum(dm, axis=0, keepdims=True)
    dmc = dm.astype(cd)

    # local row i of ext == global row r0-1+i; shifts of OWN rows read only
    # ext rows (same formulas as the striped forward)
    def _shifts_fwd(t3):
        ident = t3[1 : S + 1]
        right_t = jnp.concatenate(
            [t3[:, 1:, :], t3[:, ww - 2 : ww - 1, :]], axis=1
        )

        def down_of(m):
            mid = m[2 : S + 2]
            last = jnp.concatenate([m[2 : S + 1], m[S - 1 : S]], axis=0)
            return jnp.where(is_last, last, mid)

        return [ident, right_t[1 : S + 1], down_of(t3), down_of(right_t)]

    def _shifts_bwd(t3):
        ident = t3[1 : S + 1]
        left_t = jnp.concatenate(
            [t3[:, 1:2, :], t3[:, : ww - 1, :]], axis=1
        )

        def up_of(m):
            mid = m[0:S]
            first = jnp.concatenate([m[2:3], m[1:S]], axis=0)
            return jnp.where(is_first, first, mid)

        return [up_of(left_t), up_of(t3), left_t[1 : S + 1], ident]

    # transposes of the striped shifts: own-row cotangents [S, ww, A] →
    # ext-frame contributions [S+2, ww, A].  The column transposes
    # (_right_T/_left_T) are row-local; the vertical transposes write one
    # halo row, with the seq_refl boundary variants folding in-stripe.
    z1 = jnp.zeros((1, ww, A), jnp.float32)

    def _unshift_fwd(gm):
        g0, g1, g2, g3 = gm
        g1 = _right_T(g1, S, ww)
        g3 = _right_T(g3, S, ww)
        mid = g0 + g1                               # ident(+right): rows 1..S
        down = g2 + g3
        dext = jnp.concatenate([z1, mid, z1], axis=0)
        # interior: down reads ext[s+2] → dext[s+2] += down[s] (rows 2..S+1,
        # the last one being the bottom halo)
        interior = jnp.concatenate([z1, z1, down], axis=0)
        # last stripe: global row wh-1 reflects to wh-2 == ext[S-1]
        last = jnp.concatenate([z1, z1, down[: S - 1], z1], axis=0)
        last = last + jnp.concatenate(
            [jnp.zeros((S - 1, ww, A), jnp.float32), down[S - 1 : S],
             jnp.zeros((2, ww, A), jnp.float32)], axis=0,
        )
        return dext + jnp.where(is_last, last, interior)

    def _unshift_bwd(gm):
        g0, g1, g2, g3 = gm
        g0 = _left_T(g0, S, ww)
        g2 = _left_T(g2, S, ww)
        mid = g3 + g2                               # ident(+left): rows 1..S
        up = g0 + g1
        dext = jnp.concatenate([z1, mid, z1], axis=0)
        # interior: up reads ext[s] → dext[s] += up[s] (rows 0..S-1, the
        # first one being the top halo)
        interior = jnp.concatenate([up, z1, z1], axis=0)
        # first stripe: global row -1 reflects to row 1 == ext[2]
        first = jnp.concatenate(
            [z1, up[1:S], z1, z1], axis=0
        ) + jnp.concatenate(
            [jnp.zeros((2, ww, A), jnp.float32), up[0:1],
             jnp.zeros((S - 1, ww, A), jnp.float32)], axis=0,
        )
        return dext + jnp.where(is_first, first, interior)

    dqn_ext = jnp.zeros((S + 2, ww, A), jnp.float32)
    dkn_ext = jnp.zeros((S + 2, ww, A), jnp.float32)
    dv_ext = jnp.zeros((S + 2, ww, A), jnp.float32)

    for direction in ("fwd", "bwd"):
        shift_fn = _shifts_fwd if direction == "fwd" else _shifts_bwd
        unshift = _unshift_fwd if direction == "fwd" else _unshift_bwd
        wm_ref, wmT_ref, dwm_ref = (
            (wmf_ref, wmfT_ref, dwmf_ref) if direction == "fwd"
            else (wmb_ref, wmbT_ref, dwmb_ref)
        )

        qs = [_rs(t, (RS, A), ww) for t in shift_fn(qn3)]
        ks = [_rs(t, (RS, A), ww) for t in shift_fn(kn3)]
        vs = [_rs(t, (RS, A), ww) for t in shift_fn(v3)]

        # ---- forward through this direction (keep softmax weights) -------
        acc = jnp.zeros((RS, A), jnp.float32)
        a_all = []
        cos_all = []
        for p in range(4):
            cos_p = []
            s = []
            for qi in range(4):
                prod = (qs[p] * ks[qi]).astype(cd)
                cos = jnp.dot(prod, h1_cd, preferred_element_type=jnp.float32)
                cos_p.append(cos)
                s.append(cos * scale + biaspq_ref[4 * p + qi : 4 * p + qi + 1, :])
            m = jnp.maximum(jnp.maximum(s[0], s[1]), jnp.maximum(s[2], s[3]))
            e = [jnp.exp(si - m) for si in s]
            z = e[0] + e[1] + e[2] + e[3]
            inv_z = 1.0 / z
            a_p = [ei * inv_z for ei in e]           # [RS, nh] f32
            a_all.append(a_p)
            cos_all.append(cos_p)
            for qi in range(4):
                aA = jnp.dot(
                    a_p[qi].astype(cd), h1t_cd, preferred_element_type=jnp.float32
                )
                acc = acc + aA.astype(cd).astype(jnp.float32) * vs[qi].astype(
                    jnp.float32
                )
        mean = (acc * 0.25).astype(cd)
        ctx = (
            jnp.dot(mean, wproj_ref[:], preferred_element_type=jnp.float32)
            + bproj_ref[:]
        ).astype(cd)                                 # [RS, C]

        # ---- backward through merge + proj -------------------------------
        dwm_ref[:] += jax.lax.dot_general(           # ctxᵀ @ dm
            ctx, dmc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dctx = jnp.dot(dmc, wmT_ref[:], preferred_element_type=jnp.float32)
        dbproj_ref[:] += jnp.sum(dctx, axis=0, keepdims=True)
        dctxc = dctx.astype(cd)
        dwproj_ref[:] += jax.lax.dot_general(        # meanᵀ @ dctx
            mean, dctxc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dacc = (
            jnp.dot(dctxc, wprojT_ref[:], preferred_element_type=jnp.float32)
            * 0.25
        )                                            # [RS, A] f32
        daccc = dacc.astype(cd)

        # ---- backward through attention ----------------------------------
        dqn_sh = [jnp.zeros((RS, A), jnp.float32) for _ in range(4)]
        dkn_sh = [jnp.zeros((RS, A), jnp.float32) for _ in range(4)]
        dv_sh = [jnp.zeros((RS, A), jnp.float32) for _ in range(4)]
        for p in range(4):
            a_p = a_all[p]
            da_p = []
            for qi in range(4):
                # dv_q += expand(a_pq) * dacc ; da_pq = <dacc, v_q> per head
                aA = jnp.dot(
                    a_p[qi].astype(cd), h1t_cd, preferred_element_type=jnp.float32
                )
                dv_sh[qi] = dv_sh[qi] + aA * dacc
                da = jnp.dot(
                    (daccc * vs[qi]).astype(cd), h1_cd,
                    preferred_element_type=jnp.float32,
                )
                da_p.append(da)
            inner = (
                a_p[0] * da_p[0] + a_p[1] * da_p[1]
                + a_p[2] * da_p[2] + a_p[3] * da_p[3]
            )
            for qi in range(4):
                ds = a_p[qi] * (da_p[qi] - inner)    # [RS, nh] f32
                dbias_ref[4 * p + qi : 4 * p + qi + 1, :] += jnp.sum(
                    ds, axis=0, keepdims=True
                )
                dscale_ref[:] += jnp.sum(
                    ds * cos_all[p][qi], axis=0, keepdims=True
                )
                dprodA = jnp.dot(
                    (ds * scale).astype(cd), h1t_cd,
                    preferred_element_type=jnp.float32,
                )                                    # [RS, A]
                dqn_sh[p] = dqn_sh[p] + dprodA * ks[qi].astype(jnp.float32)
                dkn_sh[qi] = dkn_sh[qi] + dprodA * qs[p].astype(jnp.float32)

        dqn_ext = dqn_ext + unshift([t.reshape(S, ww, A) for t in dqn_sh])
        dkn_ext = dkn_ext + unshift([t.reshape(S, ww, A) for t in dkn_sh])
        dv_ext = dv_ext + unshift([t.reshape(S, ww, A) for t in dv_sh])

    # ---- backward through the L2 norms (over the ext rows) ----------------
    dqn_flat = dqn_ext.reshape(RE, A)
    dkn_flat = dkn_ext.reshape(RE, A)
    dv_flat = dv_ext.reshape(RE, A)

    def _norm_bwd(dn, t, r_, inv):
        # n = t * s, s = 1/(r + eps), r = sqrt(Σ_head t²):
        # dt = s·dn − t · (⟨dn, t⟩_head · s² / r)
        inv32 = inv.astype(jnp.float32)
        g_h = jnp.dot(
            (dn * t).astype(cd), h1_cd, preferred_element_type=jnp.float32
        )                                            # [RE, nh]
        factor = g_h * inv32 * inv32 / r_
        invA = jnp.dot(
            inv.astype(cd), h1t_cd, preferred_element_type=jnp.float32
        )
        factorA = jnp.dot(
            factor.astype(cd), h1t_cd, preferred_element_type=jnp.float32
        )
        return dn * invA - t * factorA

    dq = _norm_bwd(dqn_flat, q, q_r, q_inv)          # [RE, A] f32
    dk = _norm_bwd(dkn_flat, k, k_r, k_inv)
    dv2 = dv_flat

    # ---- backward through the qkv projections ----------------------------
    du = jnp.zeros((RE, C), jnp.float32)
    for dgrad, wT_ref, dw_ref, db_ref in (
        (dq, wqT_ref, dwq_ref, dbq_ref),
        (dk, wkT_ref, dwk_ref, dbk_ref),
        (dv2, wvT_ref, dwv_ref, dbv_ref),
    ):
        dc = dgrad.astype(cd)
        db_ref[:] += jnp.sum(dgrad, axis=0, keepdims=True)
        dw_ref[:] += jax.lax.dot_general(            # u2ᵀ @ dgrad
            u2, dc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        du = du + jnp.dot(dc, wT_ref[:], preferred_element_type=jnp.float32)

    du_ref[0, 0] = du.reshape(S + 2, ww, C)          # f32 stripe contribution


def _ngram_stripe_kernel(
    xp_ref, xo_ref, xn_ref,
    wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
    scale_ref, biaspq_ref, wproj_ref, bproj_ref,
    wmf_ref, wmb_ref, bm_ref, h1_ref, h1t_ref, out_ref,
    *, S, nr, ww, C, A, nh, D,
):
    """One stripe of S grid-rows (grid = (B, wh/S)); ``xp``/``xn`` carry
    single halo rows (the previous stripe's last row / the next stripe's
    first row) for the vertical shifts.
    The seq_refl boundary variants (first/last stripe) only read in-stripe
    rows, so the clamped halo garbage there is never consumed.  With
    S == wh (one stripe) the shift formulas reduce exactly to the
    whole-map ``_shift_tokens_fwd``/``_shift_tokens_bwd``."""
    from jax.experimental import pallas as pl

    cd = xo_ref.dtype
    r = pl.program_id(1)
    is_first = r == 0
    is_last = r == nr - 1
    h1_cd = h1_ref[:]                               # [A, nh] head one-hot
    h1t_cd = h1t_ref[:]                             # [nh, A]

    # rows r0-1 .. r0+S of the global map (single-row halo blocks,
    # clamped at the edges)
    ext = jnp.concatenate(
        [xp_ref[0], xo_ref[0], xn_ref[0]], axis=0
    )                                               # [S+2, ww, C]
    RE = (S + 2) * ww
    RS = S * ww
    u2 = _rs(ext, (RE, C), ww)

    def _proj(w_ref, b_ref):
        y = jnp.dot(u2, w_ref[:], preferred_element_type=jnp.float32)
        return y + b_ref[:]                         # [RE, A] f32

    q = _proj(wq_ref, bq_ref)
    k = _proj(wk_ref, bk_ref)
    v = _proj(wv_ref, bv_ref).astype(cd)

    def _normalize(t):
        n2 = jnp.dot(
            jnp.square(t).astype(cd), h1_cd, preferred_element_type=jnp.float32
        )                                           # [RE, nh]
        inv = (jnp.sqrt(n2) + 1e-12).astype(cd) ** -1
        invA = jnp.dot(inv, h1t_cd, preferred_element_type=jnp.float32)
        return (t * invA).astype(cd)

    qn3 = _rs(_normalize(q), (S + 2, ww, A), ww)
    kn3 = _rs(_normalize(k), (S + 2, ww, A), ww)
    v3 = _rs(v, (S + 2, ww, A), ww)
    scale = scale_ref[:]                            # [1, nh] f32

    # local row i of ext == global row r0-1+i.  Vertical shifts become
    # in-ext row slices; the reflect rows of the boundary variants
    # (global 1 == ext[2] on the first stripe, global wh-2 == ext[S-1] on
    # the last) are in-stripe by construction.
    def _shifts_fwd(t3):
        ident = t3[1 : S + 1]
        right_t = jnp.concatenate(
            [t3[:, 1:, :], t3[:, ww - 2 : ww - 1, :]], axis=1
        )

        def down_of(m):
            mid = m[2 : S + 2]
            last = jnp.concatenate([m[2 : S + 1], m[S - 1 : S]], axis=0)
            return jnp.where(is_last, last, mid)

        return [ident, right_t[1 : S + 1], down_of(t3), down_of(right_t)]

    def _shifts_bwd(t3):
        ident = t3[1 : S + 1]
        left_t = jnp.concatenate(
            [t3[:, 1:2, :], t3[:, : ww - 1, :]], axis=1
        )

        def up_of(m):
            mid = m[0:S]
            first = jnp.concatenate([m[2:3], m[1:S]], axis=0)
            return jnp.where(is_first, first, mid)

        return [up_of(left_t), up_of(t3), left_t[1 : S + 1], ident]

    def _direction(shift_fn):
        qs = [_rs(t, (RS, A), ww) for t in shift_fn(qn3)]
        ks = [_rs(t, (RS, A), ww) for t in shift_fn(kn3)]
        vs = [_rs(t, (RS, A), ww) for t in shift_fn(v3)]
        acc = jnp.zeros((RS, A), jnp.float32)
        for p in range(4):
            s = []
            for qi in range(4):
                prod = (qs[p] * ks[qi]).astype(cd)
                sc = jnp.dot(prod, h1_cd, preferred_element_type=jnp.float32)
                s.append(sc * scale + biaspq_ref[4 * p + qi : 4 * p + qi + 1, :])
            m = jnp.maximum(jnp.maximum(s[0], s[1]), jnp.maximum(s[2], s[3]))
            e = [jnp.exp(si - m) for si in s]
            z = e[0] + e[1] + e[2] + e[3]
            inv_z = 1.0 / z
            for qi in range(4):
                a = (e[qi] * inv_z).astype(cd)      # [RS, nh]
                aA = jnp.dot(a, h1t_cd, preferred_element_type=jnp.float32)
                acc = acc + aA.astype(cd).astype(jnp.float32) * vs[qi].astype(
                    jnp.float32
                )
        mean = (acc * 0.25).astype(cd)              # [RS, A]
        ctx = jnp.dot(mean, wproj_ref[:], preferred_element_type=jnp.float32)
        return (ctx + bproj_ref[:]).astype(cd)      # [RS, C]

    ctx_f = _direction(_shifts_fwd)
    ctx_b = _direction(_shifts_bwd)

    merged = (
        jnp.dot(ctx_f, wmf_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(ctx_b, wmb_ref[:], preferred_element_type=jnp.float32)
        + bm_ref[:]
    )
    out_ref[0] = merged.reshape(S, ww, D).astype(cd)  # reshape in f32: packed
    # expand across an odd ww is an unsupported Mosaic shape cast (_rs)
