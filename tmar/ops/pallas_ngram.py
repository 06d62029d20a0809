"""Fused N-Gram context megakernel.

The n-gram context (reference models/generator/components/window_utils.py:43-90)
is, per NSTB, a swarm of tiny XLA ops on a [B, wh, ww, D/2] unigram grid:
2 sequence-reflective pads, 2 sliding-patch extractions (8 slice/stack copies),
2 four-token window attentions (~10 dispatches each through qkv/norm/softmax/
proj), 2 token means, a concat and a 1x1 merge conv.  At 512^2 the whole pool
is ~68 ms of dispatch-bound sub-roofline kernels (PERF.md).

This kernel computes the ENTIRE context — both directional sliding attentions,
token means and the merge conv — in ONE Pallas call per image, operating in
*map layout* throughout (no [R, 4, C] token materialisation):

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

Differentiation: like tmar.ops.pallas_nstb, the custom VJP's op_fwd — which
only runs when the op is differentiated — delegates to the exact composition
NGramContext uses today (seq_refl pad + sliding patches + window attention +
mean + merge), including the per-window Pallas attention kernels with the
configured ``attn_backward`` mode, so TRAINING numerics and performance are
byte-identical to the unfused path; inference (no grad) gets the megakernel.
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
) -> jnp.ndarray:
    """u: [B, wh, ww, C] unigram grid -> context [B, wh, ww, D] where
    D = wmerge.shape[-1].  ngram == 2 only (the flagship config; callers
    fall back to the unfused path otherwise).

    wqkv [C, 3A], logit_scale [nh, 1, 1] (raw log-domain), bias [nh, 4, 4]
    (gathered RPB), wproj [A, C], wmerge [2C, D] (squeezed 1x1 conv kernel).
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
            num_heads=num_heads, interpret=interpret,
        )

    def math_fn(u, wqkv, bqkv, logit_scale, bias, wproj, bproj, wmerge, bmerge):
        return ngram_context_math(
            u, wqkv, bqkv if has_bqkv else None, logit_scale, bias, wproj,
            bproj if has_bproj else None, wmerge, bmerge,
            num_heads=num_heads, use_pallas_attn=use_pallas_attn,
            attn_backward=attn_backward, interpret=interpret,
        )

    def op_fwd(*a):
        # only runs UNDER DIFFERENTIATION: keep training on the composition
        # path (incl. its per-window pallas backward kernels)
        return math_fn(*a), a

    def op_bwd(res, g):
        _, vjp = jax.vjp(math_fn, *res)
        return vjp(g.astype(res[0].dtype))

    op.defvjp(op_fwd, op_bwd)
    return op(
        u, wqkv, bqkv if has_bqkv else zeros_b3, logit_scale, bias, wproj,
        bproj if has_bproj else zeros_bp, wmerge, bmerge,
    )


def _forward(
    u, wqkv, bqkv, logit_scale, bias, wproj, bproj, wmerge, bmerge,
    *, num_heads, interpret,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tmar.ops.attention import LOGIT_SCALE_MAX

    B, wh, ww, C = u.shape
    A3 = wqkv.shape[1]
    A = A3 // 3
    nh = num_heads
    D = wmerge.shape[1]
    cd = u.dtype

    # host-side param prep: split qkv, squeeze conv, pre-exp the logit scale,
    # flatten the RPB to per-(p, q) rows
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

    kernel = functools.partial(
        _ngram_kernel, wh=wh, ww=ww, C=C, A=A, nh=nh, D=D,
    )
    c0 = lambda b: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, wh, ww, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, A), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, A), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, A), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((16, nh), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((A, C), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((A, nh), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, A), c0, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, wh, ww, D), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, wh, ww, D), cd),
        interpret=interpret,
    )(
        u,
        wq.astype(cd), wk.astype(cd), wv.astype(cd),
        bq.astype(jnp.float32), bk.astype(jnp.float32), bv.astype(jnp.float32),
        scale, bias_pq,
        wproj.astype(cd), bp.astype(jnp.float32),
        wm_f.astype(cd), wm_b.astype(cd), bmerge.reshape(1, D).astype(jnp.float32),
        jnp.asarray(_head_onehot(A, nh)).astype(cd),
        jnp.asarray(_head_onehot(A, nh).T).astype(cd),
    )
    return out


def _shift_tokens_fwd(t3, wh, ww):
    """Token maps for the FORWARD sliding window at each grid position:
    t = (di, dj) row-major over {0,1}^2 -> map shifted by (di, dj) with the
    sequence-reflective edge (row/col L-2) spliced past the boundary
    (seq_refl_win_pad(back=False) semantics, tmar.ops.ngram)."""
    right = jnp.concatenate([t3[:, 1:, :], t3[:, ww - 2 : ww - 1, :]], axis=1)
    down = jnp.concatenate([t3[1:, :, :], t3[wh - 2 : wh - 1, :, :]], axis=0)
    downright = jnp.concatenate(
        [right[1:, :, :], right[wh - 2 : wh - 1, :, :]], axis=0
    )
    return [t3, right, down, downright]


def _shift_tokens_bwd(t3, wh, ww):
    """Token maps for the BACKWARD window: t = (di, dj) reads position
    (i - 1 + di, j - 1 + dj), with row/col -1 reflecting to index 1
    (seq_refl_win_pad(back=True) semantics)."""
    left = jnp.concatenate([t3[:, 1:2, :], t3[:, : ww - 1, :]], axis=1)
    up = jnp.concatenate([t3[1:2, :, :], t3[: wh - 1, :, :]], axis=0)
    upleft = jnp.concatenate([left[1:2, :, :], left[: wh - 1, :, :]], axis=0)
    return [upleft, up, left, t3]


def _ngram_kernel(
    x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
    scale_ref, biaspq_ref, wproj_ref, bproj_ref,
    wmf_ref, wmb_ref, bm_ref, h1_ref, h1t_ref, out_ref, *, wh, ww, C, A, nh, D,
):
    R = wh * ww
    cd = x_ref.dtype
    h1_cd = h1_ref[:]                               # [A, nh] head one-hot
    h1t_cd = h1t_ref[:]                             # [nh, A]

    u2 = x_ref[0].reshape(R, C)                     # [R, C]

    def _proj(w_ref, b_ref):
        y = jnp.dot(u2, w_ref[:], preferred_element_type=jnp.float32)
        return y + b_ref[:]                         # [R, A] f32

    q = _proj(wq_ref, bq_ref)
    k = _proj(wk_ref, bk_ref)
    v = _proj(wv_ref, bv_ref).astype(cd)

    def _normalize(t):
        n2 = jnp.dot(
            jnp.square(t).astype(cd), h1_cd, preferred_element_type=jnp.float32
        )                                           # [R, nh]
        inv = (jnp.sqrt(n2) + 1e-12).astype(cd) ** -1
        invA = jnp.dot(inv, h1t_cd, preferred_element_type=jnp.float32)
        return (t * invA).astype(cd)

    qn = _normalize(q)
    kn = _normalize(k)

    qn3 = qn.reshape(wh, ww, A)
    kn3 = kn.reshape(wh, ww, A)
    v3 = v.reshape(wh, ww, A)
    scale = scale_ref[:]                            # [1, nh] f32

    def _direction(shift_fn):
        qs = [t.reshape(R, A) for t in shift_fn(qn3, wh, ww)]
        ks = [t.reshape(R, A) for t in shift_fn(kn3, wh, ww)]
        vs = [t.reshape(R, A) for t in shift_fn(v3, wh, ww)]
        acc = jnp.zeros((R, A), jnp.float32)
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
                a = (e[qi] * inv_z).astype(cd)      # [R, nh]
                aA = jnp.dot(a, h1t_cd, preferred_element_type=jnp.float32)
                acc = acc + aA.astype(cd).astype(jnp.float32) * vs[qi].astype(
                    jnp.float32
                )
        mean = (acc * 0.25).astype(cd)              # [R, A]
        ctx = jnp.dot(mean, wproj_ref[:], preferred_element_type=jnp.float32)
        return (ctx + bproj_ref[:]).astype(cd)      # [R, C]

    ctx_f = _direction(_shift_tokens_fwd)
    ctx_b = _direction(_shift_tokens_bwd)

    merged = (
        jnp.dot(ctx_f, wmf_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(ctx_b, wmb_ref[:], preferred_element_type=jnp.float32)
        + bm_ref[:]
    )
    out_ref[0] = merged.astype(cd).reshape(wh, ww, D)
