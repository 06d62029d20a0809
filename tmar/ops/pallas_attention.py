"""Fused cosine window-attention Pallas TPU kernel.

Fuses the whole per-window attention pipeline of WindowAttention (reference
models/generator/components/attention.py:70-101) into one VMEM-resident
kernel: qkv projection -> L2 normalisation -> scaled-cosine scores ->
relative-position bias (+ decomposed SW-MSA mask) -> softmax -> value matmul
-> output projection.  The XLA path materialises the [B_, nh, N, N] score
tensor in HBM between ops (the dominant HBM traffic of the model); here
scores live and die in VMEM.

MXU-shaping: instead of one tiny [N, N] score matmul per window, each grid
step stacks T windows and computes ONE [T·N, T·N] score matrix per head with
off-diagonal blocks masked to -1e9 before the softmax — T× redundant FLOPs,
but large MXU-friendly dots and zero scatter/gather.  The relative-position
bias and the decomposed SW-MSA masks are pre-tiled to [T·N, T·N] on the host
(tiny constants); the per-window edge gates are computed in-kernel from the
grid index.

Head dim is zero-padded to a lane-friendly multiple — padding q/k with zeros
leaves q·kᵀ unchanged, and the padded rows of the output projection are
zero, so numerics are identical to the XLA path
(tests/test_pallas_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tmar.ops.attention import LOGIT_SCALE_MAX

NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tile_block(mat: np.ndarray, T: int) -> np.ndarray:
    """[N, N] -> [T*N, T*N] with mat[a % N, b % N] everywhere."""
    N = mat.shape[0]
    return np.tile(mat, (T, T))


def fused_window_attention(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: Optional[jnp.ndarray],
    logit_scale: jnp.ndarray,
    bias: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    num_heads: int,
    mask_components: Optional[Tuple] = None,
    windows_per_step: Optional[int] = None,
    interpret: bool = False,
    impl: Optional[str] = None,
    backward: Optional[str] = None,
) -> jnp.ndarray:
    """Differentiable fused window attention.

    Forward: Pallas kernel.  Backward: ``backward="pallas"`` runs the
    hand-written fused backward kernel (recompute-in-VMEM — the score/softmax
    tensors never touch HBM in either direction); ``backward="xla"`` falls
    back to jax.vjp of the equivalent pure function; ``backward="auto"``
    (the default, from ``TMAR_ATTN_BWD``) computes BOTH primal and backward
    via the XLA math whenever the op is differentiated — measured fastest
    for training (PERF.md), while inference still takes the Pallas forward."""
    import os

    if impl is None:
        # per-window batched ops for full-size windows (no [TN, TN] tensors);
        # blockdiag for the tiny n-gram windows (N=4), where merging T
        # windows into one dot IS the MXU shaping (the diag E-extraction
        # variant measured WORSE there — its [TN, 4]-lane dots starve the
        # MXU)
        auto = "batched" if x.shape[1] >= 32 else "blockdiag"
        impl = os.environ.get("TMAR_ATTN_IMPL", auto)
    if windows_per_step is None:
        try:
            env_t = int(os.environ.get("TMAR_ATTN_T", "0"))
        except ValueError:
            env_t = 0
        if env_t > 0:
            # experimental override; large values can exceed the 16 MB
            # scoped-vmem limit (blockdiag pre-tiles grow with T²)
            windows_per_step = env_t
        elif impl.startswith("batched"):
            # no T² cost — bigger tiles amortise the grid; T=32 measured
            # best at N=64 (19.6 ms vs 25.7 at T=8), T=64 exceeds the 16 MB
            # scoped-vmem limit
            windows_per_step = max(1, 2048 // x.shape[1])
        else:
            # target ~512 token rows per grid step
            windows_per_step = max(1, 512 // x.shape[1])
    has_bqkv = bqkv is not None
    has_bproj = bproj is not None
    if backward is None:
        # "auto": pallas kernel when NOT differentiated; pure-XLA math as
        # BOTH primal and backward under grad (training measured faster on
        # the XLA path than any pallas-fwd combination — PERF.md).
        # "pallas": pallas fwd + the hand-written fused backward kernel.
        # "xla": pallas fwd + recompute-VJP through the math.
        backward = os.environ.get("TMAR_ATTN_BWD", "auto")

    from tmar.ops.attention import window_attention_math

    def math_fn(x, wqkv, bqkv, logit_scale, bias, wproj, bproj):
        return window_attention_math(
            x, wqkv, bqkv, logit_scale, bias, wproj, bproj,
            num_heads=num_heads, mask_components=mask_components,
        )

    @jax.custom_vjp
    def op(x, wqkv, bqkv, logit_scale, bias, wproj, bproj):
        return _fused_forward(
            x, wqkv, bqkv if has_bqkv else None, logit_scale, bias, wproj,
            bproj if has_bproj else None, num_heads,
            mask_components=mask_components,
            windows_per_step=windows_per_step,
            interpret=interpret,
            impl=impl,
        )

    def op_fwd(x, wqkv, bqkv, logit_scale, bias, wproj, bproj):
        res = (x, wqkv, bqkv, logit_scale, bias, wproj, bproj)
        if backward == "auto":
            return math_fn(*res), res
        return op(*res), res

    def op_bwd(res, g):
        x = res[0]
        if backward == "pallas":
            return _fused_backward(
                *res, g.astype(x.dtype), num_heads,
                mask_components=mask_components,
                interpret=interpret,
                impl="batched" if impl.startswith("batched") else "blockdiag",
            )
        _, vjp = jax.vjp(math_fn, *res)
        return vjp(g.astype(x.dtype))

    op.defvjp(op_fwd, op_bwd)
    zeros_b3 = jnp.zeros((wqkv.shape[1],), x.dtype)
    zeros_bp = jnp.zeros((wproj.shape[1],), x.dtype)
    return op(
        x, wqkv, bqkv if has_bqkv else zeros_b3, logit_scale, bias, wproj,
        bproj if has_bproj else zeros_bp,
    )


def _ones_block(num_heads, hd_p, sections=2):
    """[sections·nh·hd_p, sections·nh] block-diagonal ones used for the
    MXU-matmul q/k norms; layout must match _pack_params' head packing."""
    A = sections * num_heads * hd_p
    seg = np.arange(A) // hd_p
    return (seg[:, None] == np.arange(sections * num_heads)[None, :]).astype(np.float32)


def _pack_params(wqkv, bqkv, logit_scale, wproj, num_heads, hd, hd_p, dtype):
    """Repack qkv/proj weights head-major with the head dim zero-padded to
    hd_p, plus the exp-clipped per-head scale vector.  Shared by the forward
    and backward kernels (layouts must match exactly)."""
    D = wqkv.shape[0]
    nh = num_heads
    wq = wqkv.reshape(D, 3, nh, hd).transpose(1, 2, 0, 3)  # [3, nh, D, hd]
    wq = jnp.pad(wq, ((0, 0), (0, 0), (0, 0), (0, hd_p - hd)))
    w_packed = wq.transpose(2, 0, 1, 3).reshape(D, 3 * nh * hd_p)
    if bqkv is not None:
        bq = bqkv.reshape(3, nh, hd)
        bq = jnp.pad(bq, ((0, 0), (0, 0), (0, hd_p - hd))).reshape(3 * nh * hd_p)
    else:
        bq = jnp.zeros((3 * nh * hd_p,), jnp.float32)
    wp = wproj.reshape(nh, hd, D)
    wp = jnp.pad(wp, ((0, 0), (0, hd_p - hd), (0, 0))).reshape(nh * hd_p, D)
    scale_vec = jnp.exp(
        jnp.clip(logit_scale.reshape(nh).astype(jnp.float32), max=LOGIT_SCALE_MAX)
    )
    return w_packed.astype(dtype), bq, wp.astype(dtype), scale_vec


def _unpack_wqkv_grad(dw_packed, dbq_packed, num_heads, hd, hd_p, A):
    """Inverse of _pack_params for the qkv weight/bias gradients (drop the
    zero-padding columns)."""
    D = dw_packed.shape[0]
    nh = num_heads
    dw = dw_packed.reshape(D, 3, nh, hd_p)[..., :hd].reshape(D, 3 * A)
    dbq = dbq_packed.reshape(3, nh, hd_p)[..., :hd].reshape(3 * A)
    return dw, dbq


def _fused_forward(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: Optional[jnp.ndarray],
    logit_scale: jnp.ndarray,
    bias: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    num_heads: int,
    mask_components: Optional[Tuple] = None,
    windows_per_step: int = 8,
    interpret: bool = False,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Fused window attention (forward only).

    Args:
        x: [B_, N, D] window tokens (B_ = batch·wh·ww).
        wqkv: [D, 3·A] fused qkv weight (A = nh·hd), bqkv: [3·A] or None.
        logit_scale: [nh, 1, 1] log-domain scale.
        bias: [nh, N, N] relative-position bias (pre-gathered, f32).
        wproj: [A, D], bproj: [D].
        num_heads: nh.
        mask_components: optional (m_row [N,N], m_col [N,N], wh, ww).
        windows_per_step: T, windows per grid step.

    Returns: [B_, N, D] attention output, x.dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B_, N, D = x.shape
    A3 = wqkv.shape[1]
    A = A3 // 3
    nh = num_heads
    hd = A // nh
    hd_p = max(_round_up(hd, 8), 8)
    T = windows_per_step
    TN = T * N

    out_dtype = x.dtype
    w_packed, bq, wp, scale_vec = _pack_params(
        wqkv, bqkv, logit_scale, wproj, nh, hd, hd_p, out_dtype
    )

    import os

    # default: per-window batched ops for full-size windows (no [TN, TN]
    # tensors — measured 25.7 vs 44.5 ms/layer at 512²); blockdiag for the
    # tiny n-gram windows (N=4), where merging T windows into one dot IS
    # the MXU shaping
    auto = "batched" if N >= 32 else "blockdiag"
    impl = impl or os.environ.get("TMAR_ATTN_IMPL", auto)

    if impl.startswith("batched"):
        # raw per-window constants — the batched kernel broadcasts over T
        bias_big = bias.astype(jnp.float32)          # [nh, N, N]
        if mask_components is not None:
            m_row, m_col, wh, ww = mask_components
            mrow_big = jnp.asarray(m_row, jnp.float32)
            mcol_big = jnp.asarray(m_col, jnp.float32)
        else:
            wh = ww = 0
            mrow_big = jnp.zeros((N, N), jnp.float32)
            mcol_big = jnp.zeros((N, N), jnp.float32)
    elif impl == "diag":
        # vertical [·, TN, N] tiles: softmax/bias/mask run on the diagonal
        # blocks only (see _attn_kernel_diag)
        bias_big = jnp.tile(bias.astype(jnp.float32), (1, T, 1))  # [nh, TN, N]
        if mask_components is not None:
            m_row, m_col, wh, ww = mask_components
            mrow_big = jnp.tile(jnp.asarray(m_row, jnp.float32), (T, 1))
            mcol_big = jnp.tile(jnp.asarray(m_col, jnp.float32), (T, 1))
        else:
            wh = ww = 0
            mrow_big = jnp.zeros((TN, N), jnp.float32)
            mcol_big = jnp.zeros((TN, N), jnp.float32)
    else:
        # --- pre-tiled [TN, TN] additive terms ------------------------------
        # off-block-diagonal -> NEG (token only attends inside its own window)
        blk = np.kron(np.eye(T, dtype=np.float32), np.ones((N, N), np.float32))
        offdiag = (1.0 - blk) * NEG
        bias_big = jnp.asarray(offdiag)[None] + jnp.tile(
            bias.astype(jnp.float32), (1, T, T)
        )  # [nh, TN, TN]

        if mask_components is not None:
            m_row, m_col, wh, ww = mask_components
            mrow_big = jnp.asarray(_tile_block(np.asarray(m_row, np.float32), T))
            mcol_big = jnp.asarray(_tile_block(np.asarray(m_col, np.float32), T))
        else:
            wh = ww = 0
            mrow_big = jnp.zeros((TN, TN), jnp.float32)
            mcol_big = jnp.zeros((TN, TN), jnp.float32)

    pad_windows = (-B_) % T
    if pad_windows:
        x = jnp.concatenate([x, jnp.zeros((pad_windows, N, D), x.dtype)])
    Bp = x.shape[0]
    x2 = x.reshape(Bp * N, D)
    out_dtype = x.dtype

    kernel_fn = {
        "packed": _attn_kernel_packed,
        "diag": _attn_kernel_diag,
        "batched": _attn_kernel_batched,
        "batched_hm": _attn_kernel_batched,
    }.get(impl, _attn_kernel)
    kw = {"mxu_norms": True} if impl == "blockdiag_mxnorm" else {}
    if impl == "batched_hm":
        kw = {"merge_heads": True}
    if impl.startswith("batched"):
        kw["hd"] = hd
    kernel = functools.partial(
        kernel_fn, T=T, N=N, D=D, nh=nh, hd_p=hd_p, wh=wh, ww=ww, **kw,
    )
    Ncol = N if impl == "diag" else TN
    if impl.startswith("batched"):
        Nrow, Ncol = N, N
    else:
        Nrow = TN

    in_specs = [
        pl.BlockSpec((TN, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, 3 * nh * hd_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * nh * hd_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nh, Nrow, Ncol), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nh * hd_p, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Nrow, Ncol), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Nrow, Ncol), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [
        x2,
        w_packed.astype(out_dtype),
        bq.reshape(1, -1).astype(jnp.float32),
        scale_vec.reshape(1, nh),
        bias_big,
        wp.astype(out_dtype),
        (bproj if bproj is not None else jnp.zeros((D,))).reshape(1, D).astype(jnp.float32),
        mrow_big,
        mcol_big,
    ]
    A2 = 2 * nh * hd_p
    ones_np = _ones_block(nh, hd_p)
    if impl == "diag":
        blk_np = np.kron(np.eye(T, dtype=np.float32), np.ones((N, N), np.float32))
        e_np = np.tile(np.eye(N, dtype=np.float32), (T, 1))
        in_specs += [
            pl.BlockSpec((TN, TN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A2, 2 * nh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        operands += [jnp.asarray(blk_np), jnp.asarray(e_np), jnp.asarray(ones_np)]
    elif impl.startswith("batched"):
        in_specs += [
            pl.BlockSpec((A2, 2 * nh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        operands += [jnp.asarray(ones_np)]

    out = pl.pallas_call(
        kernel,
        grid=(Bp // T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TN, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp * N, D), out_dtype),
        interpret=interpret,
    )(*operands)
    out = out.reshape(Bp, N, D)
    return out[:B_] if pad_windows else out


def _fused_backward(
    x, wqkv, bqkv, logit_scale, bias, wproj, bproj, g, num_heads,
    mask_components=None, interpret=False, windows_per_step=None,
    impl=None,
):
    """Hand-written fused backward: recomputes the forward per block in VMEM
    and emits all seven cotangents in one kernel.  Weight/bias/scale grads
    are grid-accumulated f32 outputs (constant index map, init at step 0);
    scores/softmax never touch HBM — same property as the forward.

    ``impl="batched"`` (default for N >= 32, matching the forward) runs the
    whole backward on [T, N, N] batched tensors — no [TN, TN] anywhere, so
    the working set is tiny and T can be large."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B_, N, D = x.shape
    A3 = wqkv.shape[1]
    A = A3 // 3
    nh = num_heads
    hd = A // nh
    hd_p = max(_round_up(hd, 8), 8)
    A_p = nh * hd_p
    import os

    if impl is None:
        impl = "batched" if N >= 32 else "blockdiag"
    if windows_per_step is not None:
        T = windows_per_step
    elif impl == "batched":
        # match the forward's batched tiling (T = 2048//N): bigger tiles
        # amortise the grid.  The backward's ~1 MB/window live set (~2x the
        # forward's) overflows the default 16 MB scoped vmem past T=8 at
        # N=64, so T*N > 512 takes the conditional 64 MB compiler grant on
        # the pallas_call below.  Measured on-chip (b8·128² promoted train
        # step, PERF.md r4 roofline section): T=8 112.5 ms/step, T=16
        # 105.1, T=32 102.0.  TMAR_ATTN_BWD_T overrides.
        try:
            env_t = int(os.environ.get("TMAR_ATTN_BWD_T", "0"))
        except ValueError:
            env_t = 0
        T = env_t if env_t > 0 else max(1, 2048 // N)
    else:
        # the blockdiag backward holds ~4 live [TN, TN] f32 tensors per head
        T = max(1, 256 // N)
    TN = T * N

    w_packed, bq, wp, scale_vec = _pack_params(
        wqkv, bqkv, logit_scale, wproj, nh, hd, hd_p, x.dtype
    )

    if impl == "batched":
        bias_big = bias.astype(jnp.float32)          # [nh, N, N]
        if mask_components is not None:
            m_row, m_col, wh, ww = mask_components
            mrow_big = jnp.asarray(m_row, jnp.float32)
            mcol_big = jnp.asarray(m_col, jnp.float32)
        else:
            wh = ww = 0
            mrow_big = jnp.zeros((N, N), jnp.float32)
            mcol_big = jnp.zeros((N, N), jnp.float32)
    else:
        blk = np.kron(np.eye(T, dtype=np.float32), np.ones((N, N), np.float32))
        bias_big = jnp.asarray((1.0 - blk) * NEG)[None] + jnp.tile(
            bias.astype(jnp.float32), (1, T, T)
        )
        if mask_components is not None:
            m_row, m_col, wh, ww = mask_components
            mrow_big = jnp.asarray(_tile_block(np.asarray(m_row, np.float32), T))
            mcol_big = jnp.asarray(_tile_block(np.asarray(m_col, np.float32), T))
        else:
            wh = ww = 0
            mrow_big = jnp.zeros((TN, TN), jnp.float32)
            mcol_big = jnp.zeros((TN, TN), jnp.float32)

    pad_windows = (-B_) % T
    if pad_windows:
        zpad = jnp.zeros((pad_windows, N, D), x.dtype)
        x = jnp.concatenate([x, zpad])
        g = jnp.concatenate([g.astype(x.dtype), zpad])
    Bp = x.shape[0]
    x2 = x.reshape(Bp * N, D)
    g2 = g.astype(x.dtype).reshape(Bp * N, D)

    kernel_fn = (
        _attn_bwd_kernel_batched if impl == "batched" else _attn_bwd_kernel
    )
    kwargs = dict(T=T, N=N, D=D, nh=nh, hd_p=hd_p, wh=wh, ww=ww)
    if impl == "batched":
        # cotangent-dot dtype ablation (VERDICT r4 next #4): the backward's
        # gradient dots accumulate in f32 either way; running their OPERANDS
        # in bf16 matches the numerics class of the XLA bf16 backward this
        # kernel is equivalence-tested against (XLA computes bf16 models'
        # grad dots in bf16 too) at the MXU's native rate.
        # On-chip ablation (PERF.md backward section, b8·128² promoted
        # step): f32/T32 103.9 ms, f32/T64 101.6, bf16/T32 101.2, bf16/T64
        # 105.4 (the 96 MB vmem grant it needs costs more than the tiling
        # buys).  On TPU the bf16 mode is a pure bandwidth win: Mosaic
        # already truncates f32 dot operands to one bf16 MXU pass at
        # default precision, and the on-chip vjp diff measured ALL seven
        # cotangents bit-identical between modes — the casts just halve
        # the operands' VMEM traffic.  Default: bf16 cotangent dots for
        # bf16 inputs; f32 inputs stay f32 (CPU interpret runs true f32
        # dots, where the cast WOULD change numerics — tolerance test
        # covers it).  TMAR_ATTN_BWD_COT=f32|bf16 overrides.
        cot_env = os.environ.get("TMAR_ATTN_BWD_COT", "")
        kwargs["cot_bf16"] = (
            cot_env == "bf16" if cot_env else x.dtype == jnp.bfloat16
        )
    kernel = functools.partial(kernel_fn, **kwargs)
    Nrow, Ncol = (N, N) if impl == "batched" else (TN, TN)
    const = lambda i: (0, 0)  # noqa: E731
    dx, dw_p, dbq_p, dscale, dbias, dwp_p, dbp = pl.pallas_call(
        kernel,
        grid=(Bp // T,),
        in_specs=[
            pl.BlockSpec((TN, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * A_p), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * A_p), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, Nrow, Ncol), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A_p, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Nrow, Ncol), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Nrow, Ncol), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * A_p, 2 * nh), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TN, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * A_p), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * A_p), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, N, N), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A_p, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp * N, D), x.dtype),
            jax.ShapeDtypeStruct((D, 3 * A_p), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * A_p), jnp.float32),
            jax.ShapeDtypeStruct((nh, 1), jnp.float32),
            jax.ShapeDtypeStruct((nh, N, N), jnp.float32),
            jax.ShapeDtypeStruct((A_p, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        # the batched backward's live set is ~1 MB/window at N=64: T past
        # the default 512//N needs more than the 16 MB default scoped vmem
        # (granted conditionally — the grant alone costs ~2% when unused,
        # PERF.md stacked-head note).  The bf16-cotangent mode adds cast
        # copies of the dot operands (~1.2 MB over 64 MB at T=64·N=64,
        # measured OOM in the r5 ablation), so it takes a 96 MB grant at
        # the largest tiling.
        compiler_params=(
            pltpu.CompilerParams(
                vmem_limit_bytes=(
                    96 if kwargs.get("cot_bf16") and T * N > 2048 else 64
                ) * 1024 * 1024
            )
            if impl == "batched" and T * N > 512
            else None
        ),
        interpret=interpret,
    )(
        x2,
        g2,
        w_packed,
        bq.reshape(1, -1).astype(jnp.float32),
        scale_vec.reshape(1, nh),
        bias_big,
        wp,
        mrow_big,
        mcol_big,
        jnp.asarray(_ones_block(nh, hd_p)),
    )

    dx = dx.reshape(Bp, N, D)
    if pad_windows:
        dx = dx[:B_]
    dwqkv, dbqkv = _unpack_wqkv_grad(dw_p, dbq_p[0], nh, hd, hd_p, A)
    dwproj = dwp_p.reshape(nh, hd_p, D)[:, :hd].reshape(A, D)
    # route the per-head scale grad through exp(clip(·)) exactly as XLA would
    _, vjp_scale = jax.vjp(
        lambda t: jnp.exp(
            jnp.clip(t.reshape(nh).astype(jnp.float32), max=LOGIT_SCALE_MAX)
        ),
        logit_scale,
    )
    (dls,) = vjp_scale(dscale.reshape(nh))
    return (
        dx.astype(x.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(wqkv.dtype),
        dls.astype(logit_scale.dtype),
        dbias.astype(bias.dtype),
        dwproj.astype(wproj.dtype),
        dbp.reshape(D).astype(wproj.dtype),
    )


def _attn_bwd_kernel_batched(
    x_ref, g_ref, wqkv_ref, bqkv_ref, scale_ref, bias_ref, wproj_ref,
    mrow_ref, mcol_ref, ones_ref,
    dx_ref, dw_ref, dbq_ref, dscale_ref, dbias_ref, dwp_ref, dbp_ref,
    *, T, N, D, nh, hd_p, wh, ww, cot_bf16=False,
):
    """Batched-shape fused backward: recomputes the forward and emits all
    seven cotangents with every score-sized tensor shaped [T, N, N] — no
    [TN, TN] working set, MXU-matmul q/k norms (and their backward as two
    MXU dots), batched dot_generals throughout.  ``bias_ref`` is the raw
    [nh, N, N] bias; ``mrow_ref``/``mcol_ref`` raw [N, N].  ``cot_bf16``
    runs the cotangent dots' operands in bf16 (f32 accumulation kept)."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    TN = T * N
    A_p = nh * hd_p
    A2 = 2 * A_p
    # cotangent-dot operand dtype (accumulation stays f32 via
    # preferred_element_type on every dot below)
    gdt = jnp.bfloat16 if cot_bf16 else jnp.float32

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dbq_ref[:] = jnp.zeros_like(dbq_ref)
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dwp_ref[:] = jnp.zeros_like(dwp_ref)
        dbp_ref[:] = jnp.zeros_like(dbp_ref)

    x = x_ref[:]                                     # [TN, D]
    gf = g_ref[:].astype(jnp.float32)
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0, :]

    shift_mask = None
    if wh and ww:
        shift_mask = batched_window_gates(
            i * T, mrow_ref, mcol_ref, T=T, wh=wh, ww=ww, wrap=True
        )

    # recompute MXU norms (forward layout)
    qk = qkv[:, :A2]
    sums = jnp.dot(qk * qk, ones_ref[:], preferred_element_type=jnp.float32)
    inv = jax.lax.rsqrt(sums + 1e-24)                # [TN, 2nh]
    mult = jnp.dot(inv, ones_ref[:].T, preferred_element_type=jnp.float32)
    qk_n = qk * mult                                 # [TN, 2A_p] normalised

    # the recomputed primal must match the forward kernel bit-for-bit, so the
    # recompute dots (cos, o) take operands in the SAME compute dtype the
    # forward used (x.dtype: bf16 on TPU, f32 in CPU tests); cotangent math
    # stays f32-accumulated
    cdt = x.dtype
    dqkn_parts = []                                  # d(qn)/d(kn) pre-norm-bwd
    dv_parts = []
    accs = []
    for h in range(nh):
        qn = qk_n[:, h * hd_p : (h + 1) * hd_p].reshape(T, N, hd_p)
        kn = qk_n[:, (nh + h) * hd_p : (nh + h) * hd_p + hd_p].reshape(T, N, hd_p)
        v = qkv[:, (2 * nh + h) * hd_p : (2 * nh + h) * hd_p + hd_p].reshape(T, N, hd_p)
        cos = jax.lax.dot_general(
            qn.astype(cdt), kn.astype(cdt), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                            # [T, N, N]
        s = cos * scale_ref[0, h] + bias_ref[h][None]
        if shift_mask is not None:
            s = s + shift_mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(cdt), v.astype(cdt), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                            # [T, N, hd_p]
        accs.append(o.reshape(TN, hd_p))

        wp_h = wproj_ref[h * hd_p : (h + 1) * hd_p, :].astype(gdt)
        dacc = jax.lax.dot_general(                  # g @ wp_hᵀ -> [TN, hd_p]
            gf.astype(gdt), wp_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(T, N, hd_p)
        dp = jax.lax.dot_general(                    # [T, N, N]
            dacc.astype(gdt), v.astype(gdt), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dv = jax.lax.dot_general(                    # pᵀ @ dacc -> [T, N(m), hd_p]
            p.astype(gdt), dacc.astype(gdt), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

        dbias_ref[h] += jnp.sum(ds, axis=0)
        dscale_ref[h : h + 1, :] += jnp.sum(ds * cos).reshape(1, 1)

        dcos = ds * scale_ref[0, h]
        dqn = jax.lax.dot_general(                   # [T, N, hd_p]
            dcos.astype(gdt), kn.astype(gdt), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dkn = jax.lax.dot_general(                   # dcosᵀ @ qn over n
            dcos.astype(gdt), qn.astype(gdt), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkn_parts.append((dqn.reshape(TN, hd_p), dkn.reshape(TN, hd_p)))
        dv_parts.append(dv.reshape(TN, hd_p))

    # L2-norm backward for all heads at once via the MXU-ones trick:
    # dq = inv·(dqn − qn·(dqn·qn))  per head segment
    u = jnp.concatenate(
        [dq for dq, _ in dqkn_parts] + [dk for _, dk in dqkn_parts], axis=-1
    )                                                # [TN, 2A_p]
    dots = jnp.dot(u * qk_n, ones_ref[:], preferred_element_type=jnp.float32)
    corr = jnp.dot(dots, ones_ref[:].T, preferred_element_type=jnp.float32)
    dqk = mult * (u - qk_n * corr)                   # [TN, 2A_p]

    acc = jnp.concatenate(accs, axis=-1)             # [TN, A_p] f32
    dwp_ref[:] += jax.lax.dot_general(               # accᵀ @ g -> [A_p, D]
        acc.astype(gdt), gf.astype(gdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbp_ref[:] += jnp.sum(gf, axis=0, keepdims=True)

    dqkv = jnp.concatenate([dqk] + dv_parts, axis=-1)  # [TN, 3·A_p] f32
    dx = jax.lax.dot_general(                          # dqkv @ wqkvᵀ -> [TN, D]
        dqkv.astype(gdt), wqkv_ref[:].astype(gdt),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dx_ref[:] = dx.astype(dx_ref.dtype)
    dw_ref[:] += jax.lax.dot_general(                  # xᵀ @ dqkv -> [D, 3·A_p]
        x.astype(gdt), dqkv.astype(gdt),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dbq_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)


def _attn_bwd_kernel(
    x_ref, g_ref, wqkv_ref, bqkv_ref, scale_ref, bias_ref, wproj_ref,
    mrow_ref, mcol_ref, ones_ref,  # ones_ref unused here: this blockdiag
    # kernel keeps per-head rsqrt norms; the operand exists only so both
    # backward kernels share _fused_backward's operand list
    dx_ref, dw_ref, dbq_ref, dscale_ref, dbias_ref, dwp_ref, dbp_ref,
    *, T, N, D, nh, hd_p, wh, ww,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    TN = T * N

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dbq_ref[:] = jnp.zeros_like(dbq_ref)
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dwp_ref[:] = jnp.zeros_like(dwp_ref)
        dbp_ref[:] = jnp.zeros_like(dbp_ref)

    x = x_ref[:]                                     # [TN, D]
    gf = g_ref[:].astype(jnp.float32)
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0, :]

    if wh and ww:
        tok = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0)
        widx = (i * T + tok // N) % (wh * ww)
        row_gate = (widx // ww == wh - 1).astype(jnp.float32)
        col_gate = (widx % ww == ww - 1).astype(jnp.float32)
        shift_mask = row_gate * mrow_ref[:] + col_gate * mcol_ref[:]
    else:
        shift_mask = None

    # E [N, TN]: T horizontally-tiled identities; E @ M @ Eᵀ sums M's NxN
    # blocks (ds is zero off the block diagonal, so this is exactly the
    # tile-gradient of the pre-tiled bias)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, TN), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (N, TN), 0)
    E = (col % N == row).astype(jnp.float32)

    dqs, dks, dvs, outs = [], [], [], []
    for h in range(nh):
        q = qkv[:, (0 * nh + h) * hd_p : (0 * nh + h) * hd_p + hd_p]
        k = qkv[:, (1 * nh + h) * hd_p : (1 * nh + h) * hd_p + hd_p]
        v = qkv[:, (2 * nh + h) * hd_p : (2 * nh + h) * hd_p + hd_p]
        rq = jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
        rk = jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)
        qn = q * rq
        kn = k * rk
        cos = jax.lax.dot_general(
            qn, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                            # [TN, TN]
        s = cos * scale_ref[0, h] + bias_ref[h]
        if shift_mask is not None:
            s = s + shift_mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)   # f32 [TN, TN]
        outs.append(jnp.dot(p, v, preferred_element_type=jnp.float32))

        wp_h = wproj_ref[h * hd_p : (h + 1) * hd_p, :].astype(jnp.float32)
        dacc = jax.lax.dot_general(                  # g @ wp_hᵀ -> [TN, hd_p]
            gf, wp_h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(                    # dacc @ vᵀ -> [TN, TN]
            dacc, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dv = jax.lax.dot_general(                    # pᵀ @ dacc -> [TN, hd_p]
            p, dacc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

        d1 = jnp.dot(E, ds, preferred_element_type=jnp.float32)      # [N, TN]
        dbias_ref[h] += jax.lax.dot_general(
            d1, E, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dscale_ref[h : h + 1, :] += jnp.sum(ds * cos).reshape(1, 1)

        dcos = ds * scale_ref[0, h]
        dqn = jnp.dot(dcos, kn, preferred_element_type=jnp.float32)
        dkn = jax.lax.dot_general(                   # dcosᵀ @ qn
            dcos, qn, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dqs.append(rq * (dqn - qn * jnp.sum(dqn * qn, axis=-1, keepdims=True)))
        dks.append(rk * (dkn - kn * jnp.sum(dkn * kn, axis=-1, keepdims=True)))
        dvs.append(dv)

    acc = jnp.concatenate(outs, axis=-1)             # [TN, A_p] f32
    dwp_ref[:] += jax.lax.dot_general(               # accᵀ @ g -> [A_p, D]
        acc, gf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbp_ref[:] += jnp.sum(gf, axis=0, keepdims=True)

    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # [TN, 3·A_p] f32
    dx = jax.lax.dot_general(                         # dqkv @ wqkvᵀ -> [TN, D]
        dqkv, wqkv_ref[:].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dx_ref[:] = dx.astype(dx_ref.dtype)
    dw_ref[:] += jax.lax.dot_general(                 # xᵀ @ dqkv -> [D, 3·A_p]
        x.astype(jnp.float32), dqkv,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dbq_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)


def _attn_kernel_packed(
    x_ref, wqkv_ref, bqkv_ref, scale_ref, bias_ref, wproj_ref, bproj_ref,
    mrow_ref, mcol_ref, out_ref, *, T, N, D, nh, hd_p, wh, ww,
):
    """EXPERIMENTAL head-packed variant (interpret-verified; currently fails
    Mosaic layout inference on hardware — "unsupported shape cast" — see
    PERF.md): both attention dots run at full MXU width by
    block-diagonalising K and V over heads —
        S_all [TN, nh·TN] = Qn_all [TN, nh·hd_p] @ K_bd [nh·hd_p, nh·TN]
        out   [TN, nh·hd_p] = P_all [TN, nh·TN] @ V_bd [nh·TN, nh·hd_p]
    where K_bd/V_bd zero the cross-head blocks.  ~nh× more MACs than the
    per-head loop but ~8× better MXU utilisation at hd_p=16."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    TN = T * N
    A_p = nh * hd_p
    x = x_ref[:]                                    # [TN, D]
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0, :]

    q = qkv[:, :A_p]                                # [TN, nh·hd_p], head-major
    k = qkv[:, A_p : 2 * A_p]
    v = qkv[:, 2 * A_p :]

    # per-head L2 normalisation via segment sums over the head blocks
    d_head = jax.lax.broadcasted_iota(jnp.int32, (1, A_p), 1) // hd_p  # [1, A_p]

    def seg_norm(m):
        sq = m * m
        # sum within each head block: [TN, nh]
        sums = jnp.sum(sq.reshape(TN, nh, hd_p), axis=-1)
        inv = jax.lax.rsqrt(sums + 1e-24)            # [TN, nh]
        return m * jnp.repeat(inv, hd_p, axis=1)

    qn = seg_norm(q) * jnp.repeat(scale_ref[:], hd_p, axis=1)
    kn = seg_norm(k)

    # block-diagonal K over heads: [A_p, nh·TN]
    col_head = jax.lax.broadcasted_iota(jnp.int32, (A_p, nh * TN), 1) // TN
    row_head = jax.lax.broadcasted_iota(jnp.int32, (A_p, nh * TN), 0) // hd_p
    k_tile = jnp.broadcast_to(kn.T[:, None, :], (A_p, nh, TN)).reshape(A_p, nh * TN)
    k_bd = jnp.where(col_head == row_head, k_tile, 0.0)

    s_all = jnp.dot(qn.astype(x.dtype), k_bd.astype(x.dtype),
                    preferred_element_type=jnp.float32)      # [TN, nh·TN]
    s3 = s_all.reshape(TN, nh, TN) + bias_ref[:].transpose(1, 0, 2)  # bias [nh,TN,TN] -> [TN,nh,TN]

    if wh and ww:
        tok = jax.lax.broadcasted_iota(jnp.int32, (TN, 1, 1), 0)
        widx = (i * T + tok // N) % (wh * ww)
        row_gate = (widx // ww == wh - 1).astype(jnp.float32)
        col_gate = (widx % ww == ww - 1).astype(jnp.float32)
        shift = row_gate * mrow_ref[:][:, None, :] + col_gate * mcol_ref[:][:, None, :]
        s3 = s3 + shift

    s3 = s3 - jnp.max(s3, axis=-1, keepdims=True)
    e = jnp.exp(s3)
    p3 = e / jnp.sum(e, axis=-1, keepdims=True)
    p_all = p3.reshape(TN, nh * TN)

    # block-diagonal V: [nh·TN, A_p]
    row_head_v = jax.lax.broadcasted_iota(jnp.int32, (nh * TN, A_p), 0) // TN
    col_head_v = jax.lax.broadcasted_iota(jnp.int32, (nh * TN, A_p), 1) // hd_p
    v_tile = jnp.broadcast_to(v[None, :, :], (nh, TN, A_p)).reshape(nh * TN, A_p)
    v_bd = jnp.where(row_head_v == col_head_v, v_tile, 0.0)

    acc = jnp.dot(p_all.astype(x.dtype), v_bd.astype(x.dtype),
                  preferred_element_type=jnp.float32)        # [TN, A_p]
    proj = jnp.dot(acc.astype(wproj_ref.dtype), wproj_ref[:],
                   preferred_element_type=jnp.float32)
    out_ref[:] = (proj + bproj_ref[0, :]).astype(out_ref.dtype)


def batched_window_gates(widx0, mrow_ref, mcol_ref, *, T, wh, ww, wrap):
    """Per-window SW-MSA shift mask [T, N, N] from the grid-derived window
    index base ``widx0`` (traced scalar).  ``wrap``: apply the modulo for
    flat-window grids whose padding wraps past wh·ww."""
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0)
    widx = widx0 + w_iota
    if wrap:
        widx = widx % (wh * ww)
    row_gate = (widx // ww == wh - 1).astype(jnp.float32)
    col_gate = (widx % ww == ww - 1).astype(jnp.float32)
    return row_gate * mrow_ref[:][None] + col_gate * mcol_ref[:][None]


def batched_attention_core(
    qkv, shift_mask, scale_ref, bias_ref, ones_ref, *, T, N, nh, hd_p,
    hd=None, merge_heads=False, compute_dtype=jnp.bfloat16,
):
    """Shared per-window batched attention (used by _attn_kernel_batched
    and the fused NSTB kernels): qkv [TN, 3·nh·hd_p] (f32, bias added) ->
    pre-projection concat of head outputs [TN, nh·hd_p] (f32).

    q/k L2 norms run as ONE MXU matmul against block-diagonal ones
    (``ones_ref`` [2·A_p, 2·nh]); scores/softmax/AV are [T, N, N] batched
    ``dot_general`` ops — no [TN, TN] tensor exists anywhere.

    ``merge_heads``: run ALL heads' score/AV matmuls as ONE batched dot
    each against head-block-diagonal K/V ([T, N, nh·N] scores) — nh× the
    MACs but ~2nh× fewer dot issues (per-head chain cost measured
    2.9 ms/head/layer at 512²); softmax stays per head on aligned lane
    slices.


    (A "max-free softmax" via host-pre-shifted bias was tried and REVERTED:
    q and k are different projections, so cos(q_i, k_i) != 1 and a row's
    max logit has no static lower bound — at a saturated logit_scale
    entire rows underflow to 0 and softmax returns NaN.  The per-row
    max-subtract is load-bearing; it costs ~0.4 ms/layer at 512².)"""
    TN = T * N
    A_p = nh * hd_p
    A2 = 2 * A_p
    qk = qkv[:, :A2]
    sums = jnp.dot(qk * qk, ones_ref[:], preferred_element_type=jnp.float32)
    inv = jax.lax.rsqrt(sums + 1e-24)
    mult = jnp.dot(inv, ones_ref[:].T, preferred_element_type=jnp.float32)
    qk_n = qk * mult

    if merge_heads:
        q3 = qk_n[:, :A_p].astype(compute_dtype).reshape(T, N, A_p)
        kn3 = qk_n[:, A_p:A2].astype(compute_dtype).reshape(T, N, A_p)
        v3 = qkv[:, A2:].astype(compute_dtype).reshape(T, N, A_p)

        # block-diag K over heads: [T, A_p, nh·N]
        kt = jnp.transpose(kn3, (0, 2, 1))           # [T, A_p, N]
        rows_k = jax.lax.broadcasted_iota(jnp.int32, (A_p, nh * N), 0) // hd_p
        cols_k = jax.lax.broadcasted_iota(jnp.int32, (A_p, nh * N), 1) // N
        mask_k = (rows_k == cols_k).astype(compute_dtype)
        k_bd = jnp.concatenate([kt] * nh, axis=2) * mask_k[None]
        s_all = jax.lax.dot_general(                 # [T, N, nh·N]
            q3, k_bd, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

        p_parts = []
        for h in range(nh):
            s = s_all[:, :, h * N : (h + 1) * N]
            s = s * scale_ref[0, h] + bias_ref[h][None]
            if shift_mask is not None:
                s = s + shift_mask
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p_parts.append(e / jnp.sum(e, axis=-1, keepdims=True))
        p_all = jnp.concatenate(
            [p.astype(compute_dtype) for p in p_parts], axis=2
        )                                            # [T, N, nh·N]

        # block-diag V over heads: [T, nh·N, A_p]
        rows_v = jax.lax.broadcasted_iota(jnp.int32, (nh * N, A_p), 0) // N
        cols_v = jax.lax.broadcasted_iota(jnp.int32, (nh * N, A_p), 1) // hd_p
        mask_v = (rows_v == cols_v).astype(compute_dtype)
        v_bd = jnp.concatenate([v3] * nh, axis=1) * mask_v[None]
        out_all = jax.lax.dot_general(               # [T, N, A_p]
            p_all, v_bd, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return out_all.reshape(TN, A_p)

    import os

    g = int(os.environ.get("TMAR_ATTN_STACK", "0") or "0")
    if g > 1:
        # STACKED-HEAD path (ablation-only, default OFF): heads processed in
        # groups of ``g`` with the group's scores row-concatenated to
        # [g·T, N, N], so bias/mask add + max/exp/sum/div run as nh/g
        # elementwise/reduction chains instead of nh per-head chains.
        # MEASURED WORSE at 512² (g=2: 568 ms, g=3: 571 ms vs per-head
        # 502 ms/batch): the sublane-dim q/k/v/bias concat copies cost more
        # than the merged softmax chains save — same verdict as the
        # lane-dim head pairing (PERF.md).  Kept for the ablation record;
        # the logit scale folds into q before the score dot (q is
        # L2-normalised first, so scaling commutes).
        outs = [None] * nh
        for h0 in range(0, nh, g):
            hs = list(range(h0, min(h0 + g, nh)))
            q_st = jnp.concatenate(
                [
                    (qk_n[:, h * hd_p : (h + 1) * hd_p] * scale_ref[0, h])
                    .astype(compute_dtype)
                    .reshape(T, N, hd_p)
                    for h in hs
                ],
                axis=0,
            )                                        # [g·T, N, hd_p]
            k_st = jnp.concatenate(
                [
                    qk_n[:, (nh + h) * hd_p : (nh + h) * hd_p + hd_p]
                    .astype(compute_dtype)
                    .reshape(T, N, hd_p)
                    for h in hs
                ],
                axis=0,
            )
            v_st = jnp.concatenate(
                [
                    qkv[:, (2 * nh + h) * hd_p : (2 * nh + h) * hd_p + hd_p]
                    .astype(compute_dtype)
                    .reshape(T, N, hd_p)
                    for h in hs
                ],
                axis=0,
            )
            s = jax.lax.dot_general(                 # [g·T, N, N] = scale·cos
                q_st, k_st, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            s = s + jnp.concatenate(
                [jnp.broadcast_to(bias_ref[h][None], (T, N, N)) for h in hs],
                axis=0,
            )
            if shift_mask is not None:
                s = s + jnp.concatenate([shift_mask] * len(hs), axis=0)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(                 # [g·T, N, hd_p]
                p.astype(compute_dtype), v_st, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for j, h in enumerate(hs):
                outs[h] = o[j * T : (j + 1) * T].reshape(TN, hd_p)
        return jnp.concatenate(outs, axis=-1)        # [TN, nh·hd_p]

    mode = int(os.environ.get("TMAR_ATTN_POSTNORM", "0") or "0")
    scale_fold = hd is not None and mode >= 1
    av_norm = hd is not None and mode == 1
    head_outs = []
    for h in range(nh):
        # dot inputs in compute_dtype (f32 accumulation): bf16 inputs run
        # the MXU at full rate — f32-input dots measured 8× slower and the
        # XLA path itself feeds the score einsum bf16 operands
        qn = qk_n[:, h * hd_p : (h + 1) * hd_p]
        if scale_fold:
            # fold the logit scale into q BEFORE the score dot (L2-norm
            # then scale commutes): the [T, N, N] scale-multiply pass
            # becomes a [TN, hd_p] one fused into the dtype cast
            qn = qn * scale_ref[0, h]
        qn = qn.astype(compute_dtype).reshape(T, N, hd_p)
        kn = (
            qk_n[:, (nh + h) * hd_p : (nh + h) * hd_p + hd_p]
            .astype(compute_dtype)
            .reshape(T, N, hd_p)
        )
        v = (
            qkv[:, (2 * nh + h) * hd_p : (2 * nh + h) * hd_p + hd_p]
            .astype(compute_dtype)
            .reshape(T, N, hd_p)
        )
        s = jax.lax.dot_general(
            qn, kn, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )                                            # [T, N, N] f32
        if not scale_fold:
            s = s * scale_ref[0, h]
        s = s + bias_ref[h][None]
        if shift_mask is not None:
            s = s + shift_mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        if mode == 4:
            # ABLATION (TMAR_ATTN_POSTNORM=4): exp/sum/div passes in bf16 —
            # if the VPU issues packed bf16 ops this halves the issue-bound
            # softmax chain; numerically lossy (8-bit mantissa through the
            # exp and the normalisation sum), measurement-only.
            eb = jnp.exp(s.astype(jnp.bfloat16))
            p = eb / jnp.sum(eb, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(compute_dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            head_outs.append(o.reshape(TN, hd_p))
            continue
        e = jnp.exp(s)
        if mode == 3:
            # MXU-sum post-AV normalisation (ablation-only, measured
            # WORSE: 568 vs 503-515 ms at 512², PERF.md): row-sums from a
            # dedicated all-ones batched dot (every output lane = the sum,
            # so the reciprocal's lane slice is the ALIGNED [:, :, :1] —
            # the unaligned width-1 slice is what sank mode 1),
            # normalisation applied to the AV output at [T, N, hd_p] size.
            # Exact: softmax(s)@v == (e@v)/(e@1); the row max contributes
            # exp(0)=1 so sums >= 1.
            eb = e.astype(compute_dtype)
            o_un = jax.lax.dot_general(
                eb, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                        # [T, N, hd_p] unnorm
            sums = jax.lax.dot_general(
                eb, jnp.ones((T, N, 8), compute_dtype),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                        # [T, N, 8] (all = sum)
            o = o_un * (1.0 / sums[:, :, :1])
        elif av_norm:
            # POST-AV normalisation (exact: softmax(s)@v == (e@v)/(e@1)):
            # the row-sum rides the AV dot in a ones column — in v's head-
            # dim zero padding when hd < hd_p, else an appended 8-lane
            # block — so the [T, N, N] sum-reduce and divide passes become
            # a [T, N, 1] reciprocal-broadcast at head-dim size.  Safe:
            # the row max contributes exp(0)=1, so the sum is always >= 1.
            if hd < hd_p:
                ones_col = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, 1, hd_p), 2) == hd
                ).astype(compute_dtype)
                v_ext = v + ones_col
                sum_col = hd
            else:
                v_ext = jnp.concatenate(
                    [v, jnp.ones((T, N, 8), compute_dtype)], axis=2
                )
                sum_col = hd_p
            o_ext = jax.lax.dot_general(
                e.astype(compute_dtype), v_ext, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                        # [T, N, hd_p(+8)]
            o = (
                o_ext[:, :, :hd_p]
                * (1.0 / o_ext[:, :, sum_col : sum_col + 1])
            )
        else:
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(compute_dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                        # [T, N, hd_p]
        head_outs.append(o.reshape(TN, hd_p))

    return jnp.concatenate(head_outs, axis=-1)      # [TN, nh·hd_p]


def _attn_kernel_batched(
    x_ref, wqkv_ref, bqkv_ref, scale_ref, bias_ref, wproj_ref, bproj_ref,
    mrow_ref, mcol_ref, ones_ref, out_ref, *, T, N, D, nh, hd_p, wh, ww,
    hd=None, merge_heads: bool = False,
):
    """Per-window BATCHED attention: scores/softmax/AV run as [T, N, N]
    batched ops (see batched_attention_core).  ``bias_ref`` is the raw
    [nh, N, N] bias and ``mrow_ref``/``mcol_ref`` the raw [N, N] masks —
    no host pre-tiling."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    x = x_ref[:]                                    # [TN, D]
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0, :]

    shift_mask = None
    if wh and ww:
        shift_mask = batched_window_gates(
            i * T, mrow_ref, mcol_ref, T=T, wh=wh, ww=ww, wrap=True
        )

    acc = batched_attention_core(
        qkv, shift_mask, scale_ref, bias_ref, ones_ref, T=T, N=N, nh=nh, hd_p=hd_p,
        hd=hd, merge_heads=merge_heads, compute_dtype=x.dtype,
    )
    proj = jnp.dot(
        acc.astype(wproj_ref.dtype), wproj_ref[:], preferred_element_type=jnp.float32
    )
    out_ref[:] = (proj + bproj_ref[0, :]).astype(out_ref.dtype)


def _attn_kernel(
    x_ref, wqkv_ref, bqkv_ref, scale_ref, bias_ref, wproj_ref, bproj_ref,
    mrow_ref, mcol_ref, out_ref, *, T, N, D, nh, hd_p, wh, ww,
    mxu_norms: bool = False,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    TN = T * N
    x = x_ref[:]                                    # [TN, D]
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0, :]

    if wh and ww:
        # per-row window gates: does the query's window sit in the last
        # grid row / column of its image?
        tok = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0)
        widx = (i * T + tok // N) % (wh * ww)
        row_gate = (widx // ww == wh - 1).astype(jnp.float32)   # [TN, 1]
        col_gate = (widx % ww == ww - 1).astype(jnp.float32)
        shift_mask = row_gate * mrow_ref[:] + col_gate * mcol_ref[:]
    else:
        shift_mask = None

    if mxu_norms:
        # per-head q/k sum-of-squares as ONE matmul against block-diagonal
        # ones (the 12 per-head rsqrt chains measured 9 ms/layer at 512²)
        A2 = 2 * nh * hd_p
        qk = qkv[:, :A2]
        seg_r = jax.lax.broadcasted_iota(jnp.int32, (A2, 2 * nh), 0) // hd_p
        seg_c = jax.lax.broadcasted_iota(jnp.int32, (A2, 2 * nh), 1)
        ones_bd = (seg_r == seg_c).astype(jnp.float32)
        sums = jnp.dot(qk * qk, ones_bd, preferred_element_type=jnp.float32)
        inv = jax.lax.rsqrt(sums + 1e-24)
        mult = jnp.dot(inv, ones_bd.T, preferred_element_type=jnp.float32)
        qk_n = qk * mult

    head_outs = []
    for h in range(nh):
        v = qkv[:, (2 * nh + h) * hd_p : (2 * nh + h) * hd_p + hd_p]
        if mxu_norms:
            qn = qk_n[:, h * hd_p : (h + 1) * hd_p]
            kn = qk_n[:, (nh + h) * hd_p : (nh + h) * hd_p + hd_p]
        else:
            q = qkv[:, (0 * nh + h) * hd_p : (0 * nh + h) * hd_p + hd_p]
            k = qkv[:, (1 * nh + h) * hd_p : (1 * nh + h) * hd_p + hd_p]
            qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
            kn = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)
        s = jnp.dot(qn, kn.T, preferred_element_type=jnp.float32)  # [TN, TN]
        s = s * scale_ref[0, h] + bias_ref[h]
        if shift_mask is not None:
            s = s + shift_mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        head_outs.append(
            jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        )

    acc = jnp.concatenate(head_outs, axis=-1)       # [TN, nh·hd_p]
    proj = jnp.dot(
        acc.astype(wproj_ref.dtype), wproj_ref[:], preferred_element_type=jnp.float32
    )
    out_ref[:] = (proj + bproj_ref[0, :]).astype(out_ref.dtype)


def _attn_kernel_diag(
    x_ref, wqkv_ref, bqkv_ref, scale_ref, bias_ref, wproj_ref, bproj_ref,
    mrow_ref, mcol_ref, blk_ref, e_ref, ones_ref, out_ref,
    *, T, N, D, nh, hd_p, wh, ww,
):
    """Blockdiag score dots with DIAGONAL-ONLY softmax: the [TN, TN] score
    matrix stays on the MXU, but the scale/bias/mask/softmax VPU passes run
    on the [TN, N] diagonal blocks — T× less VPU work, equal result (the
    off-diagonal entries are exp(-1e9)=0 in the blockdiag kernel anyway).
    Extraction and re-embedding of the diagonal blocks are MXU matmuls
    against E = [I_N; …; I_N] (T stacked identities):
        s_diag = (s_big ∘ blk) @ E           (picks each row's own window)
        p_big  = blk ∘ (p_diag @ Eᵀ)         (tiles then masks)
    — lane-aligned everywhere (a slice-and-concat extraction fails Mosaic's
    layout inference: "offset mismatch on non-concat dimension").

    ``bias_ref``/``mrow_ref``/``mcol_ref`` are the VERTICAL [·, TN, N] tiles
    (window-constant along rows), not the [TN, TN] pre-tiles of the other
    kernels."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    TN = T * N
    x = x_ref[:]                                    # [TN, D]
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0, :]

    if wh and ww:
        tok = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0)
        widx = (i * T + tok // N) % (wh * ww)
        row_gate = (widx // ww == wh - 1).astype(jnp.float32)   # [TN, 1]
        col_gate = (widx % ww == ww - 1).astype(jnp.float32)
        shift_mask = row_gate * mrow_ref[:] + col_gate * mcol_ref[:]  # [TN, N]
    else:
        shift_mask = None

    # host-precomputed constants (in-kernel iota builds of the [TN, TN]
    # mask measured ~13 ms/layer at 512² — inputs are ~free):
    blk = blk_ref[:]                                # [TN, TN] blockdiag 0/1
    E = e_ref[:]                                    # [TN, N] stacked identities
    ones_bd = ones_ref[:]                           # [2·A_p, 2·nh]

    # q/k L2 norms on the MXU: per-head sum-of-squares as ONE matmul against
    # a block-diagonal ones matrix (the per-head VPU rsqrt reductions over
    # hd_p sub-lane segments measured 9 ms/layer at 512² — 2× the qkv cost)
    A2 = 2 * nh * hd_p
    qk = qkv[:, :A2]                                # [TN, 2·A_p] q then k
    sums = jnp.dot(qk * qk, ones_bd, preferred_element_type=jnp.float32)
    inv = jax.lax.rsqrt(sums + 1e-24)               # [TN, 2·nh]
    mult = jnp.dot(inv, ones_bd.T, preferred_element_type=jnp.float32)
    qk_n = qk * mult                                # [TN, 2·A_p] normalised

    head_outs = []
    for h in range(nh):
        qn = qk_n[:, h * hd_p : (h + 1) * hd_p]
        kn = qk_n[:, (nh + h) * hd_p : (nh + h) * hd_p + hd_p]
        v = qkv[:, (2 * nh + h) * hd_p : (2 * nh + h) * hd_p + hd_p]
        s_big = jnp.dot(qn, kn.T, preferred_element_type=jnp.float32)  # [TN, TN]
        s = jnp.dot(s_big * blk, E, preferred_element_type=jnp.float32)  # [TN, N]
        s = s * scale_ref[0, h] + bias_ref[h]
        if shift_mask is not None:
            s = s + shift_mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)   # [TN, N]
        p_big = blk * jax.lax.dot_general(           # p @ Eᵀ, then mask
            p, E, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        head_outs.append(
            jnp.dot(p_big.astype(v.dtype), v, preferred_element_type=jnp.float32)
        )

    acc = jnp.concatenate(head_outs, axis=-1)       # [TN, nh·hd_p]
    proj = jnp.dot(
        acc.astype(wproj_ref.dtype), wproj_ref[:], preferred_element_type=jnp.float32
    )
    out_ref[:] = (proj + bproj_ref[0, :]).astype(out_ref.dtype)
