"""Differentiable parallel-beam Radon transform, TPU-native.

Replaces the reference's external CUDA ``torch-radon`` projector (used at
reference training/train_combined.py:269-272 and losses/gan_losses.py:242-246
for the sinogram physics-consistency loss, and by the figure-2 pipeline for
FBP).  The reference vendors no source for it (external/torch-radon is an
empty placeholder) — this is the framework's native equivalent component.

Design (TPU-first, no scatter/ray-marching):
    A pixel at (row i, col j) projects onto detector coordinate
        p(i, j; θ) = (j - c)·cosθ + (i - c)·sinθ + c_det,
    and contributes its value under a linear (triangle) splat kernel.  The
    offset is separable, p = α_i(θ) + β_j(θ) + c_det, so the 2-D splat
    factorises into two 1-D passes:

      pass A  (MXU):   T[b,a,s,j] = Σ_i M[a,s,i] · I[b,i,j]
                       with M[a,s,i] = tri(s - α_i(θ_a) - c_det)
                       — a single batched einsum against a precomputed
                       [A, det, H] constant (~12 MB for 180×128²).

      pass B  (MXU):   P[b,a,s]   = Σ_j (1-f)·T[b,a,s-k,j] + f·T[b,a,s-k-1,j]
                       where β_j(θ_a) = k_aj + f_aj.  Implemented WITHOUT
                       gathers (XLA's TPU gather lowering measured ~190 ms
                       at 24×180×128² — the whole train step's hot spot):
                       the per-column fractional shift is a matmul against a
                       precomputed shift-bin matrix G[a, j, m] (weight 1-f at
                       bin k_aj, f at bin k_aj+1), followed by an
                       anti-diagonal summation Σ_m A[s - κ_m, m] expressed as
                       a pure pad→reshape→slice→sum (the classic stride-trick:
                       flat[m·S_pad + (σ-m)] = flat[m·(S_pad-1) + σ], so
                       re-reshaping with row width S_pad-1 aligns every
                       diagonal into a column).  Out-of-range detector bins
                       land in the zero padding — identical clipping
                       semantics to torch-radon's det_count = img_size.

    The composed kernel is tri⊛tri (2-bin support) — a consistent,
    mass-conserving linear discretisation of the Radon transform; rays whose
    detector coordinate falls outside [0, det) are clipped, matching
    torch-radon's det_count = img_size behaviour.

    The operator is linear; the adjoint (backprojection) is implemented
    explicitly as the exact transpose of the two passes (Gᵀ matmul + the
    transposed stride-trick), and forward/adjoint are wired as each other's
    custom VJP so the physics-loss backward (reference
    losses/gan_losses.py:222-253) is the same pure-matmul pipeline.

Also provides the ramp-filtered backprojection (FBP) needed by the reference's
figure-2 physics pipeline (reference
scripts/figure_generation/figure2_physics_consistency_v2.py:1-27).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _triangle_matrix(offsets: np.ndarray, det_count: int) -> np.ndarray:
    """tri(s - offsets[...]) for s = 0..det-1 -> [..., det] splat weights."""
    s = np.arange(det_count, dtype=np.float64)
    d = np.abs(s[None, :] - offsets[..., None])
    return np.maximum(0.0, 1.0 - d)


class Radon:
    """Batched parallel-beam Radon transform and FBP.

    Args:
        img_size: side length of the (square) input images.
        angles: projection angles in radians, shape [A].  Defaults to 180
            uniformly spaced angles over [0, π), the reference's geometry
            (reference training/train_combined.py:269-271).
        det_count: number of detector bins (default ``img_size``).
    """

    def __init__(
        self,
        img_size: int,
        angles: Optional[np.ndarray] = None,
        det_count: Optional[int] = None,
        precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    ):
        self.precision = precision
        if angles is None:
            angles = np.linspace(0.0, np.pi, 180, endpoint=False)
        angles = np.asarray(angles, dtype=np.float64)
        self.img_size = int(img_size)
        self.angles = angles.astype(np.float32)
        self.num_angles = angles.shape[0]
        self.det_count = int(det_count or img_size)

        H = self.img_size
        A = self.num_angles
        det = self.det_count
        c = (H - 1) / 2.0
        c_det = (det - 1) / 2.0

        cos = np.cos(angles)  # [A]
        sin = np.sin(angles)
        rows = np.arange(H, dtype=np.float64) - c      # i - c
        cols = np.arange(H, dtype=np.float64) - c      # j - c

        # Pass A constant: M[a, s, i] = tri(s - (i-c) sinθ_a - c_det)
        alpha = sin[:, None] * rows[None, :] + c_det   # [A, H]
        self._proj_mat = _triangle_matrix(alpha, det).transpose(0, 2, 1).astype(np.float32)
        # -> [A, det, H]

        # Pass B constants: β_j(a) = (j-c) cosθ_a = k + f.  Taps at shifts k
        # (weight 1-f) and k+1 (weight f) become columns of the shift-bin
        # matrix G[a, j, m], m indexing shift values κ_m = k_min + m.
        beta = cos[:, None] * cols[None, :]            # [A, W]
        k = np.floor(beta).astype(np.int64)
        f = (beta - k).astype(np.float32)
        k_min = int(k.min())
        k_max = int(k.max()) + 1                       # +1: the fractional tap
        K = k_max - k_min + 1
        W = cols.shape[0]
        G = np.zeros((A, W, K), np.float32)
        a_idx = np.repeat(np.arange(A), W)
        j_idx = np.tile(np.arange(W), A)
        np.add.at(G, (a_idx, j_idx, (k - k_min).ravel()), (1.0 - f).ravel())
        np.add.at(G, (a_idx, j_idx, (k - k_min).ravel() + 1), f.ravel())
        self._shift_bins = G
        self._k_min = k_min
        self._K = K
        # row width for the diagonal stride-trick; guarantees every
        # out-of-range (s - κ_m) read lands in zero padding (see _pass_b)
        self._s_pad = det + K

        # The operator pair is linear and exactly transposed (same G), so
        # each direction's VJP is the other direction — wired explicitly via
        # custom_vjp.  This keeps both directions pure matmul+reshape (no
        # scatter in either autodiff direction).
        @jax.custom_vjp
        def _fwd_op(img):
            return self._forward_impl(img)

        def _fwd_f(img):
            return _fwd_op(img), jnp.zeros((), img.dtype)

        def _fwd_b(tok, g):
            return (self._adjoint_impl(g).astype(tok.dtype),)

        _fwd_op.defvjp(_fwd_f, _fwd_b)
        self._fwd_op = _fwd_op

        @jax.custom_vjp
        def _adj_op(sino):
            return self._adjoint_impl(sino)

        def _adj_f(sino):
            return _adj_op(sino), jnp.zeros((), sino.dtype)

        def _adj_b(tok, g):
            return (self._forward_impl(g).astype(tok.dtype),)

        _adj_op.defvjp(_adj_f, _adj_b)
        self._adj_op = _adj_op

    # ------------------------------------------------------------------ fwd
    def forward(self, img: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W] (or [B, H, W, 1]) -> sinogram [B, A, det] (float32)."""
        if img.ndim == 4:
            img = img[..., 0]
        return self._fwd_op(img)

    def _forward_impl(self, img: jnp.ndarray) -> jnp.ndarray:
        img = img.astype(jnp.float32)
        # Pass A: [A, det, H] x [B, H, W] -> [B, A, det, W]
        t = jnp.einsum(
            "asi,biw->basw",
            self._proj_mat,
            img,
            preferred_element_type=jnp.float32,
            precision=self.precision,
        )
        # Pass B: shift-bin matmul over columns, then diagonal summation.
        # A2[b, a, m, s'] = Σ_j t[b, a, s', j] · G[a, j, m]
        a2 = jnp.einsum(
            "basw,awm->bams",
            t,
            self._shift_bins,
            preferred_element_type=jnp.float32,
            precision=self.precision,
        )
        return self._diag_sum(a2)

    def _diag_sum(self, a2: jnp.ndarray) -> jnp.ndarray:
        """Σ_m A2[.., m, σ - m] via the stride trick (σ = s - k_min):
        flatten (m, s') row-major with row width S_pad, then re-reshape with
        row width S_pad - 1 — every anti-diagonal becomes a column."""
        B, A = a2.shape[:2]
        det, K, S_pad = self.det_count, self._K, self._s_pad
        off = -self._k_min
        ap = jnp.pad(a2, ((0, 0), (0, 0), (0, 0), (0, S_pad - det)))
        flat = ap.reshape(B, A, K * S_pad)
        c = flat[..., : K * (S_pad - 1)].reshape(B, A, K, S_pad - 1)
        return jnp.sum(c[..., off : off + det], axis=2)

    def _diag_spread(self, sino: jnp.ndarray) -> jnp.ndarray:
        """Exact transpose of _diag_sum: [B, A, det] -> [B, A, K, det]."""
        B, A = sino.shape[:2]
        det, K, S_pad = self.det_count, self._K, self._s_pad
        off = -self._k_min
        c = jnp.zeros((B, A, K, S_pad - 1), sino.dtype)
        c = c.at[..., off : off + det].set(sino[:, :, None, :])
        flat = jnp.pad(
            c.reshape(B, A, K * (S_pad - 1)), ((0, 0), (0, 0), (0, K))
        )
        return flat.reshape(B, A, K, S_pad)[..., :det]

    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        return self.forward(img)

    # --------------------------------------------------------------- adjoint
    def backward(self, sino: jnp.ndarray) -> jnp.ndarray:
        """Adjoint (unfiltered backprojection): [B, A, det] -> [B, H, W]."""
        return self._adj_op(sino)

    def _adjoint_impl(self, sino: jnp.ndarray) -> jnp.ndarray:
        sino = sino.astype(jnp.float32)
        # Transpose of pass B: spread the sinogram back over the shift
        # diagonals, then contract the shift bins with Gᵀ.
        da2 = self._diag_spread(sino)                  # [B, A, K, det] (=bams)
        u = jnp.einsum(
            "bams,awm->basw",
            da2,
            self._shift_bins,
            preferred_element_type=jnp.float32,
            precision=self.precision,
        )
        # Transpose of pass A: img[b,i,w] = Σ_a Σ_s M[a,s,i] U[b,a,s,w]
        img = jnp.einsum(
            "asi,basw->biw",
            self._proj_mat,
            u,
            preferred_element_type=jnp.float32,
            precision=self.precision,
        )
        return img

    # ------------------------------------------------------------------ fbp
    def filter_sinogram(self, sino: jnp.ndarray) -> jnp.ndarray:
        """Ramp (Ram-Lak) filter along the detector axis via real FFT."""
        det = self.det_count
        n = max(64, int(2 ** np.ceil(np.log2(2 * det))))
        pad = n - det
        s = jnp.pad(sino.astype(jnp.float32), ((0, 0), (0, 0), (0, pad)))
        freqs = np.fft.rfftfreq(n).astype(np.float32)  # cycles/sample
        ramp = 2.0 * np.abs(freqs)
        fs = jnp.fft.rfft(s, axis=-1) * ramp[None, None, :]
        filtered = jnp.fft.irfft(fs, n=n, axis=-1)[..., :det]
        return filtered

    def fbp(self, sino: jnp.ndarray) -> jnp.ndarray:
        """Filtered backprojection: [B, A, det] -> [B, H, W]."""
        filtered = self.filter_sinogram(sino)
        img = self.backward(filtered)
        return img * (np.pi / (2.0 * self.num_angles))
