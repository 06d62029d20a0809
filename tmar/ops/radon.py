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

      pass B  (VPU):   P[b,a,s]   = Σ_j (1-f)·T[b,a,s-k,j] + f·T[b,a,s-k-1,j]
                       where β_j(θ_a) = k_aj + f_aj — a per-column fractional
                       shift expressed as two ``take_along_axis`` gathers with
                       precomputed integer indices, then a reduction over j.

    The composed kernel is tri⊛tri (2-bin support) — a consistent,
    mass-conserving linear discretisation of the Radon transform; rays whose
    detector coordinate falls outside [0, det) are clipped, matching
    torch-radon's det_count = img_size behaviour.

    The operator is linear, so gradients flow through einsum/gather VJPs
    automatically (physics loss backprop into the generator, reference
    losses/gan_losses.py:222-253).  The adjoint (backprojection) is
    implemented explicitly with the same gather structure (the transpose of a
    gather is a scatter, which is slow on TPU — so we gather both ways).

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

        # Pass B constants: β_j(a) = (j-c) cosθ_a = k + f
        beta = cos[:, None] * cols[None, :]            # [A, W]
        k = np.floor(beta).astype(np.int64)
        f = (beta - k).astype(np.float32)
        s_out = np.arange(det, dtype=np.int64)
        # idx0[a, s, j] = s - k_aj ; idx1 = idx0 - 1
        idx0 = s_out[None, :, None] - k[:, None, :]    # [A, det, W]
        idx1 = idx0 - 1
        self._valid0 = ((idx0 >= 0) & (idx0 < det)).astype(np.float32)
        self._valid1 = ((idx1 >= 0) & (idx1 < det)).astype(np.float32)
        self._idx0 = np.clip(idx0, 0, det - 1).astype(np.int32)
        self._idx1 = np.clip(idx1, 0, det - 1).astype(np.int32)
        self._frac = f  # [A, W]

        # Adjoint (pass-B transpose) gather indices, from the SAME k as the
        # forward so the operators are exact transposes of each other.
        out0 = s_out[None, :, None] + k[:, None, :]    # [A, det(src s'), W]
        out1 = out0 + 1
        self._bp_valid0 = ((out0 >= 0) & (out0 < det)).astype(np.float32)
        self._bp_valid1 = ((out1 >= 0) & (out1 < det)).astype(np.float32)
        self._bp_idx0 = np.clip(out0, 0, det - 1).astype(np.int32)
        self._bp_idx1 = np.clip(out1, 0, det - 1).astype(np.int32)

        # The operator pair is linear and exactly transposed (same k, f), so
        # each direction's VJP is the other direction — wired explicitly via
        # custom_vjp.  Autodiff through ``take_along_axis`` would instead emit
        # scatter-adds in the backward pass (TPU-hostile); this keeps both
        # directions pure gather+einsum.
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
        # Pass B: fractional shift per column then reduce over W.
        g0 = jnp.take_along_axis(t, self._idx0[None], axis=2)
        g1 = jnp.take_along_axis(t, self._idx1[None], axis=2)
        # _valid* are [A, det, W]; _frac is [A, W], broadcast over det bins.
        w0 = (1.0 - self._frac)[:, None, :] * self._valid0
        w1 = self._frac[:, None, :] * self._valid1
        sino = jnp.sum(g0 * w0[None] + g1 * w1[None], axis=-1)
        return sino

    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        return self.forward(img)

    # --------------------------------------------------------------- adjoint
    def backward(self, sino: jnp.ndarray) -> jnp.ndarray:
        """Adjoint (unfiltered backprojection): [B, A, det] -> [B, H, W]."""
        return self._adj_op(sino)

    def _adjoint_impl(self, sino: jnp.ndarray) -> jnp.ndarray:
        sino = sino.astype(jnp.float32)
        # Transpose of pass B: U[b,a,s',j] = (1-f)·P[b,a,s'+k] + f·P[b,a,s'+k+1]
        # with the same per-column k, f as the forward.
        sino_e = sino[:, :, :, None]  # [B, A, det, 1]
        g0 = jnp.take_along_axis(sino_e, self._bp_idx0[None], axis=2)
        g1 = jnp.take_along_axis(sino_e, self._bp_idx1[None], axis=2)
        u = g0 * ((1.0 - self._frac)[:, None, :] * self._bp_valid0)[None] + g1 * (
            self._frac[:, None, :] * self._bp_valid1
        )[None]  # [B, A, det, W]
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
