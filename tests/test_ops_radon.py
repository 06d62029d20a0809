"""Radon transform validation: ray-driven numpy reference, adjoint identity,
mass conservation, differentiability, FBP reconstruction."""

import numpy as np
import jax
import jax.numpy as jnp

from tmar.ops import Radon


def _phantom(size, rng=None):
    """Smooth phantom supported well inside the inscribed circle."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float64)
    c = (size - 1) / 2.0
    r2 = ((y - c) ** 2 + (x - c) ** 2) / (0.35 * size) ** 2
    img = np.exp(-3 * r2)
    # add an off-center blob to break symmetry
    r2b = ((y - c - size * 0.12) ** 2 + (x - c + size * 0.08) ** 2) / (0.1 * size) ** 2
    img += 0.7 * np.exp(-3 * r2b)
    return img.astype(np.float32)


def _ray_driven_radon(img, angles, det_count):
    """Numpy ray-driven reference (the torch-radon strategy): march along each
    ray with bilinear sampling, step 0.5 px."""
    H, W = img.shape
    c = (H - 1) / 2.0
    c_det = (det_count - 1) / 2.0
    step = 0.5
    L = int(np.ceil(H * 1.5 / step))
    t = (np.arange(-L, L + 1) * step)  # [T]
    out = np.zeros((len(angles), det_count), dtype=np.float64)
    for a, th in enumerate(angles):
        sin, cos = np.sin(th), np.cos(th)
        s = np.arange(det_count) - c_det  # [S]
        # detector axis (y,x) = (sin, cos); ray direction = (cos, -sin)
        y = c + s[:, None] * sin + t[None, :] * cos
        x = c + s[:, None] * cos - t[None, :] * sin
        y0 = np.floor(y).astype(int)
        x0 = np.floor(x).astype(int)
        fy, fx = y - y0, x - x0
        acc = np.zeros_like(y)
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                yi, xi = y0 + dy, x0 + dx
                valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
                vals = np.where(valid, img[np.clip(yi, 0, H - 1), np.clip(xi, 0, W - 1)], 0.0)
                acc += wy * wx * vals
        out[a] = acc.sum(axis=1) * step
    return out


def test_forward_matches_ray_driven():
    size = 64
    angles = np.linspace(0, np.pi, 30, endpoint=False)
    radon = Radon(size, angles)
    img = _phantom(size)
    sino = np.asarray(radon.forward(jnp.asarray(img)[None]))[0]
    ref = _ray_driven_radon(img.astype(np.float64), angles, size)
    err = np.abs(sino - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert err < 0.02, f"relative MAE vs ray-driven reference too high: {err:.4f}"


def test_mass_conservation():
    size = 64
    radon = Radon(size)
    img = _phantom(size)
    sino = np.asarray(radon.forward(jnp.asarray(img)[None]))[0]
    total = img.sum()
    per_angle = sino.sum(axis=1)
    np.testing.assert_allclose(per_angle, total, rtol=3e-3)


def test_adjoint_identity(rng):
    size = 32
    angles = np.linspace(0, np.pi, 20, endpoint=False)
    radon = Radon(size, angles)
    x = rng.standard_normal((1, size, size)).astype(np.float32)
    y = rng.standard_normal((1, len(angles), size)).astype(np.float32)
    ax = np.asarray(radon.forward(jnp.asarray(x)))
    aty = np.asarray(radon.backward(jnp.asarray(y)))
    lhs = float((ax * y).sum())
    rhs = float((x * aty).sum())
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_gradients_flow(rng):
    size = 32
    radon = Radon(size, np.linspace(0, np.pi, 10, endpoint=False))
    x = jnp.asarray(rng.standard_normal((2, size, size)).astype(np.float32))

    def loss(img):
        return jnp.abs(radon.forward(img)).mean()

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_fbp_reconstructs_phantom():
    size = 64
    radon = Radon(size)
    img = _phantom(size)
    sino = radon.forward(jnp.asarray(img)[None])
    rec = np.asarray(radon.fbp(sino))[0]
    # compare inside the inscribed circle
    y, x = np.mgrid[0:size, 0:size]
    c = (size - 1) / 2.0
    mask = ((y - c) ** 2 + (x - c) ** 2) < (0.45 * size) ** 2
    err = np.abs(rec[mask] - img[mask]).mean() / np.abs(img[mask]).mean()
    assert err < 0.1, f"FBP relative error {err:.3f}"


def test_channel_dim_accepted():
    radon = Radon(32, np.linspace(0, np.pi, 8, endpoint=False))
    img = jnp.ones((2, 32, 32, 1))
    sino = radon.forward(img)
    assert sino.shape == (2, 8, 32)


def test_pass_b_matches_bruteforce_shift():
    """The shift-bin matmul + diagonal stride-trick must reproduce the
    per-column fractional shift-and-clip exactly (incl. detector-edge
    clipping), for even and odd sizes."""
    for size in (16, 17):
        r = Radon(size, np.linspace(0, np.pi, 11, endpoint=False))
        rng = np.random.default_rng(size)
        img = rng.normal(size=(2, size, size)).astype(np.float32)
        sino = np.asarray(r.forward(jnp.asarray(img)))

        # brute force: pass A dense, then shift column j by beta with linear
        # interp, clipping out-of-range detector bins
        A = r.num_angles
        det = r.det_count
        c = (size - 1) / 2.0
        ref = np.zeros((2, A, det), np.float64)
        t = np.einsum("asi,biw->basw", r._proj_mat.astype(np.float64), img)
        for a in range(A):
            for j in range(size):
                beta = np.cos(np.float64(r.angles[a])) * (j - c)
                k = int(np.floor(beta))
                f = beta - k
                for s in range(det):
                    if 0 <= s - k < det:
                        ref[:, a, s] += (1 - f) * t[:, a, s - k, j]
                    if 0 <= s - k - 1 < det:
                        ref[:, a, s] += f * t[:, a, s - k - 1, j]
        np.testing.assert_allclose(sino, ref, rtol=2e-4, atol=2e-4)
