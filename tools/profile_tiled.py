"""Tiled-eval (416²/64/32) wall-clock + on-device per-op breakdown.

VERDICT r2 #7: tiled eval measured 5.46 slices/s vs 27.1 full-slice —
find where the extraction/assembly time goes and either reach ≥2× or
publish the floor argument.  This prints:

* wall-clock slices/s for the one-jit tiled path (make_tiled_eval_jit),
* the equivalent-pixel ceiling: tiled 416²/64/32 runs (416−64)//32+1 = 12
  positions per axis → 12×12 = 144 overlapping 64² tiles per slice =
  3.41× the pixels of the full slice, so even at the model's best measured
  per-pixel rate the ceiling is (pixel rate)/3.41,
* a device_profile per-op-class table of the tiled dispatch.

Usage: python tools/profile_tiled.py [iters]
"""
import _path  # noqa: F401  (repo root on sys.path + jax compile cache)
import sys
import time

import numpy as np
import jax

import jax.numpy as jnp

from tmar.nn import NGswin
from tmar.eval.inference import make_tiled_eval_jit

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
B = 8

model = NGswin(dtype=jnp.bfloat16, use_pallas_attention=True)
small = jnp.zeros((B, 128, 128, 1), jnp.float32)
params = jax.jit(model.init)(jax.random.PRNGKey(0), small)["params"]
ct = jnp.asarray(
    np.random.default_rng(0).uniform(-1, 1, (B, 416, 416, 1)).astype(np.float32)
)

tiled = make_tiled_eval_jit(model, params, tile=64, stride=32)
out = tiled(ct)
np.asarray(out).ravel()[:1]

t0 = time.perf_counter()
out = ct
for _ in range(iters):
    out = tiled(out)          # chained: output feeds input (same shape/range)
np.asarray(out).ravel()[:1]
dt = (time.perf_counter() - t0) / iters
tiled_rate = B / dt
print(f"tiled 416/64/32: {dt * 1000:.1f} ms/batch  {tiled_rate:.2f} slices/s")

# equivalent-pixel ceiling from the 64² tile batch itself: run the same
# B·144-tile forward (1152 tiles at B=8) without extraction/assembly
n_pos = (416 - 64) // 32 + 1
tiles = jnp.zeros((B * n_pos * n_pos, 64, 64, 1), jnp.float32)
fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
y = fwd(params, tiles)
np.asarray(y).ravel()[:1]
t0 = time.perf_counter()
y = tiles
for _ in range(iters):
    y = fwd(params, y)        # chained
np.asarray(y).ravel()[:1]
dt_fwd = (time.perf_counter() - t0) / iters
print(
    f"bare {B * n_pos * n_pos}-tile 64^2 forward: {dt_fwd * 1000:.1f} ms/batch "
    f"({B / dt_fwd:.2f} slices/s equivalent) -> extraction/assembly+misc = "
    f"{(dt - dt_fwd) * 1000:.1f} ms/batch"
)
print(
    f"pixel ratio vs full slice: {n_pos * n_pos * 64 * 64 / 416 / 416:.2f}x"
)

try:
    from tmar.utils.profiling import device_profile

    rows = device_profile(tiled, ct)
    print("\nper-op-class (top 15):")
    for r in rows[:15]:
        print(r)
except Exception as e:  # profiling is best-effort
    print("device_profile unavailable:", e)
