"""512² b8 inference wall-clock A/B (slices/s); kernel variants via env."""
import _path  # noqa: F401  (repo root on sys.path + jax compile cache)
import os, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from tmar.nn import NGswin
model = NGswin(dtype=jnp.bfloat16, use_pallas_attention=True)
x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 512, 512, 1)).astype(np.float32))
small = jnp.zeros((8, 128, 128, 1), jnp.float32)
params = jax.jit(model.init)(jax.random.PRNGKey(0), small)["params"]
fwd = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
y = fwd(params, x); np.asarray(y).ravel()[:1]
iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
t0 = time.perf_counter()
yy = x
for _ in range(iters):
    yy = fwd(params, yy)
np.asarray(yy).ravel()[:1]
dt = (time.perf_counter() - t0) / iters
print(f"{dt*1000:.1f} ms/batch  {8/dt:.2f} slices/s")
