"""Device profile of the current 512² b8 inference forward."""
import _path  # noqa: F401  (repo root on sys.path + jax compile cache)
import numpy as np, jax
import jax.numpy as jnp
from tmar.nn import NGswin
from tmar.utils.profiling import device_profile

model = NGswin(dtype=jnp.bfloat16, use_pallas_attention=True)
small = jnp.zeros((8, 128, 128, 1), jnp.float32)
params = jax.jit(model.init)(jax.random.PRNGKey(0), small)["params"]
fwd = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 512, 512, 1)).astype(np.float32))
rows = device_profile(lambda xx: fwd(params, xx), x, iters=5, top=40)
print(f"total over top-40: {sum(r['ms'] for r in rows):.1f} ms")
for r in rows:
    print(f"{r['ms']:8.3f} ms  x{r['count']:<6} {r['op'][:100]}")
