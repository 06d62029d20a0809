"""On-device per-op profile of the current train step (VERDICT r1 item 2).

Usage: python _profile_train.py [top]
Prints the device_profile rows of the full G/D train step at b8·128²
(same config as bench.bench_train_step) plus category totals.
"""
import sys

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import optax

from tmar.losses import LossWeights
from tmar.nn import MultiScaleDiscriminator, NGswin
from tmar.ops import Radon
from tmar.train import create_train_state, make_train_step
from tmar.utils.profiling import device_profile

PATCH, BATCH = 128, 8
gen = NGswin(dtype=jnp.bfloat16, xla_window_merge=True)
disc = MultiScaleDiscriminator(dtype=jnp.bfloat16)
g_tx = optax.adam(1e-4, b1=0.5, b2=0.999)
d_tx = optax.adam(2e-4, b1=0.5, b2=0.999)
state = create_train_state(jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, patch_size=PATCH)
radon = Radon(PATCH, np.linspace(0, np.pi, 180, endpoint=False))
step = make_train_step(gen, disc, g_tx, d_tx, LossWeights(), projector=radon, donate=False)

rng = np.random.default_rng(0)
batch = jax.device_put({
    "ct": rng.uniform(-1, 1, (BATCH, PATCH, PATCH, 1)).astype(np.float32),
    "gt": rng.uniform(-1, 1, (BATCH, PATCH, PATCH, 1)).astype(np.float32),
})

top = int(sys.argv[1]) if len(sys.argv) > 1 else 40
rows = device_profile(lambda s: step(s, batch), state, iters=10, top=top)
total = sum(r["ms"] for r in rows)
print(f"device total: {total:.1f} ms/step over top-{top} ops")
for r in rows:
    print(f"{r['ms']:8.3f} ms  x{r['count']:<5} {r['op'][:110]}")
