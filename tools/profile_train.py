"""Device-op profile of the full G/D train step (publishes PERF.md's
train-step breakdown; reference hot loop: train_combined.py:388-560).

Usage: python tools/profile_train.py [iters] — env knobs match ab_train.py.
"""
import _path  # noqa: F401  (repo root on sys.path + jax compile cache)
import os
import sys

import numpy as np
import jax

import jax.numpy as jnp
import optax

from tmar.losses import LossWeights
from tmar.nn import MultiScaleDiscriminator, NGswin
from tmar.ops import Radon
from tmar.train import create_train_state, make_train_step
from tmar.utils.profiling import device_profile

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
B, PATCH = int(os.environ.get("TMAR_AB_BATCH", "8")), 128
ATTN_BWD = os.environ.get("TMAR_AB_ATTN_BWD", "pallas")

gen = NGswin(dtype=jnp.bfloat16, use_pallas_attention=True, attn_backward=ATTN_BWD)
disc = MultiScaleDiscriminator(dtype=jnp.bfloat16)
g_tx = optax.flatten(optax.adam(1e-4, b1=0.5, b2=0.999))
d_tx = optax.flatten(optax.adam(2e-4, b1=0.5, b2=0.999))
state = create_train_state(jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, patch_size=PATCH)
radon = Radon(PATCH, np.linspace(0, np.pi, 180, endpoint=False))
step = make_train_step(gen, disc, g_tx, d_tx, LossWeights(), projector=radon,
                       donate=False, fused_pairs=True)

rng = np.random.default_rng(0)
batch = jax.device_put({
    "ct": rng.uniform(-1, 1, (B, PATCH, PATCH, 1)).astype(np.float32),
    "gt": rng.uniform(-1, 1, (B, PATCH, PATCH, 1)).astype(np.float32),
})

rows = device_profile(lambda s: step(s, batch), state, iters=iters, top=40)
total = sum(r["ms"] for r in rows)
print(f"train step device-op profile (b{B}·{PATCH}², bwd={ATTN_BWD}); "
      f"top-40 sum = {total:.1f} ms/iter")
for r in rows:
    print(f"  {r['ms']:8.3f} ms  x{r['count']:5d}  {r['op']}")
