"""A/B: train step with per-leaf vs flattened (fused) optimizer updates.
Usage: python tools/ab_train.py [flat|leaf] [pairs|nopairs] [iters]"""
import _path  # noqa: F401  (repo root on sys.path + jax compile cache)
import os
import sys
import time

import numpy as np
import jax

import jax.numpy as jnp
import optax

from tmar.losses import LossWeights
from tmar.nn import MultiScaleDiscriminator, NGswin
from tmar.ops import Radon
from tmar.train import create_train_state, make_train_step

mode = sys.argv[1] if len(sys.argv) > 1 else "flat"      # flat | leaf
pairs = len(sys.argv) > 2 and sys.argv[2] == "pairs"     # fused D passes
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
# sweep knobs (env): batch size, patch size, radon einsum precision,
# attention backward
B = int(os.environ.get("TMAR_AB_BATCH", "8"))
PATCH = int(os.environ.get("TMAR_AB_PATCH", "128"))
RADON_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}[os.environ.get("TMAR_AB_RADON", "highest")]
ATTN_BWD = os.environ.get("TMAR_AB_ATTN_BWD", "pallas")

gen = NGswin(dtype=jnp.bfloat16, use_pallas_attention=True, attn_backward=ATTN_BWD)
disc = MultiScaleDiscriminator(dtype=jnp.bfloat16)
adam_g = optax.adam(1e-4, b1=0.5, b2=0.999)
adam_d = optax.adam(2e-4, b1=0.5, b2=0.999)
if mode == "flat":
    g_tx, d_tx = optax.flatten(adam_g), optax.flatten(adam_d)
else:
    g_tx, d_tx = adam_g, adam_d
state = create_train_state(jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, patch_size=PATCH)
radon = Radon(PATCH, np.linspace(0, np.pi, 180, endpoint=False), precision=RADON_PREC)
step = make_train_step(gen, disc, g_tx, d_tx, LossWeights(), projector=radon,
                       donate=False, fused_pairs=pairs)

rng = np.random.default_rng(0)
batch = jax.device_put({
    "ct": rng.uniform(-1, 1, (B, PATCH, PATCH, 1)).astype(np.float32),
    "gt": rng.uniform(-1, 1, (B, PATCH, PATCH, 1)).astype(np.float32),
})
s, m = step(state, batch)
np.asarray(m["loss_g"])
t0 = time.perf_counter()
for _ in range(iters):
    s, m = step(s, batch)
np.asarray(m["loss_g"])
dt = (time.perf_counter() - t0) / iters
print(
    f"{mode} pairs={pairs} b={B} patch={PATCH}"
    f" radon={os.environ.get('TMAR_AB_RADON', 'highest')}"
    f" bwd={ATTN_BWD} ngram={os.environ.get('TMAR_NGRAM_FUSED', '(default)')}:"
    f" {dt*1000:.1f} ms/step  {1/dt:.2f} steps/s  {B/dt:.1f} samples/s"
)
