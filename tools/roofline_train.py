"""Roofline floor for the full G/D train step (VERDICT r2 #8).

Computes the two hardware floors for the promoted b8·128² step from the
compiled program's own XLA cost analysis —

* compute floor  = flops / peak_bf16_flops
* memory floor   = bytes accessed / HBM bandwidth

— and compares them against the measured step time, so the "how close to
speed-of-light is the non-attention residue" question has a denominator.
v5e peaks: 394 TFLOP/s bf16 MXU, 819 GB/s HBM (public chip specs).

Usage: python tools/roofline_train.py [iters]   (env knobs as ab_train.py)
"""
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

PEAK_BF16_TFLOPS = 394.0   # v5e MXU peak
HBM_GBPS = 819.0           # v5e HBM bandwidth

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
B = int(os.environ.get("TMAR_AB_BATCH", "8"))
PATCH = int(os.environ.get("TMAR_AB_PATCH", "128"))
ATTN_BWD = os.environ.get("TMAR_AB_ATTN_BWD", "pallas")

gen = NGswin(dtype=jnp.bfloat16, use_pallas_attention=True, attn_backward=ATTN_BWD)
disc = MultiScaleDiscriminator(dtype=jnp.bfloat16)
adam_g = optax.adam(1e-4, b1=0.5, b2=0.999)
adam_d = optax.adam(2e-4, b1=0.5, b2=0.999)
state = create_train_state(jax.random.PRNGKey(0), gen, disc, adam_g, adam_d,
                           patch_size=PATCH)
radon = Radon(PATCH, np.linspace(0, np.pi, 180, endpoint=False))
step = make_train_step(gen, disc, adam_g, adam_d, LossWeights(), projector=radon,
                       donate=False, fused_pairs=True)

rng = np.random.default_rng(0)
batch = jax.device_put({
    "ct": rng.uniform(-1, 1, (B, PATCH, PATCH, 1)).astype(np.float32),
    "gt": rng.uniform(-1, 1, (B, PATCH, PATCH, 1)).astype(np.float32),
})

compiled = jax.jit(step).lower(state, batch).compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
flops = float(ca.get("flops", 0.0))
byt = float(ca.get("bytes accessed", 0.0))
# HBM-resident operand/output traffic only (excludes the on-chip scratch
# the generic counter sometimes folds in)
byt_out = float(ca.get("bytes accessed output", 0.0))

s, m = step(state, batch)
np.asarray(m["loss_g"])
t0 = time.perf_counter()
for _ in range(iters):
    s, m = step(s, batch)
np.asarray(m["loss_g"])
dt = (time.perf_counter() - t0) / iters

compute_floor_ms = flops / (PEAK_BF16_TFLOPS * 1e12) * 1e3
memory_floor_ms = byt / (HBM_GBPS * 1e9) * 1e3
floor_ms = max(compute_floor_ms, memory_floor_ms)
print(
    f"b{B}·{PATCH}² bwd={ATTN_BWD}: measured {dt*1e3:.1f} ms/step "
    f"({1/dt:.2f} steps/s)\n"
    f"  XLA cost analysis: {flops/1e9:.1f} GFLOP, "
    f"{byt/1e9:.2f} GB accessed (output {byt_out/1e9:.2f} GB)\n"
    f"  compute floor {compute_floor_ms:.1f} ms @ {PEAK_BF16_TFLOPS:.0f} TF/s"
    f" | memory floor {memory_floor_ms:.1f} ms @ {HBM_GBPS:.0f} GB/s\n"
    f"  binding floor {floor_ms:.1f} ms -> measured/floor = {dt*1e3/floor_ms:.2f}x"
)
