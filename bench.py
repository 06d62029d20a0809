"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: NGswin 512x512 CT-slice restoration throughput (slices/sec/chip),
the BASELINE.json north-star.  Also measures full G/D train-step throughput
and reports both in the JSON payload (extra keys beyond the required four).

The reference publishes no numbers (BASELINE.md): ``vs_baseline`` is computed
against a documented A100 PyTorch-eager estimate derived below, to be
replaced by a measured torch/A100 number if one ever lands in BASELINE.json.

A100 baseline estimate (documented, conservative-favourable to the reference):
  NGswin at 512² is ~118 GFLOP/slice (tmar.nn.NGswin.flops((512,512)),
  MAC-counted as in reference ngswin.py:212-238).  PyTorch eager fp32 on
  A100 for small-window attention workloads with this many layout ops
  typically sustains ~6 TFLOP/s (~30% of 19.5 fp32-TF peak — generous);
  that gives ~50 slices/s.  We pin A100_BASELINE_SLICES_PER_S = 50.0.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_BASELINE_SLICES_PER_S = 50.0

SLICE = 512
BATCH = 8
TRAIN_PATCH = 128
TRAIN_BATCH = 8


def _time(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_inference():
    import jax
    import jax.numpy as jnp

    from tmar.nn import NGswin

    model = NGswin(dtype=jnp.bfloat16)
    x = jnp.zeros((BATCH, SLICE, SLICE, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]

    @jax.jit
    def forward(p, x):
        return model.apply({"params": p}, x)

    dt = _time(forward, params, x)
    return BATCH / dt  # slices/sec on this one chip


def bench_train_step():
    import jax
    import optax

    from tmar.losses import LossWeights
    from tmar.nn import MultiScaleDiscriminator, NGswin
    from tmar.ops import Radon
    from tmar.train import create_train_state, make_train_step
    import jax.numpy as jnp

    gen = NGswin(dtype=jnp.bfloat16)
    disc = MultiScaleDiscriminator(dtype=jnp.bfloat16)
    g_tx = optax.adam(1e-4, b1=0.5, b2=0.999)
    d_tx = optax.adam(2e-4, b1=0.5, b2=0.999)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, patch_size=TRAIN_PATCH
    )
    radon = Radon(TRAIN_PATCH, np.linspace(0, np.pi, 180, endpoint=False))
    step = make_train_step(gen, disc, g_tx, d_tx, LossWeights(), projector=radon)

    rng = np.random.default_rng(0)
    batch = {
        "ct": rng.uniform(-1, 1, (TRAIN_BATCH, TRAIN_PATCH, TRAIN_PATCH, 1)).astype(np.float32),
        "gt": rng.uniform(-1, 1, (TRAIN_BATCH, TRAIN_PATCH, TRAIN_PATCH, 1)).astype(np.float32),
    }
    import jax as _jax

    batch = _jax.device_put(batch)

    def run(state, batch):
        s, m = step(state, batch)
        return s, m

    # donated state: re-time by chaining
    s, m = step(state, batch)
    _jax.block_until_ready(m)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        s, m = step(s, batch)
    _jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt  # full G/D steps per second


def main():
    slices_per_s = bench_inference()
    try:
        steps_per_s = bench_train_step()
    except Exception as e:  # keep the headline metric even if train bench fails
        steps_per_s = None
    payload = {
        "metric": "ngswin_512_inference",
        "value": round(slices_per_s, 3),
        "unit": "slices/sec/chip",
        "vs_baseline": round(slices_per_s / A100_BASELINE_SLICES_PER_S, 3),
        "train_steps_per_s": round(steps_per_s, 3) if steps_per_s else None,
        "train_config": f"batch {TRAIN_BATCH} x {TRAIN_PATCH}^2, full loss recipe incl. 180-angle radon",
        "baseline_note": "vs A100 torch-eager estimate (50 slices/s, see bench.py docstring)",
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
