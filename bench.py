"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: NGswin 512x512 CT-slice restoration throughput (slices/sec/chip),
the BASELINE.json north-star.  Also measures full G/D train-step throughput;
both ride in the JSON payload (extra keys beyond the required four).

Timing protocol: chained iterations (each step's output feeds the next
step's input) followed by a device->host transfer of one element.  On
tunneled/remote PJRT backends, ``block_until_ready`` alone can return before
remote execution completes — the dependency chain plus the host read is the
only honest fence (validated against the MXU roofline: an 8192³ bf16 matmul
chain measures ~163 TFLOP/s ≈ 83% of v5e peak with this protocol, vs a
physically impossible 9000+ TFLOP/s without it).

A persistent XLA compilation cache under .jax_cache/ makes repeat bench runs
skip the multi-minute 512² compile.

The reference publishes no numbers (BASELINE.md): ``vs_baseline`` is
computed against a documented, measurement-anchored A100 estimate.
MEASURED anchor (this machine, 2026-08-16): the reference's own PyTorch
NGswin (loaded via the tests/torch_ref.py shim) runs 512² inference at
0.024 slices/s on CPU (8 threads, eager fp32, 41 s/slice) and 0.48
slices/s at 128² b4.  Torch-eager on A100 for this workload class
(hundreds of small memory-bound kernels per forward, 1M-param model)
is typically 20-60x a modern CPU; we grant the reference a generous
50x => A100 ≈ 1.2 slices/s at 512².  The BASELINE.json 5x-A100 target is
therefore ≈ 6 slices/s/chip.  Same derivation for training: CPU fwd
b4x128² = 0.48 samples/s, a full G/D iteration ≈ 4-5 forward-equivalents,
50x A100 => ≈ 4-6 samples/s; we pin 5.0 samples/s and compare per-sample.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

A100_BASELINE_SLICES_PER_S = 1.2        # 50x measured torch-CPU anchor (see above)
A100_BASELINE_TRAIN_SAMPLES_PER_S = 5.0  # full G/D step, per-sample, A100 estimate

SLICE = 512
BATCH = 8
TRAIN_PATCH = 128
TRAIN_BATCH = 8


def _setup_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _chained_time(f, x0, iters, *extra):
    """Honest device timing: chained dependent calls + host readback fence."""
    y = f(x0, *extra)
    np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[:1]  # warm fence
    t0 = time.perf_counter()
    y = x0
    for _ in range(iters):
        y = f(y, *extra)
    np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


import jax  # noqa: E402  (after docstring; cache set in main)


def bench_inference():
    import jax.numpy as jnp

    from tmar.nn import NGswin

    # fused Pallas window attention on the inference path (tmar.ops.
    # pallas_attention; whole-NSTB map kernels)
    model = NGswin(dtype=jnp.bfloat16, use_pallas_attention=True)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (BATCH, SLICE, SLICE, 1)).astype(np.float32)
    )
    # init at the training shape bucket (kept identical across runs so the
    # persistent compilation cache hits)
    small = jnp.zeros((8, 128, 128, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), small)["params"]

    fwd = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
    y = fwd(params, x)
    np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[:1]
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        y = fwd(params, y)
    np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    return BATCH / dt


def bench_train_step():
    import jax.numpy as jnp
    import optax

    from tmar.losses import LossWeights
    from tmar.nn import MultiScaleDiscriminator, NGswin
    from tmar.ops import Radon
    from tmar.train import create_train_state, make_train_step

    # pallas fwd + hand-written fused backward kernels + the n-gram context
    # megakernel (on by default on hardware) + batched real/fake D passes:
    # the measured winner of the r2 train A/B matrix, 8.84 steps/s vs 7.09
    # without the megakernel and 6.27 at the r1 defaults (PERF.md)
    gen = NGswin(dtype=jnp.bfloat16, use_pallas_attention=True,
                 attn_backward="pallas")
    disc = MultiScaleDiscriminator(dtype=jnp.bfloat16)
    g_tx = optax.adam(1e-4, b1=0.5, b2=0.999)
    d_tx = optax.adam(2e-4, b1=0.5, b2=0.999)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, patch_size=TRAIN_PATCH
    )
    radon = Radon(TRAIN_PATCH, np.linspace(0, np.pi, 180, endpoint=False))
    # donate=True is the Trainer's actual configuration (steps.py default:
    # the state is donated every step); benching the undonated variant
    # measured a phantom ~1.4 ms/step of buffer churn the production loop
    # never pays (r5: 101.2 ms undonated vs 99.7 donated, 10.03 steps/s)
    step = make_train_step(
        gen, disc, g_tx, d_tx, LossWeights(), projector=radon, donate=True,
        fused_pairs=True
    )

    rng = np.random.default_rng(0)
    batch = jax.device_put(
        {
            "ct": rng.uniform(-1, 1, (TRAIN_BATCH, TRAIN_PATCH, TRAIN_PATCH, 1)).astype(np.float32),
            "gt": rng.uniform(-1, 1, (TRAIN_BATCH, TRAIN_PATCH, TRAIN_PATCH, 1)).astype(np.float32),
        }
    )

    # chain through the state so every step depends on the previous one
    def one(state, batch):
        s, m = step(state, batch)
        return s, m

    s, m = one(state, batch)
    np.asarray(m["loss_g"])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        s, m = one(s, batch)
    np.asarray(m["loss_g"])
    return iters / (time.perf_counter() - t0)


def bench_eval_matrix(extra):
    """Eval-pipeline shape matrix (VERDICT r1 item 7): 128² batch inference
    with the CURRENT kernels, 416² full-slice (the SynDeepLesion eval
    shape), 64/32 overlapping tiled eval, and the mesh-sharded tiled path —
    the shapes tmar/eval/inference.py + tmar/parallel.py actually serve."""
    import jax.numpy as jnp

    from tmar.core.mesh import create_mesh
    from tmar.eval.inference import tiled_eval
    from tmar.nn import NGswin
    from tmar.parallel import sharded_tiled_eval

    model = NGswin(dtype=jnp.bfloat16, use_pallas_attention=True)
    small = jnp.zeros((8, 128, 128, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), small)["params"]
    fwd = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
    rng = np.random.default_rng(0)

    x128 = jnp.asarray(rng.uniform(-1, 1, (8, 128, 128, 1)).astype(np.float32))
    dt = _chained_time(lambda y: fwd(params, y), x128, 30)
    extra["inference_128_b8_slices_per_s"] = round(8 / dt, 1)

    x416 = jnp.asarray(rng.uniform(-1, 1, (4, 416, 416, 1)).astype(np.float32))
    dt = _chained_time(lambda y: fwd(params, y), x416, 10)
    extra["full_slice_416_slices_per_s"] = round(4 / dt, 2)

    # tiled eval: 64² tiles, stride 32, coverage-averaged.  Served path =
    # make_tiled_eval_jit (extraction + forward + assembly in ONE jit /
    # one dispatch); the host-assembled callback path (external-adapter
    # protocol) is kept as a comparison key.
    from tmar.eval.inference import make_tiled_eval_jit

    ct = np.asarray(x416)
    reps = 3

    tiled_jit = make_tiled_eval_jit(model, params, tile=64, stride=32)
    tiled_jit(ct)  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        tiled_jit(ct)
    extra["tiled_64_32_slices_per_s"] = round(
        reps * ct.shape[0] / (time.perf_counter() - t0), 2
    )

    # like-for-like with full_slice_416 (device-resident chained, no per-call
    # host<->device transfer over the tunnel — the serving closure above pays
    # ~11 MB of npy traffic per batch; PERF.md "Tiled eval" section)
    from tmar.eval.inference import _tiled_run

    dev = jnp.asarray(np.asarray(ct))
    dt = _chained_time(
        lambda y: _tiled_run(model, 64, 32, None, params, y), dev, 10
    )
    extra["tiled_64_32_device_slices_per_s"] = round(ct.shape[0] / dt, 2)

    def np_fwd(t):
        return np.asarray(jax.device_get(fwd(params, jnp.asarray(t))))

    tiled_eval(np_fwd, ct, tile=64, stride=32)  # warm both tile buckets
    t0 = time.perf_counter()
    for _ in range(reps):
        tiled_eval(np_fwd, ct, tile=64, stride=32)
    extra["tiled_hostpath_slices_per_s"] = round(
        reps * ct.shape[0] / (time.perf_counter() - t0), 2
    )

    # the mesh-sharded tiled path is only a meaningful number on >1 device
    # (on one chip it can only add constraint overhead — VERDICT r3 weak #2);
    # a 1-device run keeps it as a liveness check, not a headline metric
    n_dev = len(jax.devices())
    mesh = create_mesh(n_dev)
    sharded_tiled_eval(model, params, mesh, ct, tile=64, stride=32)
    if n_dev > 1:
        t0 = time.perf_counter()
        for _ in range(reps):
            sharded_tiled_eval(model, params, mesh, ct, tile=64, stride=32)
        extra["sharded_tiled_slices_per_s"] = round(
            reps * ct.shape[0] / (time.perf_counter() - t0), 2
        )
    else:
        extra["sharded_tiled_note"] = (
            "1-device run: sharded tiled path exercised for liveness only; "
            "throughput reported only on a multi-chip mesh"
        )


def bench_host_pipeline():
    """Host input-pipeline throughput via the production shard-cache path:
    build a small npy shard cache, then measure Loader samples/s (mmap read
    + crop + flip + NHWC batch assembly).  Compared against the 8-chip
    training consumption rate (VERDICT r1 #9)."""
    import shutil
    import tempfile

    from tmar.data import Loader, ShardCachedDataset, SyntheticMARDataset, build_shard_cache

    tmp = tempfile.mkdtemp(prefix="tmar_bench_cache_")
    try:
        build_shard_cache(
            SyntheticMARDataset(size=416, length=64), tmp, shard_size=32
        )
        ds = ShardCachedDataset(tmp, patch_size=TRAIN_PATCH, augment=True, length=2048)
        loader = Loader(ds, batch_size=TRAIN_BATCH, num_workers=4, keys=("ct", "gt"))
        it = iter(loader)
        for _ in range(8):  # warm page cache / threads
            next(it)
        n = 128
        t0 = time.perf_counter()
        for _ in range(n):
            next(it)
        dt = time.perf_counter() - t0
        return n * TRAIN_BATCH / dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    # Bounded backend probe (shared with the driver entry): a TPU-tunnel
    # outage makes the first device op hang 30+ min inside the plugin's
    # retry loop — probe in a subprocess, retry a few times, then emit an
    # HONEST error JSON instead of hanging or printing nothing.
    from __graft_entry__ import _bounded_probe

    backend = ""
    for attempt in range(5):
        backend, _ = _bounded_probe()
        if backend != "":
            break  # definite answer (tpu-like or cpu) — retrying won't change it
        if attempt < 4:
            time.sleep(120)  # probe timed out (outage?) — wait and retry
    if backend in ("", "cpu"):
        reason = (
            "TPU backend unreachable (tunnel outage): bounded probes timed "
            "out for ~20 min" if backend == ""
            else "no TPU backend on this host (probe answered 'cpu')"
        )
        print(json.dumps({
            "metric": "ngswin_512_inference",
            "value": 0.0,
            "unit": "slices/sec/chip",
            "vs_baseline": 0.0,
            "error": (
                f"{reason} — NOT a model regression; see the previous "
                "BENCH_r*.json for the last healthy measurement"
            ),
        }))
        return
    _setup_cache()
    slices_per_s = bench_inference()
    extra = {}

    # absolute numbers + analytic-FLOPs utilisation (VERDICT r1 #10) — the
    # anchor-relative multipliers ride alongside, not instead
    from tmar.nn import NGswin as _NG

    flops_per_slice = int(_NG().flops((SLICE, SLICE)))
    extra["flops_per_slice"] = flops_per_slice
    extra["ms_per_slice"] = round(1000.0 / slices_per_s, 2)
    extra["tflops_achieved"] = round(flops_per_slice * slices_per_s / 1e12, 3)
    # MFU two ways (VERDICT r3 #9): against the v5e bf16 paper peak and
    # against this environment's MEASURED matmul ceiling (163 TFLOP/s,
    # 8192^3 bf16 chain — PERF.md timing-protocol validation)
    extra["mfu_vs_peak_bf16"] = round(
        flops_per_slice * slices_per_s / (394.0e12), 4
    )
    extra["mfu_vs_measured_ceiling"] = round(
        flops_per_slice * slices_per_s / (163.0e12), 4
    )

    try:
        steps_per_s = bench_train_step()
        extra["train_steps_per_s"] = round(steps_per_s, 3)
        extra["train_samples_per_s"] = round(steps_per_s * TRAIN_BATCH, 3)
        extra["train_ms_per_step"] = round(1000.0 / steps_per_s, 1)
        extra["train_vs_baseline"] = round(
            steps_per_s * TRAIN_BATCH / A100_BASELINE_TRAIN_SAMPLES_PER_S, 2
        )
        extra["train_config"] = (
            f"batch {TRAIN_BATCH} x {TRAIN_PATCH}^2, full loss recipe incl. 180-angle radon"
        )
        # BASELINE.json's 5x-A100 target is for a v5e-8 slice; training is
        # data-parallel across the mesh (one jit step, batch sharded,
        # validated on 8 virtual devices) => linear-in-chips projection.
        extra["v5e8_train_samples_per_s_projected"] = round(steps_per_s * TRAIN_BATCH * 8, 2)
        extra["v5e8_train_vs_baseline_projected"] = round(
            steps_per_s * TRAIN_BATCH * 8 / A100_BASELINE_TRAIN_SAMPLES_PER_S, 2
        )
        extra["v5e8_projection_basis"] = (
            "measured 1-chip train rate x 8: NOT a measurement — dp step is "
            "one jit program with batch sharded; correctness validated on 8 "
            "virtual devices, multi-chip hardware unavailable here"
        )
    except Exception as e:
        extra["train_error"] = repr(e)[:200]
    try:
        bench_eval_matrix(extra)
    except Exception as e:
        extra["eval_matrix_error"] = repr(e)[:200]
    try:
        host_sps = bench_host_pipeline()
        extra["host_samples_per_s"] = round(host_sps, 1)
        if "train_samples_per_s" in extra:  # only a MEASURED ratio, never a stand-in
            consumption_8chip = extra["train_samples_per_s"] * 8
            extra["host_vs_8chip_consumption"] = round(host_sps / consumption_8chip, 2)
    except Exception as e:
        extra["host_pipeline_error"] = repr(e)[:200]
    payload = {
        "metric": "ngswin_512_inference",
        "value": round(slices_per_s, 3),
        "unit": "slices/sec/chip",
        "vs_baseline": round(slices_per_s / A100_BASELINE_SLICES_PER_S, 3),
        "baseline_note": (
            f"absolute: {1000.0 / slices_per_s:.1f} ms/slice at 512^2, "
            f"{extra['tflops_achieved']} TFLOP/s achieved (mfu keys ride "
            "alongside). vs_baseline divides by a CONSTRUCTED A100 anchor: "
            "50x the MEASURED torch-CPU rate of the reference model "
            "(0.024 slices/s @512^2); the reference publishes no numbers "
            "(BASELINE.md)"
        ),
        **extra,
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
