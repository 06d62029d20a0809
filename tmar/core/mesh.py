"""Device mesh and sharding helpers.

The reference framework has no distributed runtime at all (its only multi-device
construct is a dormant ``nn.DataParallel`` guard, reference
training/train_combined.py:234-253).  Here the runtime is first-class: a
``jax.sharding.Mesh`` over which the GAN train step is jit-compiled, with batch
data sharded over the ``data`` axis and parameters replicated.  XLA inserts the
gradient ``psum`` collectives automatically from the sharding annotations.

The default single-axis mesh targets a TPU v5e-8 slice (8 chips over ICI); a
second ``model`` axis is supported for spatial / tensor sharding experiments.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def local_mesh_devices(n_devices: Optional[int] = None) -> list:
    """Return up to ``n_devices`` local devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return devices


def create_mesh(
    n_devices: Optional[int] = None,
    *,
    model_parallel: int = 1,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Create a ``Mesh`` with a data axis and an optional model axis.

    ``model_parallel=1`` gives the canonical pure data-parallel layout used for
    training (the reference's recipe is single-device; DP over the mesh is the
    TPU-native scale-out, SURVEY.md §2.12).
    """
    devices = local_mesh_devices(n_devices)
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    dp = n // model_parallel
    device_array = np.array(devices).reshape(dp, model_parallel)
    return Mesh(device_array, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Sharding that splits the leading (batch) dim over the data axis."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch dim sharded."""
    def _put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, max(x.ndim, 1)))

    return jax.tree_util.tree_map(_put, batch)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def _tp_spec(path) -> P:
    """Megatron-style tensor-parallel rule for one param leaf (by path).

    Attention/FFN first matmuls split their OUTPUT dim over ``MODEL_AXIS``
    (qkv/fc1 kernels column-wise + their biases), the second matmuls split
    their INPUT dim (proj/fc2 kernels row-wise, biases replicated) so each
    shard computes a partial sum and XLA inserts one psum per pair; all
    other leaves (norms, convs, RPB tables, logit scales) are replicated.
    Suffix matching makes the same rule cover optimizer-moment mirrors of
    the params (adam mu/nu carry the param path as a suffix).

    The n-gram context layers are excluded (replicated): their sliding
    attention runs on tiny per-window tensors (e.g. [B·nW, heads, 4, 4])
    whose reshapes GSPMD cannot re-shard from the batch layout to a
    head-split layout — it falls back to "Involuntary full
    rematerialization" (replicate-then-partition) on every NSTB, measured
    in the r4 multichip dryrun (MULTICHIP_r04 tail; XLA b/433785288).
    Head-splitting them would cost more in that fallback than the tiny
    matmuls save, so TP is scoped to the main window-attention + FFN
    matmuls where the Megatron split actually pays; ngram params ride the
    data axis replicated.  The dryrun asserts the warning count is zero.
    """
    s = jax.tree_util.keystr(path)
    if "['ngram_context']" in s:
        return P()
    if s.endswith("['qkv']['kernel']") or s.endswith("['fc1']['kernel']"):
        return P(None, MODEL_AXIS)
    if s.endswith("['qkv']['bias']") or s.endswith("['fc1']['bias']"):
        return P(MODEL_AXIS)
    if s.endswith("['proj']['kernel']") or s.endswith("['fc2']['kernel']"):
        return P(MODEL_AXIS, None)
    return P()


def tp_shardings(mesh: Mesh, tree):
    """NamedSharding tree applying the tensor-parallel rule to ``tree``."""
    return jax.tree_util.tree_map_with_path(
        lambda p, _: NamedSharding(mesh, _tp_spec(p)), tree
    )


def _fsdp_spec(leaf, data_size: int, path=None) -> P:
    """ZeRO/FSDP-style rule: shard a leaf's largest divisible dim over
    DATA_AXIS (params + optimizer moments live sharded; XLA all-gathers
    params at use and reduce-scatters gradients from the annotations).
    Leaves with no dim divisible by the data-axis size stay replicated.

    The n-gram context layers are excluded for the same measured reason as
    in ``_tp_spec``: sharding their packed qkv output dim makes GSPMD
    propagate a head-split layout into the tiny per-window attention
    reshapes and fall back to involuntary full rematerialization on every
    step (r5 dryrun, 40 warnings in the FSDP step compile — the burst the
    r4 tail attributed to tp).  They are a small fraction of the params;
    replicating them costs ZeRO almost nothing."""
    if path is not None and "['ngram_context']" in jax.tree_util.keystr(path):
        return P()
    shape = getattr(leaf, "shape", ())
    for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if shape[i] >= 2 and shape[i] % data_size == 0:
            spec = [None] * len(shape)
            spec[i] = DATA_AXIS
            return P(*spec)
    return P()


def fsdp_shardings(mesh: Mesh, tree):
    """NamedSharding tree sharding every eligible leaf over DATA_AXIS."""
    n = mesh.shape[DATA_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: NamedSharding(mesh, _fsdp_spec(leaf, n, p)), tree
    )


def gan_state_shardings(
    mesh: Mesh, state, *, tensor_parallel: bool = False, fsdp: bool = False
):
    """Sharding tree for a ``GANTrainState``.

    Default: everything replicated (pure DP — the canonical training
    layout).  ``tensor_parallel=True``: the generator's params AND its
    optimizer moments are Megatron-split over ``MODEL_AXIS`` (XLA inserts
    the activation psums from the annotations alone — GSPMD); the (much
    smaller) discriminator and scalars stay replicated.  ``fsdp=True``:
    every eligible param/moment leaf of BOTH networks is ZeRO-sharded over
    ``DATA_AXIS`` (all-gather at use, reduce-scatter on gradients — also
    from the annotations alone).  FSDP composes with the fused Pallas
    kernels (params are full tensors at use); tensor parallelism does not
    (the kernels pack the full head set), so tp requires the plain XLA
    attention path (``use_pallas_attention=False``).
    """
    if tensor_parallel and fsdp:
        raise ValueError("choose tensor_parallel OR fsdp (not both)")
    repl = NamedSharding(mesh, P())
    if not (tensor_parallel or fsdp):
        return jax.tree_util.tree_map(lambda _: repl, state)
    split = (
        (lambda t: tp_shardings(mesh, t)) if tensor_parallel
        else (lambda t: fsdp_shardings(mesh, t))
    )
    d_split = split if fsdp else (
        lambda t: jax.tree_util.tree_map(lambda _: repl, t)
    )
    return state.replace(
        step=repl,
        g_params=split(state.g_params),
        g_opt=split(state.g_opt),
        d_params=d_split(state.d_params),
        d_sn=jax.tree_util.tree_map(lambda _: repl, state.d_sn),
        d_opt=d_split(state.d_opt),
        g_ema=split(state.g_ema),  # tree_map over None → None (EMA off)
    )


def force_host_device_count(n: int) -> None:
    """Set up N virtual CPU devices (must run before jax initialises).

    Used by tests and ``__graft_entry__.dryrun_multichip`` to validate
    multi-chip sharding without TPU hardware.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
