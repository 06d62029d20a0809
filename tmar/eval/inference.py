"""Inference paths: full-slice and overlapping tiled evaluation.

Mirrors reference testing/test_finetuned_model.py:
* full-slice (run_full_slice_eval :102-147): the generator pads H,W to
  multiples of 32 internally and crops back, so a 416² slice runs as one
  448²-padded forward — one jit bucket per eval shape.
* tiled (run_tiled_eval :150-235): overlapping tiles (default 64 px, stride
  32) batched through one jit'd forward, accumulated and averaged by
  coverage weight.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_inference_fn(generator, params) -> Callable[[np.ndarray], np.ndarray]:
    """Return a jit'd NHWC forward closure (one compile per input shape)."""

    @jax.jit
    def forward(x):
        return generator.apply({"params": params}, x)

    return lambda x: np.asarray(forward(jnp.asarray(x)))


def full_slice_eval(
    forward: Callable[[np.ndarray], np.ndarray],
    ct: np.ndarray,
) -> np.ndarray:
    """ct: [B, H, W, 1] in [-1,1] -> restored [B, H, W, 1]."""
    return forward(ct)


def _tile_positions(size: int, tile: int, stride: int) -> List[int]:
    if size <= tile:
        return [0]
    pos = list(range(0, size - tile + 1, stride))
    if pos[-1] != size - tile:
        pos.append(size - tile)
    return pos


def tiled_eval(
    forward: Callable[[np.ndarray], np.ndarray],
    ct: np.ndarray,
    tile: int = 64,
    stride: int = 32,
    tile_batch: int = 64,
) -> np.ndarray:
    """Overlapping tiled inference with accumulation-weight averaging.

    ct: [B, H, W, 1].  All tiles share one (tile, tile) jit bucket; they are
    batched ``tile_batch`` at a time through ``forward``.
    """
    B, H, W, C = ct.shape
    rows = _tile_positions(H, tile, stride)
    cols = _tile_positions(W, tile, stride)

    out = np.zeros_like(ct, dtype=np.float64)
    weight = np.zeros((1, H, W, 1), dtype=np.float64)

    coords = [(r, c) for r in rows for c in cols]
    tiles = np.stack(
        [ct[b, r : r + tile, c : c + tile, :] for b in range(B) for (r, c) in coords]
    )
    results = []
    n = tiles.shape[0]
    pad = (-n) % tile_batch
    if pad:
        tiles = np.concatenate([tiles, np.zeros((pad,) + tiles.shape[1:], tiles.dtype)])
    for i in range(0, tiles.shape[0], tile_batch):
        results.append(forward(tiles[i : i + tile_batch]))
    results = np.concatenate(results)[:n]

    k = 0
    for b in range(B):
        for r, c in coords:
            out[b, r : r + tile, c : c + tile, :] += results[k]
            k += 1
    for r, c in coords:
        weight[0, r : r + tile, c : c + tile, :] += 1.0
    return (out / weight).astype(np.float32)


def make_tiled_eval_jit(
    generator,
    params,
    tile: int = 64,
    stride: int = 32,
    mesh=None,
) -> Callable[[np.ndarray], np.ndarray]:
    """Fully device-side tiled eval: tile extraction, the batched forward and
    the coverage-weighted assembly run inside ONE jit — one dispatch per ct
    batch instead of one per tile chunk (the per-dispatch latency of a
    remote/tunneled TPU dominates the host-assembled ``tiled_eval``; same
    math, reference testing/test_finetuned_model.py:150-235).

    With ``mesh``, the flat tile batch is sharding-constrained over the
    data axis so the forward spreads across all devices (supersedes host-
    side sharding; see tmar.parallel.sharded_tiled_eval).

    Returns a closure [B, H, W, C] -> [B, H, W, C]; one compile per
    (B, H, W) bucket.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    constraint = None
    if mesh is not None:
        from tmar.core.mesh import DATA_AXIS

        constraint = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
        params = jax.device_put(params, NamedSharding(mesh, PartitionSpec()))

    return lambda ct: np.asarray(
        _tiled_run(generator, tile, stride, constraint, params, jnp.asarray(ct))
    )


def _phase_groups(size: int, tile: int, stride: int):
    """Phase-grouped tile positions: group g holds positions ≡ g·stride
    (mod tile), which are non-overlapping and tile a contiguous span.
    Only valid when tile % stride == 0 and (size − tile) % stride == 0
    (every position stride-aligned, no tail tile)."""
    k = tile // stride
    groups = []
    for g in range(k):
        off = g * stride
        count = (size - tile - off) // tile + 1
        groups.append((off, count))
    return groups


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _tiled_run(generator, tile, stride, constraint, params, ct):
    """Jitted body of make_tiled_eval_jit (module-level so the jit cache is
    shared across closure constructions; the flax module, tile geometry and
    sharding constraint are static/hashable).

    Extraction/assembly strategy: when the geometry allows (tile a multiple
    of stride, positions aligned — true for the canonical 416²/64/32), the
    overlapping tile grid decomposes into (tile/stride)² PHASE GROUPS of
    non-overlapping tiles.  Each group extracts as one slice + reshape +
    transpose and assembles as one reverse-transpose + pad — k²·2 fused
    layout ops instead of the n_tiles slice/stack + n_tiles scatter-adds of
    the general path (144 sequential 64×64 dynamic-update-slices at
    416²/64/32, the r2 tiled-eval bottleneck — VERDICT r2 #7)."""
    B, H, W, C = ct.shape
    rows = _tile_positions(H, tile, stride)
    cols = _tile_positions(W, tile, stride)
    coords = [(r, c) for r in rows for c in cols]
    weight = np.zeros((1, H, W, 1), np.float32)
    for r, c in coords:
        weight[0, r : r + tile, c : c + tile, :] += 1.0
    inv_w = jnp.asarray(1.0 / weight)

    aligned = (
        tile % stride == 0
        and (H - tile) % stride == 0
        and (W - tile) % stride == 0
        and H > tile and W > tile
    )
    if aligned and C == 1:
        # Squeeze the trailing C=1 for every layout op: with it, each
        # transpose/pad/concat tiles as [.., tile, 1] minors (1/128 TPU
        # lane utilisation); without it the minor dim is tile=64 (64/128).
        # Measured on-chip A/B vs the C-carrying aligned path below:
        # see PERF.md "Tiled eval (416²/64/32)" section.
        img = ct[..., 0]                                  # [B, H, W]
        rgroups = _phase_groups(H, tile, stride)
        cgroups = _phase_groups(W, tile, stride)
        flats, geom = [], []
        for ro, rn in rgroups:
            for co, cn in cgroups:
                x = img[:, ro : ro + rn * tile, co : co + cn * tile]
                x = x.reshape(B, rn, tile, cn, tile)
                x = x.transpose(0, 1, 3, 2, 4)            # [B, rn, cn, t, t]
                flats.append(x.reshape(B * rn * cn, tile, tile))
                geom.append((ro, rn, co, cn))
        flat = jnp.concatenate(flats, axis=0)[..., None]  # [N, t, t, 1]
        if constraint is not None:
            flat = jax.lax.with_sharding_constraint(flat, constraint)
        res = generator.apply({"params": params}, flat)
        res = res[..., 0].astype(jnp.float32)             # [N, t, t]
        out = jnp.zeros((B, H, W), jnp.float32)
        k = 0
        for ro, rn, co, cn in geom:
            n = B * rn * cn
            canvas = (
                res[k : k + n]
                .reshape(B, rn, cn, tile, tile)
                .transpose(0, 1, 3, 2, 4)
                .reshape(B, rn * tile, cn * tile)
            )
            k += n
            out = out + jnp.pad(
                canvas,
                ((0, 0), (ro, H - ro - rn * tile), (co, W - co - cn * tile)),
            )
        return (out * inv_w[..., 0])[..., None]

    if aligned:
        rgroups = _phase_groups(H, tile, stride)
        cgroups = _phase_groups(W, tile, stride)
        flats, geom = [], []
        for ro, rn in rgroups:
            for co, cn in cgroups:
                x = ct[:, ro : ro + rn * tile, co : co + cn * tile, :]
                x = x.reshape(B, rn, tile, cn, tile, C)
                x = x.transpose(0, 1, 3, 2, 4, 5)    # [B, rn, cn, t, t, C]
                flats.append(x.reshape(B * rn * cn, tile, tile, C))
                geom.append((ro, rn, co, cn))
        flat = jnp.concatenate(flats, axis=0)
        if constraint is not None:
            flat = jax.lax.with_sharding_constraint(flat, constraint)
        res = generator.apply({"params": params}, flat).astype(jnp.float32)
        out = jnp.zeros((B, H, W, C), jnp.float32)
        k = 0
        for ro, rn, co, cn in geom:
            n = B * rn * cn
            canvas = (
                res[k : k + n]
                .reshape(B, rn, cn, tile, tile, C)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(B, rn * tile, cn * tile, C)
            )
            k += n
            out = out + jnp.pad(
                canvas,
                ((0, 0), (ro, H - ro - rn * tile), (co, W - co - cn * tile), (0, 0)),
            )
        return out * inv_w

    tiles = jnp.stack(
        [ct[:, r : r + tile, c : c + tile, :] for (r, c) in coords], axis=1
    )                                                # [B, nT, tile, tile, C]
    flat = tiles.reshape(B * len(coords), tile, tile, C)
    if constraint is not None:
        flat = jax.lax.with_sharding_constraint(flat, constraint)
    res = generator.apply({"params": params}, flat).astype(jnp.float32)
    res = res.reshape(B, len(coords), tile, tile, C)
    out = jnp.zeros((B, H, W, C), jnp.float32)
    for i, (r, c) in enumerate(coords):
        out = out.at[:, r : r + tile, c : c + tile, :].add(res[:, i])
    return out * inv_w
