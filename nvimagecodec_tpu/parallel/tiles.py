"""Tile-parallel JPEG2000 device stage: tiles sharded over the mesh.

The distributed analog of the reference's per-tile resource pool
(extensions/nvjpeg2k/cuda_decoder.cpp:601-640 fans tiles of one image over
executor threads): here the tile axis shards over the mesh's "sp" axis (or
"dp" for whole images), each chip runs the batched inverse DWT on its tile
shard, and tile-boundary halo exchange rides ICI via lax.ppermute for the
cross-tile smoothing filter (J2K tiles are transformed independently, so
boundary continuity work is the only inter-tile communication).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..ops import dwt as dwt_ops


def idwt_tiles_batched(LL, bands, tile_shape: Tuple[int, int], reversible: bool):
    """[T, ...] stacked tile subbands → [T, th, tw] pixel tiles.

    dwt ops are batch-agnostic, so the tile axis is just a leading dim;
    jit + shard the tile axis to spread tiles over chips."""
    return dwt_ops.idwt2d(LL, bands, tile_shape, reversible)


def smooth_tile_seams(tiles, mesh=None, axis_name: str = "sp"):
    """Tile-boundary smoothing across a [T, th, tw] tile stack laid out as a
    horizontal strip: each tile averages its first column with the previous
    tile's last column (and symmetrically), using ppermute when the tile
    axis is sharded over `axis_name`.

    Inside shard_map: `tiles` is the local shard [t_local, th, tw]; the
    halo (last column of the previous device's shard) moves over ICI.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def local_smooth(t):
        # within-shard neighbor exchange (vectorized shift)
        left_edge = t[:, :, :1]     # first col of each tile
        right_edge = t[:, :, -1:]   # last col
        prev_right = jnp.concatenate([right_edge[:1] * 0, right_edge[:-1]], 0)
        next_left = jnp.concatenate([left_edge[1:], left_edge[-1:] * 0], 0)
        has_prev = jnp.arange(t.shape[0])[:, None, None] > 0
        has_next = jnp.arange(t.shape[0])[:, None, None] < t.shape[0] - 1
        first = jnp.where(has_prev, (t[:, :, :1] + prev_right) // 2, t[:, :, :1])
        last = jnp.where(has_next, (t[:, :, -1:] + next_left) // 2, t[:, :, -1:])
        return jnp.concatenate([first, t[:, :, 1:-1], last], axis=2)

    if mesh is None:
        return local_smooth(tiles)

    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.4.35
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis_name]

    def shard_fn(t):
        # exchange shard-boundary halos over ICI: device d sends its last
        # tile's right edge to d+1 and its first tile's left edge to d-1
        my_last_right = t[-1, :, -1:]
        my_first_left = t[0, :, :1]
        idx = lax.axis_index(axis_name)
        prev_right = lax.ppermute(
            my_last_right, axis_name, [(i, (i + 1) % n) for i in range(n)]
        )
        next_left = lax.ppermute(
            my_first_left, axis_name, [(i, (i - 1) % n) for i in range(n)]
        )
        t = local_smooth(t)
        # blend shard-boundary columns (skip at global ends)
        first = jnp.where(
            idx > 0, (t[0, :, :1] + prev_right) // 2, t[0, :, :1]
        )
        last = jnp.where(
            idx < n - 1, (t[-1, :, -1:] + next_left) // 2, t[-1, :, -1:]
        )
        t = t.at[0, :, :1].set(first)
        t = t.at[-1, :, -1:].set(last)
        return t

    import jax

    spec = P(axis_name)
    fn = shard_map(shard_fn, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return fn(tiles)


def dryrun_tile_exchange(mesh) -> None:
    """Driver validation: jit the sharded tile pipeline (batched IDWT on a
    tile shard + cross-device halo exchange) over the mesh's 'sp' axis and
    run one step on tiny shapes."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sp = mesh.shape["sp"]
    T = max(2 * sp, sp)  # tiles, divisible by sp
    th = tw = 16
    levels = 2
    rng = np.random.default_rng(0)

    # synthesize stacked tile subbands for a [T, th, tw] strip
    x = rng.integers(-128, 128, (T, th, tw)).astype(np.int32)
    LL, bands = dwt_ops.dwt2d(x, levels, reversible=True)

    shard = NamedSharding(mesh, P("sp"))

    def step(LL, bands):
        tiles = idwt_tiles_batched(LL, list(bands), (th, tw), True)
        return smooth_tile_seams(tiles, mesh=mesh, axis_name="sp")

    jit_step = jax.jit(step)
    LL_s = jax.device_put(LL, shard)
    bands_s = tuple(
        tuple(jax.device_put(b, shard) for b in lvl) for lvl in bands
    )
    out = jit_step(LL_s, bands_s)
    out.block_until_ready()
    assert out.shape == (T, th, tw), out.shape
    # interior pixels (away from seams) must reconstruct exactly
    np.testing.assert_array_equal(np.asarray(out)[:, :, 1:-1], x[:, :, 1:-1])
