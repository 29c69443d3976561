"""Multi-host initialization and byte-stream distribution helpers.

The reference is single-process/single-GPU; scaling across a pod slice is a
first-class axis here (SURVEY.md §2.7). The flow:

1. every host calls `initialize()` (jax.distributed) so all chips of the
   slice form one global device set;
2. encoded byte streams live on hosts — `shard_streams()` splits a batch of
   encoded images across processes with the same (subsampling-class, area)
   largest-first order the scheduler uses, so per-host decode work balances;
3. each host decodes its shard (host entropy stage is per-host CPU work);
4. `global_batch()` builds a jax.Array from per-host shards with
   `make_array_from_process_local_data` — pixel data never leaves its host's
   chips; downstream consumers see one global array sharded over "dp".

On a single host this degrades to the local mesh (tests run that way).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with explicit or env-provided topology.
    No-op when already initialized or single-process."""
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # tolerate only double-initialization; real failures must surface
        if "already initialized" not in str(e).lower():
            raise


def shard_streams(streams: Sequence[bytes], num_shards: int,
                  keys: Optional[Sequence[tuple]] = None) -> List[List[int]]:
    """Balanced split of encoded streams across hosts: order by descending
    cost key (default: byte length as the area proxy), deal round-robin.
    Returns per-shard index lists (indices into `streams`)."""
    order = sorted(
        range(len(streams)),
        key=(lambda i: keys[i]) if keys is not None else (lambda i: -len(streams[i])),
    )
    shards: List[List[int]] = [[] for _ in range(num_shards)]
    for pos, idx in enumerate(order):
        shards[pos % num_shards].append(idx)
    return shards


def global_batch(local_pixels: np.ndarray, mesh, axis: str = "dp"):
    """Assemble a globally-sharded jax.Array from this process's decoded
    shard ([local_B, H, W, C]); the global batch dim is the concatenation
    over processes in process order."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_pixels)
