"""Input-pipeline integration: decode batches straight onto the device mesh.

The production consumption pattern for a TPU image codec is a training/
serving input pipeline: encoded bytes stream in on the host, decoded pixel
batches come out as (optionally sharded) jax.Arrays with the decode of batch
N+1 overlapping the device compute of batch N (the 2-page pipeline analog,
extensions/nvjpeg/cuda_decoder.cpp:425-427)."""
from __future__ import annotations

from typing import Iterable, Iterator, Optional, Sequence

from .api import Decoder
from .core.interfaces import DecodeParams


def decode_batches(
    stream_batches: Iterable[Sequence[bytes]],
    params: Optional[DecodeParams] = None,
    decoder: Optional[Decoder] = None,
    mesh=None,
    drop_failed: bool = True,
) -> Iterator[list]:
    """Yield lists of decoded images (device arrays) per input batch of
    encoded byte strings, pipelined: the host stage of the next batch runs
    while the previous batch's device work completes (jax dispatch is
    async — we only force completion one batch late).

    With `mesh`, same-shape batches are additionally stacked and sharded
    over the mesh's "dp" axis.
    """
    import jax

    dec = decoder or Decoder()
    params = params or DecodeParams()
    prev = None
    for batch in stream_batches:
        outs = dec.decode(list(batch), params)
        if drop_failed:
            outs = [o for o in outs if o is not None]
        if mesh is not None and outs:
            from jax.sharding import NamedSharding, PartitionSpec as P

            arrs = [o.array for o in outs]
            if len({tuple(a.shape) for a in arrs}) == 1:
                import jax.numpy as jnp

                stacked = jnp.stack([jnp.asarray(a) for a in arrs])
                outs = jax.device_put(stacked, NamedSharding(mesh, P("dp")))
        if prev is not None:
            jax.block_until_ready(
                prev if not isinstance(prev, list) else
                [p.array if hasattr(p, "array") else p for p in prev]
            )
            yield prev
        prev = outs
    if prev is not None:
        jax.block_until_ready(
            prev if not isinstance(prev, list) else
            [p.array if hasattr(p, "array") else p for p in prev]
        )
        yield prev
