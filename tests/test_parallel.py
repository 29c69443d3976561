"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8) — the distributed layer the
reference lacks (SURVEY.md §2.7): DP over images, SP over J2K tiles with
ppermute halo exchange."""
import numpy as np
import pytest

import jax

from util import make_photo

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_dp_sharded_pixel_stage():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nvimagecodec_tpu.codecs.jpeg.encode import (
        build_encode_frame,
        encode_pixels,
    )
    from nvimagecodec_tpu.codecs.jpeg.pixel import decode_pixels
    from nvimagecodec_tpu.core.types import ChromaSubsampling
    from nvimagecodec_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=4, sp=2)
    frame = build_encode_frame(48, 64, 3, 90, ChromaSubsampling.CSS_420)
    imgs = np.stack([make_photo(48, 64, seed=s) for s in range(8)])
    coefs = [np.asarray(c) for c in encode_pixels(imgs, frame)]

    shard = NamedSharding(mesh, P("dp"))
    placed = [jax.device_put(c, shard) for c in coefs]
    fn = jax.jit(
        lambda y, cb, cr: decode_pixels(frame, [y, cb, cr], use_jax=True),
        out_shardings=shard,
    )
    out = fn(*placed)
    assert out.shape == (8, 48, 64, 3)
    # matches the unsharded numpy path exactly
    ref = decode_pixels(frame, coefs, use_jax=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sp_tile_pipeline_with_halo_exchange():
    from nvimagecodec_tpu.parallel.mesh import make_mesh
    from nvimagecodec_tpu.parallel.tiles import dryrun_tile_exchange

    dryrun_tile_exchange(make_mesh(dp=2, sp=4))


def test_sharded_matches_local_seam_smoothing():
    import jax.numpy as jnp

    from nvimagecodec_tpu.parallel.mesh import make_mesh
    from nvimagecodec_tpu.parallel.tiles import smooth_tile_seams

    rng = np.random.default_rng(1)
    tiles = rng.integers(0, 255, (8, 8, 12)).astype(np.int32)
    local = np.asarray(smooth_tile_seams(jnp.asarray(tiles)))
    mesh = make_mesh(dp=1, sp=8)
    sharded = np.asarray(smooth_tile_seams(jnp.asarray(tiles), mesh=mesh))
    np.testing.assert_array_equal(local, sharded)
