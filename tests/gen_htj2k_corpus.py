"""Generate the HTJ2K conformance corpus (tests/_corpus/htj2k/).

The streams are committed to git (exempted from the tests/_corpus/
gitignore) so the decoder is pinned against *fixed* bitstreams — a
decoder regression cannot silently co-evolve with an encoder change.
This script exists to document how they were produced and to
regenerate them deliberately (run it directly) if the format of the
corpus itself must change.

Reference analog: nvjpeg2k decodes HTJ2K natively
(extensions/nvjpeg2k/cuda_decoder.cpp:178; README.md:38); the
conformance oracle for these streams is system openjpeg 2.5
(tests/test_htj2k.py::test_corpus_matches_openjpeg).
"""
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))

CORPUS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_corpus", "htj2k")


def generate(dest: str = CORPUS) -> None:
    from util import make_photo

    from nvimagecodec_tpu.codecs.jpeg2000.core import encode_j2k

    os.makedirs(dest, exist_ok=True)
    photo = make_photo(93, 141, seed=11)
    gray = make_photo(77, 101, seed=12, channels=1)
    rng = np.random.default_rng(13)
    base = make_photo(58, 84, seed=13, channels=1).astype(np.uint16)
    u16 = (base << 8) | rng.integers(0, 256, base.shape).astype(np.uint16)

    np.savez(os.path.join(dest, "originals.npz"),
             photo=photo, gray=gray, u16=u16)

    def put(name, data):
        with open(os.path.join(dest, name), "wb") as f:
            f.write(data)

    put("photo_lossless.jp2",
        encode_j2k(photo, reversible=True, ht=True, levels=3))
    put("photo_lossless_tiles.j2k",
        encode_j2k(photo[:64, :128], reversible=True, ht=True, levels=2,
                   tile_size=64, stream_type="j2k"))
    put("gray_lossless.j2k",
        encode_j2k(gray, reversible=True, ht=True, levels=3,
                   stream_type="j2k"))
    put("u16_lossless.jp2",
        encode_j2k(u16, reversible=True, ht=True, levels=2))
    put("photo_layers_rpcl.jp2",
        encode_j2k(photo, reversible=True, ht=True, levels=3, num_layers=4,
                   prog_order="RPCL"))
    put("photo_precincts.j2k",
        encode_j2k(photo, reversible=True, ht=True, levels=2,
                   precincts=(5, 5), prog_order="RPCL", stream_type="j2k"))
    # Z=3 stream: cleanup at p=1 + SigProp + MagRef refinement passes
    put("photo_z3_passes.jp2",
        encode_j2k(photo, reversible=True, ht=3, levels=3))
    put("photo_irrev_q90.jp2",
        encode_j2k(photo, reversible=False, quality=90, ht=True, levels=3))


if __name__ == "__main__":
    generate()
    print(f"wrote HTJ2K corpus to {CORPUS}")
