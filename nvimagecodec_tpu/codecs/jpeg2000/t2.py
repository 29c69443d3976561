"""JPEG2000 Tier-2: packet header coding (ITU-T T.800 B.9-B.10).

One precinct per resolution (no precinct partitions), so each packet covers
every code-block of one (layer, resolution, component). Handles all five
progression orders on read and write; the encoder emits single-layer LRCP.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from .codestream import (
    CodingParams,
    HeaderBitReader,
    HeaderBitWriter,
    Resolution,
    SizInfo,
    cblk_grid,
)
from .tagtree import TagTree


@dataclass
class CblkState:
    """Accumulated decode state of one code-block across layers."""

    x0: int
    y0: int
    x1: int
    y1: int
    included: bool = False
    zero_bps: int = 0
    num_passes: int = 0
    lblock: int = 3
    segments: List[bytes] = field(default_factory=list)


@dataclass
class PrecinctState:
    incl: TagTree
    zbp: TagTree
    nx: int
    ny: int
    cblks: List[CblkState] = field(default_factory=list)


def _npasses_write(bw: HeaderBitWriter, n: int) -> None:
    if n == 1:
        bw.put_bit(0)
    elif n == 2:
        bw.put_bits(0b10, 2)
    elif n <= 5:
        bw.put_bits(0b11, 2)
        bw.put_bits(n - 3, 2)
    elif n <= 36:
        bw.put_bits(0b1111, 4)
        bw.put_bits(n - 6, 5)
    else:
        bw.put_bits(0b111111111, 9)
        bw.put_bits(n - 37, 7)


def _npasses_read(br: HeaderBitReader) -> int:
    if not br.get_bit():
        return 1
    if not br.get_bit():
        return 2
    v = br.get_bits(2)
    if v < 3:
        return 3 + v
    v = br.get_bits(5)
    if v < 31:
        return 6 + v
    return 37 + br.get_bits(7)


def _floor_log2(n: int) -> int:
    return n.bit_length() - 1


class PacketDecoder:
    """Decodes the packet sequence of one tile into per-codeblock segment
    lists."""

    def __init__(self, siz: SizInfo, cp: CodingParams, resolutions: Dict[int, List[Resolution]]):
        self.siz = siz
        self.cp = cp
        self.resolutions = resolutions  # comp -> [Resolution]
        # state per (comp, res, band-position)
        self.state: Dict[Tuple[int, int, int], PrecinctState] = {}
        for c, res_list in resolutions.items():
            for res in res_list:
                for bi, band in enumerate(res.bands):
                    nx, ny, blocks = cblk_grid(band, cp.cblk_w, cp.cblk_h)
                    ps = PrecinctState(
                        TagTree(max(nx, 1), max(ny, 1)),
                        TagTree(max(nx, 1), max(ny, 1)),
                        nx, ny,
                        [CblkState(*b) for b in blocks],
                    )
                    self.state[(c, res.r, bi)] = ps

    def read_packet(self, br: HeaderBitReader, c: int, r: int, layer: int) -> None:
        if not br.get_bit():  # empty packet
            br.align()
            return
        res = self.resolutions[c][r]
        body_reads: List[Tuple[CblkState, int]] = []
        for bi, band in enumerate(res.bands):
            ps = self.state[(c, r, bi)]
            for idx, cb in enumerate(ps.cblks):
                x, y = idx % max(ps.nx, 1), idx // max(ps.nx, 1)
                if not cb.included:
                    inc = ps.incl.decode(br, x, y, layer + 1)
                else:
                    inc = bool(br.get_bit())
                if not inc:
                    continue
                if not cb.included:
                    # zero bitplanes: raise threshold until resolved
                    # (bounded — exhausted data reads as zeros and would
                    # otherwise chase the threshold forever)
                    k = 1
                    while not ps.zbp.decode(br, x, y, k):
                        k += 1
                        if k > 64:
                            raise ValueError("J2K: runaway zero-bitplane tree")
                    cb.zero_bps = ps.zbp.leaf_value(x, y)
                    cb.included = True
                npasses = _npasses_read(br)
                # length-indicator increments (bounded: corrupted headers
                # must not spin or produce absurd lengths)
                while br.get_bit():
                    cb.lblock += 1
                    if cb.lblock > 32:
                        raise ValueError("J2K: runaway Lblock")
                nbits = cb.lblock + _floor_log2(npasses)
                if nbits > 32:
                    raise ValueError("J2K: absurd segment length field")
                seg_len = br.get_bits(nbits)
                cb.num_passes += npasses
                body_reads.append((cb, seg_len))
        br.align()
        for cb, seg_len in body_reads:
            if br.pos + seg_len > len(br.data):
                raise ValueError("J2K: packet body past end of tile data")
            cb.segments.append(br.data[br.pos : br.pos + seg_len])
            br.pos += seg_len


class PacketEncoder:
    """Single-layer packet writer (encoder side)."""

    def __init__(self, siz: SizInfo, cp: CodingParams):
        self.siz = siz
        self.cp = cp

    def write_packet(
        self,
        res: Resolution,
        cblk_data: List[List[Tuple[bytes, int, int]]],
    ) -> bytes:
        """cblk_data[band_i] = [(segment, num_passes, zero_bps)] in raster
        order for every code-block of the band."""
        bw = HeaderBitWriter()
        any_data = any(
            seg and npass > 0
            for band in cblk_data
            for (seg, npass, _z) in band
        )
        if not any_data:
            bw.put_bit(0)
            return bw.flush()
        bw.put_bit(1)
        bodies: List[bytes] = []
        for bi, band in enumerate(res.bands):
            blocks = cblk_data[bi]
            if not blocks:
                continue
            nx, ny, _ = cblk_grid(band, self.cp.cblk_w, self.cp.cblk_h)
            incl = TagTree(max(nx, 1), max(ny, 1))
            zbp = TagTree(max(nx, 1), max(ny, 1))
            incl.set_values([0 if b[0] or b[1] else 1 for b in blocks])
            zbp.set_values([b[2] for b in blocks])
            for idx, (seg, npasses, zero_bps) in enumerate(blocks):
                x, y = idx % max(nx, 1), idx // max(nx, 1)
                included = bool(seg) or npasses > 0
                incl.encode(bw, x, y, 1)
                if not included:
                    continue
                k = 1
                # emit zbp tag tree up to resolution of this leaf
                while True:
                    zbp.encode(bw, x, y, k)
                    if zbp.coded[zbp._index(0, x, y)]:
                        break
                    k += 1
                _npasses_write(bw, npasses)
                lblock = 3
                nbits_needed = max(1, len(seg)).bit_length()
                while lblock + _floor_log2(npasses) < nbits_needed:
                    bw.put_bit(1)
                    lblock += 1
                bw.put_bit(0)
                bw.put_bits(len(seg), lblock + _floor_log2(npasses))
                bodies.append(seg)
        header = bw.flush()
        return header + b"".join(bodies)
