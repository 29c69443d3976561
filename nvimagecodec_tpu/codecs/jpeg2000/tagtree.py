"""Tag trees (ITU-T T.800 B.10.2): 2-D hierarchical minimum coding used by
JPEG2000 packet headers for code-block inclusion and zero-bitplane counts.
Written from the spec; no reference code used."""
from __future__ import annotations

from typing import List


class TagTree:
    """Quad-tree over a w×h grid of leaves; codes per-leaf values as
    increments relative to the minimum of each parent node."""

    def __init__(self, w: int, h: int):
        self.w = w
        self.h = h
        # level 0 = leaves; each next level halves (ceil) until 1x1
        self.levels: List[tuple] = []
        lw, lh = w, h
        while True:
            self.levels.append((lw, lh))
            if lw == 1 and lh == 1:
                break
            lw = (lw + 1) // 2
            lh = (lh + 1) // 2
        n = sum(lw * lh for lw, lh in self.levels)
        self.value = [0] * n      # encoder: node value (min of children)
        self.low = [0] * n        # coding state: lower bound known so far
        self.coded = [False] * n  # fully coded flag

    def _index(self, level: int, x: int, y: int) -> int:
        off = 0
        for l in range(level):
            lw, lh = self.levels[l]
            off += lw * lh
        lw, _ = self.levels[level]
        return off + y * lw + x

    def reset(self) -> None:
        self.low = [0] * len(self.low)
        self.coded = [False] * len(self.coded)

    # -- encoder side -------------------------------------------------------
    def set_values(self, leaves: List[int]) -> None:
        """leaves: w*h values in raster order; builds internal minima."""
        assert len(leaves) == self.w * self.h
        vals = list(leaves)
        pos = 0
        prev = vals
        self.value[0 : self.w * self.h] = vals
        for level in range(1, len(self.levels)):
            pw, ph = self.levels[level - 1]
            lw, lh = self.levels[level]
            cur = [0] * (lw * lh)
            for y in range(lh):
                for x in range(lw):
                    best = None
                    for dy in range(2):
                        for dx in range(2):
                            cx, cy = 2 * x + dx, 2 * y + dy
                            if cx < pw and cy < ph:
                                v = prev[cy * pw + cx]
                                best = v if best is None else min(best, v)
                    cur[y * lw + x] = best if best is not None else 0
            off = self._index(level, 0, 0)
            self.value[off : off + lw * lh] = cur
            prev = cur
        self.reset()

    def encode(self, bw, x: int, y: int, threshold: int) -> None:
        """Emit bits so the decoder learns whether leaf (x,y) < threshold
        (and its exact value once reached)."""
        # path from root down to leaf
        path = []
        lx, ly = x, y
        for level in range(len(self.levels)):
            path.append((level, lx, ly))
            lx //= 2
            ly //= 2
        path.reverse()  # root first
        low = 0
        for level, lx, ly in path:
            i = self._index(level, lx, ly)
            if self.low[i] < low:
                self.low[i] = low
            v = self.value[i]
            while not self.coded[i] and self.low[i] < threshold:
                if self.low[i] == v:
                    self.coded[i] = True
                    bw.put_bit(1)
                else:
                    bw.put_bit(0)
                    self.low[i] += 1
            low = max(self.low[i], v if self.coded[i] else self.low[i])

    # -- decoder side -------------------------------------------------------
    def decode(self, br, x: int, y: int, threshold: int) -> bool:
        """Returns True iff leaf value < threshold; consumes bits
        symmetrically to encode()."""
        path = []
        lx, ly = x, y
        for level in range(len(self.levels)):
            path.append((level, lx, ly))
            lx //= 2
            ly //= 2
        path.reverse()
        low = 0
        for level, lx, ly in path:
            i = self._index(level, lx, ly)
            if self.low[i] < low:
                self.low[i] = low
            while not self.coded[i] and self.low[i] < threshold:
                if br.get_bit():
                    self.coded[i] = True
                else:
                    self.low[i] += 1
            low = self.low[i]
        # leaf decided below threshold only if its node was fully coded
        i = self._index(0, x, y)
        return self.coded[i] and self.low[i] < threshold

    def leaf_value(self, x: int, y: int) -> int:
        """Decoder: exact value of a fully-coded leaf."""
        return self.low[self._index(0, x, y)]
