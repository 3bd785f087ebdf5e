"""2-D tag trees (ISO/IEC 15444-1 B.10.2) — the standard quad-tree coding.

The reference's tag-tree bit coding is a simplified unary scheme
(/root/reference/internal/tcd/t2.go:368-376) and NOT conformant; this is the
real algorithm (OpenJPEG-interoperable), used for code-block inclusion and
zero-bitplane signalling in packet headers.
"""
from __future__ import annotations

from typing import List

from ..utils.bio import BitReader, BitWriter

_INF = 999999999


class _Node:
    __slots__ = ("value", "low", "known", "parent")

    def __init__(self):
        self.value = _INF
        self.low = 0
        self.known = False
        self.parent: int = -1


class TagTree:
    """Tag tree over a w x h leaf grid."""

    def __init__(self, w: int, h: int):
        if w <= 0 or h <= 0:
            raise ValueError("tag tree dimensions must be positive")
        self.w = w
        self.h = h
        # build level sizes from leaves up to the 1x1 root
        sizes = [(w, h)]
        while sizes[-1] != (1, 1):
            lw, lh = sizes[-1]
            sizes.append(((lw + 1) // 2, (lh + 1) // 2))
        self.level_offsets: List[int] = []
        off = 0
        for lw, lh in sizes:
            self.level_offsets.append(off)
            off += lw * lh
        self.nodes = [_Node() for _ in range(off)]
        # wire parents
        for lev in range(len(sizes) - 1):
            lw, lh = sizes[lev]
            pw, _ = sizes[lev + 1]
            for y in range(lh):
                for x in range(lw):
                    child = self.level_offsets[lev] + y * lw + x
                    parent = self.level_offsets[lev + 1] + (y // 2) * pw + (x // 2)
                    self.nodes[child].parent = parent

    def reset(self) -> None:
        for n in self.nodes:
            n.value = _INF
            n.low = 0
            n.known = False

    def set_value(self, x: int, y: int, value: int) -> None:
        """Set a leaf value and propagate the min up the tree."""
        idx = y * self.w + x
        n = self.nodes[idx]
        n.value = value
        while n.parent >= 0:
            p = self.nodes[n.parent]
            if value < p.value:
                p.value = value
                n = p
            else:
                break

    def _path(self, x: int, y: int) -> List[_Node]:
        """Nodes from root down to the leaf (x, y)."""
        path = []
        idx = y * self.w + x
        n = self.nodes[idx]
        path.append(n)
        while n.parent >= 0:
            n = self.nodes[n.parent]
            path.append(n)
        path.reverse()
        return path

    def encode(self, bw: BitWriter, x: int, y: int, threshold: int) -> None:
        """Encode whether leaf value >= threshold, with shared-ancestor reuse."""
        low = 0
        for node in self._path(x, y):
            if low < node.low:
                low = node.low
            while low < threshold:
                if low >= node.value:
                    if not node.known:
                        bw.write_bit(1)
                        node.known = True
                    break
                bw.write_bit(0)
                low += 1
            node.low = low
            if low >= threshold:
                break

    def decode(self, br: BitReader, x: int, y: int, threshold: int) -> bool:
        """Returns True iff leaf value < threshold (fully determined)."""
        low = 0
        leaf = None
        for node in self._path(x, y):
            leaf = node
            if low < node.low:
                low = node.low
            while low < threshold and low < node.value:
                if br.read_bit():
                    node.value = low
                    node.known = True
                else:
                    low += 1
            node.low = low
            if low >= threshold:
                break
        return leaf.value < threshold

    def leaf_value(self, x: int, y: int) -> int:
        return self.nodes[y * self.w + x].value
