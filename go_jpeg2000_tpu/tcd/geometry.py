"""Tile/component/resolution/band/precinct/code-block geometry
(ISO/IEC 15444-1 B.5-B.9).

Structural parity with the reference's tcd package
(/root/reference/internal/tcd/tcd.go:18-390), computed host-side as static
metadata; device code consumes the flat code-block lists for batched
processing.

Coordinate conventions:
- tile-component coords: tcx0 = ceil(tx0 / dx), etc.
- resolution r coords: trx0 = ceil(tcx0 / 2^(NL-r))
- band coords (Equation B-15): tbx0 = ceil((tcx0 - 2^(nb-1) * xob) / 2^nb)
  where nb = decomposition level of the band, (xob, yob) band orientation.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from ..codestream.header import CodingStyle, Header, Quantization, TilePartInfo
from ..ops import quant as quant_ops


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass
class CodeBlock:
    """One code-block within a band's precinct."""
    x0: int  # band coords, clipped to band and precinct
    y0: int
    x1: int
    y1: int
    cbx: int  # index within the precinct's code-block grid
    cby: int

    @property
    def w(self) -> int:
        return self.x1 - self.x0

    @property
    def h(self) -> int:
        return self.y1 - self.y0


@dataclasses.dataclass
class Precinct:
    """Precinct projection onto one band."""
    x0: int  # band coords
    y0: int
    x1: int
    y1: int
    cbw: int   # code-blocks across
    cbh: int
    code_blocks: List[CodeBlock]


@dataclasses.dataclass
class Band:
    name: str              # "LL", "HL", "LH", "HH"
    x0: int                # band coords
    y0: int
    x1: int
    y1: int
    dec_level: int         # nb
    precincts: List[Precinct]
    delta: float = 1.0     # quantization step
    eps: int = 0           # exponent (for Mb)
    gain: int = 0          # log2 band gain (reversible)

    @property
    def w(self) -> int:
        return self.x1 - self.x0

    @property
    def h(self) -> int:
        return self.y1 - self.y0


@dataclasses.dataclass
class Resolution:
    r: int
    x0: int                # resolution coords
    y0: int
    x1: int
    y1: int
    num_px: int            # precincts across
    num_py: int
    ppx: int               # precinct exponent at this resolution
    ppy: int
    cb_w_exp: int          # effective code-block exponents (xcb', ycb')
    cb_h_exp: int
    bands: List[Band]


@dataclasses.dataclass
class TileComponent:
    comp: int
    x0: int                # tile-component coords
    y0: int
    x1: int
    y1: int
    num_resolutions: int
    resolutions: List[Resolution]
    coding: CodingStyle
    quant: Quantization

    @property
    def w(self) -> int:
        return self.x1 - self.x0

    @property
    def h(self) -> int:
        return self.y1 - self.y0


@dataclasses.dataclass
class Tile:
    index: int
    x0: int                # reference grid coords
    y0: int
    x1: int
    y1: int
    comps: List[TileComponent]


BAND_ORIENT = {"LL": (0, 0), "HL": (1, 0), "LH": (0, 1), "HH": (1, 1)}


def band_bounds(tcx0: int, tcy0: int, tcx1: int, tcy1: int, nb: int,
                name: str) -> Tuple[int, int, int, int]:
    """Equation B-15."""
    xob, yob = BAND_ORIENT[name]
    sx = 1 << (nb - 1) if nb else 0
    den = 1 << nb
    bx0 = ceil_div(tcx0 - sx * xob, den)
    by0 = ceil_div(tcy0 - sx * yob, den)
    bx1 = ceil_div(tcx1 - sx * xob, den)
    by1 = ceil_div(tcy1 - sx * yob, den)
    return bx0, by0, bx1, by1


def _build_precincts(bx0: int, by0: int, bx1: int, by1: int,
                     res_x0: int, res_y0: int, res_x1: int, res_y1: int,
                     r: int, ppx: int, ppy: int, cbw_exp: int, cbh_exp: int
                     ) -> List[Precinct]:
    """Project the resolution-grid precinct partition onto one band.

    The precinct grid lives on the *resolution* grid anchored at 0 with size
    2^ppx x 2^ppy; for r > 0 its projection onto each band halves
    (2^(ppx-1) anchored at 0 in band coords).  Every resolution precinct
    contributes exactly one slot per band — possibly with an empty
    intersection — so the list length always equals num_px * num_py.
    """
    if r == 0:
        pw_exp, ph_exp = ppx, ppy
    else:
        pw_exp, ph_exp = ppx - 1, ppy - 1
    pw, ph = 1 << pw_exp, 1 << ph_exp
    cb_w, cb_h = 1 << cbw_exp, 1 << cbh_exp
    mx0 = res_x0 >> ppx
    mx1 = ceil_div(res_x1, 1 << ppx) if res_x1 > res_x0 else mx0
    my0 = res_y0 >> ppy
    my1 = ceil_div(res_y1, 1 << ppy) if res_y1 > res_y0 else my0
    out: List[Precinct] = []
    for my in range(my0, my1):
        for mx in range(mx0, mx1):
            p_x0, p_y0 = max(mx * pw, bx0), max(my * ph, by0)
            p_x1, p_y1 = min((mx + 1) * pw, bx1), min((my + 1) * ph, by1)
            blocks: List[CodeBlock] = []
            if p_x1 > p_x0 and p_y1 > p_y0:
                cgx0 = (p_x0 >> cbw_exp) << cbw_exp
                cgy0 = (p_y0 >> cbh_exp) << cbh_exp
                cbw_n = ceil_div(p_x1 - cgx0, cb_w)
                cbh_n = ceil_div(p_y1 - cgy0, cb_h)
                for cy in range(cbh_n):
                    for cx in range(cbw_n):
                        b_x0 = max(cgx0 + cx * cb_w, p_x0)
                        b_y0 = max(cgy0 + cy * cb_h, p_y0)
                        b_x1 = min(cgx0 + (cx + 1) * cb_w, p_x1)
                        b_y1 = min(cgy0 + (cy + 1) * cb_h, p_y1)
                        blocks.append(CodeBlock(b_x0, b_y0, b_x1, b_y1, cx, cy))
                out.append(Precinct(p_x0, p_y0, p_x1, p_y1, cbw_n, cbh_n, blocks))
            else:
                out.append(Precinct(p_x0, p_y0, p_x0, p_y0, 0, 0, []))
    return out


def build_tile(header: Header, tile_index: int,
               tp: Optional[TilePartInfo] = None) -> Tile:
    """Build the full geometry tree for one tile."""
    tx0, ty0, tx1, ty1 = header.tile_bounds(tile_index)
    comps: List[TileComponent] = []
    for c, ci in enumerate(header.components):
        cs = header.coding_for(c, tp)
        q = header.quant_for(c, tp)
        tcx0 = ceil_div(tx0, ci.dx)
        tcy0 = ceil_div(ty0, ci.dy)
        tcx1 = ceil_div(tx1, ci.dx)
        tcy1 = ceil_div(ty1, ci.dy)
        nl = cs.num_decompositions
        resolutions: List[Resolution] = []
        for r in range(nl + 1):
            shift = nl - r
            rx0 = ceil_div(tcx0, 1 << shift)
            ry0 = ceil_div(tcy0, 1 << shift)
            rx1 = ceil_div(tcx1, 1 << shift)
            ry1 = ceil_div(tcy1, 1 << shift)
            ppx, ppy = cs.precinct_exp(r)
            # effective code-block size (B.7)
            if r == 0:
                cbw_exp = min(cs.cb_width_exp, ppx)
                cbh_exp = min(cs.cb_height_exp, ppy)
            else:
                cbw_exp = min(cs.cb_width_exp, ppx - 1)
                cbh_exp = min(cs.cb_height_exp, ppy - 1)
            # precinct counts on the resolution grid
            if rx1 > rx0:
                num_px = ceil_div(rx1, 1 << ppx) - (rx0 >> ppx)
            else:
                num_px = 0
            if ry1 > ry0:
                num_py = ceil_div(ry1, 1 << ppy) - (ry0 >> ppy)
            else:
                num_py = 0
            band_names = ["LL"] if r == 0 else ["HL", "LH", "HH"]
            nb = nl - r + 1 if r > 0 else nl
            bands: List[Band] = []
            for name in band_names:
                if r == 0:
                    bx0, by0 = ceil_div(tcx0, 1 << nl), ceil_div(tcy0, 1 << nl)
                    bx1, by1 = ceil_div(tcx1, 1 << nl), ceil_div(tcy1, 1 << nl)
                else:
                    bx0, by0, bx1, by1 = band_bounds(tcx0, tcy0, tcx1, tcy1, nb, name)
                precincts = _build_precincts(
                    bx0, by0, bx1, by1, rx0, ry0, rx1, ry1,
                    r, ppx, ppy, cbw_exp, cbh_exp)
                assert len(precincts) == num_px * num_py, \
                    (name, r, len(precincts), num_px, num_py)
                # band precinct count must match the resolution partition
                band = Band(name=name, x0=bx0, y0=by0, x1=bx1, y1=by1,
                            dec_level=nb,
                            precincts=precincts,
                            gain=quant_ops.BAND_GAIN[name],
                            eps=quant_ops.band_eps(q, r, name, nl))
                band.delta = quant_ops.effective_step(
                    q, r, name, nl, ci.precision + quant_ops.BAND_GAIN[name]) \
                    if q.style != 0 else 1.0
                bands.append(band)
            resolutions.append(Resolution(
                r=r, x0=rx0, y0=ry0, x1=rx1, y1=ry1,
                num_px=num_px, num_py=num_py, ppx=ppx, ppy=ppy,
                cb_w_exp=cbw_exp, cb_h_exp=cbh_exp, bands=bands))
        comps.append(TileComponent(
            comp=c, x0=tcx0, y0=tcy0, x1=tcx1, y1=tcy1,
            num_resolutions=nl + 1, resolutions=resolutions,
            coding=cs, quant=q))
    return Tile(index=tile_index, x0=tx0, y0=ty0, x1=tx1, y1=ty1, comps=comps)


def num_precincts(res: Resolution) -> int:
    return res.num_px * res.num_py
