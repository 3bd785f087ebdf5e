"""Parsed codestream header model (SIZ/COD/COC/QCD/QCC/POC/CAP/...).

Model parity with the reference's header state
(/root/reference/internal/codestream/header.go:8-301), expressed as
dataclasses.  All coordinates follow ISO/IEC 15444-1 Annex B's reference-grid
conventions.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

from ..utils import markers as mk


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass
class ComponentInfo:
    """Per-component SIZ data (Ssiz, XRsiz, YRsiz)."""
    ssiz: int = 7           # precision-1 | (signed << 7)
    dx: int = 1             # XRsiz subsampling
    dy: int = 1             # YRsiz subsampling

    @property
    def precision(self) -> int:
        return (self.ssiz & 0x7F) + 1

    @property
    def signed(self) -> bool:
        return bool(self.ssiz & 0x80)

    @staticmethod
    def make(precision: int, signed: bool = False, dx: int = 1, dy: int = 1) -> "ComponentInfo":
        return ComponentInfo(ssiz=(precision - 1) | (0x80 if signed else 0), dx=dx, dy=dy)


@dataclasses.dataclass
class CodingStyle:
    """COD/COC contents (Table A.12-A.21)."""
    # Scod flags (COD only)
    scod: int = 0
    progression_order: int = 0
    num_layers: int = 1
    mct: int = 0                      # SGcod MCT: 0 none, 1 RCT/ICT
    num_decompositions: int = 5      # SPcod: NL
    cb_width_exp: int = 6            # xcb (true log2 width; wire value is xcb-2)
    cb_height_exp: int = 6           # ycb
    cb_style: int = 0                # Table A.19 flags
    transform: int = 0               # 0 = 9/7 irreversible, 1 = 5/3 reversible
    # Precinct sizes, one (PPx, PPy) log2 pair per resolution level 0..NL.
    # Empty => maximal precincts (15, 15).
    precincts: List[Tuple[int, int]] = dataclasses.field(default_factory=list)

    @property
    def has_sop(self) -> bool:
        return bool(self.scod & mk.SCOD_SOP)

    @property
    def has_eph(self) -> bool:
        return bool(self.scod & mk.SCOD_EPH)

    @property
    def user_precincts(self) -> bool:
        return bool(self.scod & mk.SCOD_PRECINCTS_DEFINED)

    def precinct_exp(self, res: int) -> Tuple[int, int]:
        if not self.precincts:
            return (15, 15)
        if res < len(self.precincts):
            return self.precincts[res]
        return self.precincts[-1]


@dataclasses.dataclass
class StepSize:
    """Quantization step (Eb exponent, mu_b mantissa) — Table A.29."""
    mantissa: int = 0    # 11 bits
    exponent: int = 0    # 5 bits

    def value(self, dynamic_range_bits: int) -> float:
        """Delta_b = 2^(Rb - eps_b) * (1 + mu_b / 2^11)   (Equation E-3)."""
        return (2.0 ** (dynamic_range_bits - self.exponent)) * (1.0 + self.mantissa / 2048.0)

    @staticmethod
    def from_delta(delta: float, dynamic_range_bits: int) -> "StepSize":
        """Inverse of :meth:`value`: pick (eps, mu) encoding >= closest step."""
        if delta <= 0:
            raise ValueError("step size must be positive")
        # delta = 2^(R-eps) * (1 + mu/2048), 1 <= (1+mu/2048) < 2
        e = math.floor(math.log2(delta))
        frac = delta / (2.0 ** e)  # in [1, 2)
        mu = int(round((frac - 1.0) * 2048.0))
        if mu >= 2048:
            mu = 0
            e += 1
        eps = dynamic_range_bits - e
        eps = max(0, min(31, eps))
        return StepSize(mantissa=mu, exponent=eps)


@dataclasses.dataclass
class Quantization:
    """QCD/QCC contents (Table A.27-A.30)."""
    style: int = mk.QUANT_NONE        # Sqcd & 0x1F
    guard_bits: int = 2               # Sqcd >> 5
    step_sizes: List[StepSize] = dataclasses.field(default_factory=list)

    def step_for_band(self, res: int, band_idx_in_res: int) -> StepSize:
        """Band order of signalled steps: LL, then (HL, LH, HH) per level.

        res = 0 -> LL (index 0); res >= 1 -> index 3*(res-1) + band + 1
        where band is 0=HL, 1=LH, 2=HH.

        For derived quantization only the LL step is signalled; the caller
        scales by 2^(nominal decomposition difference) per Equation E-5.
        """
        if res == 0:
            return self.step_sizes[0]
        idx = 3 * (res - 1) + band_idx_in_res + 1
        if idx < len(self.step_sizes):
            return self.step_sizes[idx]
        return self.step_sizes[-1]


@dataclasses.dataclass
class ProgressionChange:
    """One POC entry (Table A.32)."""
    res_start: int = 0
    comp_start: int = 0
    layer_end: int = 0
    res_end: int = 0
    comp_end: int = 0
    progression_order: int = 0


@dataclasses.dataclass
class Capabilities:
    """CAP marker (Part 15 signalling)."""
    pcap: int = 0
    ccap: List[int] = dataclasses.field(default_factory=list)

    @property
    def is_htj2k(self) -> bool:
        return bool(self.pcap & mk.pcap_bit(15))


@dataclasses.dataclass
class TilePartInfo:
    """SOT contents plus tile-part-local marker overrides."""
    tile_index: int = 0
    tile_part_length: int = 0
    tile_part_index: int = 0
    num_tile_parts: int = 0
    coding_style: Optional[CodingStyle] = None
    comp_coding: Dict[int, CodingStyle] = dataclasses.field(default_factory=dict)
    quantization: Optional[Quantization] = None
    comp_quant: Dict[int, Quantization] = dataclasses.field(default_factory=dict)
    poc: List[ProgressionChange] = dataclasses.field(default_factory=list)
    packed_headers: bytes = b""
    packet_lengths: List[int] = dataclasses.field(default_factory=list)
    order: int = 0               # global tile-part index in codestream order
    # byte offset (within codestream) of the first byte after SOD
    data_start: int = 0
    data_end: int = 0


@dataclasses.dataclass
class Header:
    """Main codestream header state."""
    # SIZ
    profile: int = 0            # Rsiz
    width: int = 0              # Xsiz
    height: int = 0             # Ysiz
    x_offset: int = 0           # XOsiz
    y_offset: int = 0           # YOsiz
    tile_width: int = 0         # XTsiz
    tile_height: int = 0        # YTsiz
    tile_x_offset: int = 0      # XTOsiz
    tile_y_offset: int = 0      # YTOsiz
    components: List[ComponentInfo] = dataclasses.field(default_factory=list)
    # COD / COC
    coding_style: CodingStyle = dataclasses.field(default_factory=CodingStyle)
    comp_coding: Dict[int, CodingStyle] = dataclasses.field(default_factory=dict)
    # QCD / QCC
    quantization: Quantization = dataclasses.field(default_factory=Quantization)
    comp_quant: Dict[int, Quantization] = dataclasses.field(default_factory=dict)
    # POC / CAP / COM / pointer markers
    poc: List[ProgressionChange] = dataclasses.field(default_factory=list)
    capabilities: Optional[Capabilities] = None
    comments: List[str] = dataclasses.field(default_factory=list)
    tlm: List[Tuple[int, int]] = dataclasses.field(default_factory=list)
    ppm: bytes = b""
    # PLM (A.7.2): packet lengths from the main header, in order
    plm: List[int] = dataclasses.field(default_factory=list)
    # CRG (A.9.1): per-component registration offsets (Xcrg, Ycrg) in
    # units of 1/65536 of the sample grid
    crg: List[Tuple[int, int]] = dataclasses.field(default_factory=list)

    def ppm_chunks(self):
        """Split the concatenated PPM payload into per-tile-part chunks
        (each prefixed by a 4-byte Nppm length, A.7.4)."""
        chunks, i = [], 0
        while i + 4 <= len(self.ppm):
            n = int.from_bytes(self.ppm[i:i + 4], "big")
            i += 4
            chunks.append(self.ppm[i:i + n])
            i += n
        return chunks

    @property
    def num_components(self) -> int:
        return len(self.components)

    @property
    def num_tiles_x(self) -> int:
        return ceil_div(self.width - self.tile_x_offset, self.tile_width)

    @property
    def num_tiles_y(self) -> int:
        return ceil_div(self.height - self.tile_y_offset, self.tile_height)

    @property
    def num_tiles(self) -> int:
        return self.num_tiles_x * self.num_tiles_y

    @property
    def is_htj2k(self) -> bool:
        """HTJ2K detection: CAP Pcap bit 15 or CBSTYLE_HT in any COD/COC
        (reference parity: header.go:241-258)."""
        if self.capabilities is not None and self.capabilities.is_htj2k:
            return True
        if self.coding_style.cb_style & mk.CBSTYLE_HT:
            return True
        return any(c.cb_style & mk.CBSTYLE_HT for c in self.comp_coding.values())

    def coding_for(self, comp: int, tp: Optional[TilePartInfo] = None) -> CodingStyle:
        """Coding style for a component, applying COC > COD precedence and
        tile-part overrides (tile COC > tile COD > main COC > main COD)."""
        if tp is not None:
            if comp in tp.comp_coding:
                return tp.comp_coding[comp]
            if tp.coding_style is not None:
                return tp.coding_style
        if comp in self.comp_coding:
            return self.comp_coding[comp]
        return self.coding_style

    def quant_for(self, comp: int, tp: Optional[TilePartInfo] = None) -> Quantization:
        if tp is not None:
            if comp in tp.comp_quant:
                return tp.comp_quant[comp]
            if tp.quantization is not None:
                return tp.quantization
        if comp in self.comp_quant:
            return self.comp_quant[comp]
        return self.quantization

    def tile_bounds(self, t: int) -> Tuple[int, int, int, int]:
        """(tx0, ty0, tx1, ty1) of tile t on the reference grid (B.3)."""
        p = t % self.num_tiles_x
        q = t // self.num_tiles_x
        tx0 = max(self.tile_x_offset + p * self.tile_width, self.x_offset)
        ty0 = max(self.tile_y_offset + q * self.tile_height, self.y_offset)
        tx1 = min(self.tile_x_offset + (p + 1) * self.tile_width, self.width)
        ty1 = min(self.tile_y_offset + (q + 1) * self.tile_height, self.height)
        return tx0, ty0, tx1, ty1

    def validate(self) -> None:
        if self.width <= self.x_offset or self.height <= self.y_offset:
            raise ValueError(f"invalid image dimensions {self.width}x{self.height} "
                             f"with offset ({self.x_offset},{self.y_offset})")
        if self.tile_width == 0 or self.tile_height == 0:
            raise ValueError("invalid tile dimensions")
        if not (1 <= self.num_components <= 16384):
            raise ValueError(f"invalid number of components: {self.num_components}")
        if self.tile_x_offset > self.x_offset or self.tile_y_offset > self.y_offset:
            raise ValueError("tile offset must not exceed image offset")
        for i, c in enumerate(self.components):
            if c.dx == 0 or c.dy == 0:
                raise ValueError(f"component {i}: invalid subsampling {c.dx}x{c.dy}")
            if not (1 <= c.precision <= 38):
                raise ValueError(f"component {i}: invalid precision {c.precision}")
        if not self.quantization.step_sizes:
            # QCD is mandatory in the main header (A.6.4); a stream whose
            # QCD was corrupted into an unknown (skipped) marker would
            # otherwise IndexError deep in geometry (r4 mutation sweep)
            raise ValueError("missing or empty QCD quantization marker")
