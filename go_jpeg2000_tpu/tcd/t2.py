"""Tier-2: packet header coding and progression-order iteration
(ISO/IEC 15444-1 B.9-B.12).

Functional parity with the reference's t2
(/root/reference/internal/tcd/t2.go) but fully conformant where the
reference is simplified: standard tag-tree inclusion/IMSB coding (vs its
unary code, t2.go:368-376) and standard Lblock length coding (vs its 3-bit
count scheme, t2.go:408-429).  All five progression orders.
"""
from __future__ import annotations

import dataclasses
import struct
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

from ..codestream.header import CodingStyle, Header
from ..utils import markers as mk
from ..utils.bio import BitReader, BitWriter
from .geometry import Band, Precinct, Resolution, Tile, TileComponent
from .tagtree import TagTree


# --------------------------------------------------------------- block state

@dataclasses.dataclass
class BlockLayerData:
    """One code-block's contribution to one packet."""
    num_passes: int
    chunks: List[Tuple[int, int]]    # (npasses, nbytes) per codeword chunk
    data: bytes


@dataclasses.dataclass
class EncBlock:
    """Encoder-side persistent code-block state across layers."""
    zero_bitplanes: int
    num_passes_total: int
    pass_rates: List[int]            # cumulative codeword bytes per pass
    pass_terminated: List[bool]
    data: bytes
    layer_passes: List[int]          # passes assigned to each layer
    cb_style: int = 0
    # running state
    included_layer: int = -1         # first layer with passes (-1 if never)
    lblock: int = 3
    passes_done: int = 0

    def first_layer(self) -> int:
        for l, n in enumerate(self.layer_passes):
            if n > 0:
                return l
        return len(self.layer_passes)


@dataclasses.dataclass
class DecBlock:
    """Decoder-side persistent code-block state."""
    zero_bitplanes: int = 0
    included: bool = False
    lblock: int = 3
    passes_done: int = 0
    data: bytearray = dataclasses.field(default_factory=bytearray)
    segment_lengths: List[int] = dataclasses.field(default_factory=list)
    open_segment_bytes: int = 0      # bytes of the not-yet-terminated segment
    # quality-layer checkpoint (state at the last decoded layer <= limit)
    keep_passes: int = 0
    keep_bytes: int = 0
    keep_segments: List[int] = dataclasses.field(default_factory=list)


# ------------------------------------------------------ segment chunk helper

def segment_chunks(start_pass: int, n_new: int, cb_style: int,
                   total_passes: Optional[int] = None) -> List[Tuple[int, bool]]:
    """Split `n_new` passes starting at index `start_pass` into codeword
    chunks: [(npasses, ends_segment)].  A chunk ends a segment when its last
    pass is a termination point under the block's mode flags."""
    if cb_style & mk.CBSTYLE_HT:
        # HT sets: the cleanup pass (index 0) always ends its codeword
        # segment; SigProp (1) + MagRef (2) share the refinement segment,
        # closed after MagRef (reference bitstream layout ht.go:521-580).
        out = []
        run = 0
        for i in range(start_pass, start_pass + n_new):
            run += 1
            term = i == 0 or i == 2
            if total_passes is not None and i == total_passes - 1:
                term = True
            if term:
                out.append((run, True))
                run = 0
        if run:
            out.append((run, False))
        return out
    termall = bool(cb_style & mk.CBSTYLE_TERMALL)
    lazy = bool(cb_style & mk.CBSTYLE_LAZY)
    out: List[Tuple[int, bool]] = []
    run = 0
    for i in range(start_pass, start_pass + n_new):
        run += 1
        term = False
        if termall:
            term = True
        elif lazy:
            nxt = i + 1
            if nxt >= 10:
                term = _is_raw(i, True) != _is_raw(nxt, True)
        if total_passes is not None and i == total_passes - 1:
            term = True
        if term:
            out.append((run, True))
            run = 0
    if run:
        out.append((run, False))
    return out


def _is_raw(pass_idx: int, lazy: bool) -> bool:
    if not lazy or pass_idx < 10:
        return False
    return (pass_idx - 1) % 3 in (0, 1)


def _floor_log2(x: int) -> int:
    return x.bit_length() - 1 if x > 0 else 0


# ------------------------------------------------------------ packet encoder

class PrecinctEncoder:
    """Per-precinct persistent tag trees + block states (one band may have
    several precincts; this wraps one precinct of one band)."""

    def __init__(self, precinct: Precinct, blocks: List[EncBlock]):
        self.precinct = precinct
        self.blocks = blocks
        if precinct.cbw and precinct.cbh:
            self.incl_tree = TagTree(precinct.cbw, precinct.cbh)
            self.imsb_tree = TagTree(precinct.cbw, precinct.cbh)
            for b, blk in zip(precinct.code_blocks, blocks):
                self.incl_tree.set_value(b.cbx, b.cby, blk.first_layer())
                self.imsb_tree.set_value(b.cbx, b.cby, blk.zero_bitplanes)
        else:
            self.incl_tree = None
            self.imsb_tree = None


def encode_packet_header(bw: BitWriter, band_precincts: List[PrecinctEncoder],
                         layer: int) -> List[bytes]:
    """Encode one packet's header into `bw`; returns body byte chunks."""
    body: List[bytes] = []
    any_data = any(
        blk.layer_passes[layer] > 0
        for pe in band_precincts for blk in pe.blocks)
    if not any_data:
        bw.write_bit(0)
        return body
    bw.write_bit(1)
    for pe in band_precincts:
        for cb, blk in zip(pe.precinct.code_blocks, pe.blocks):
            n_new = blk.layer_passes[layer]
            first_layer = blk.first_layer()
            if blk.included_layer < 0:
                pe.incl_tree.encode(bw, cb.cbx, cb.cby, layer + 1)
            else:
                bw.write_bit(1 if n_new > 0 else 0)
            if n_new == 0:
                continue
            if blk.included_layer < 0:
                # first inclusion: fully signal zero bitplanes
                pe.imsb_tree.encode(bw, cb.cbx, cb.cby, blk.zero_bitplanes + 1)
                blk.included_layer = layer
            _encode_num_passes(bw, n_new)
            # length coding
            chunks = segment_chunks(blk.passes_done, n_new, blk.cb_style,
                                    blk.num_passes_total)
            lengths: List[Tuple[int, int]] = []
            p = blk.passes_done
            prev_rate = blk.pass_rates[p - 1] if p > 0 else 0
            for npasses, _ends in chunks:
                p += npasses
                rate = blk.pass_rates[p - 1]
                lengths.append((npasses, rate - prev_rate))
                prev_rate = rate
            # pick lblock increment so every length fits
            k = blk.lblock
            for npasses, nbytes in lengths:
                need = max(1, nbytes.bit_length()) - _floor_log2(npasses)
                if need > k:
                    k = need
            for _ in range(k - blk.lblock):
                bw.write_bit(1)
            bw.write_bit(0)
            blk.lblock = k
            for npasses, nbytes in lengths:
                bw.write_bits(nbytes, k + _floor_log2(npasses))
            start = blk.pass_rates[blk.passes_done - 1] if blk.passes_done else 0
            end = blk.pass_rates[blk.passes_done + n_new - 1]
            body.append(blk.data[start:end])
            blk.passes_done += n_new
    return body


def _encode_num_passes(bw: BitWriter, n: int) -> None:
    """Table B.4."""
    if n == 1:
        bw.write_bit(0)
    elif n == 2:
        bw.write_bits(0b10, 2)
    elif n <= 5:
        bw.write_bits(0b11, 2)
        bw.write_bits(n - 3, 2)
    elif n <= 36:
        bw.write_bits(0b11, 2)
        bw.write_bits(0b11, 2)
        bw.write_bits(n - 6, 5)
    elif n <= 164:
        bw.write_bits(0b11, 2)
        bw.write_bits(0b11, 2)
        bw.write_bits(0b11111, 5)
        bw.write_bits(n - 37, 7)
    else:
        raise ValueError(f"cannot signal {n} passes")


def _decode_num_passes(br: BitReader) -> int:
    if br.read_bit() == 0:
        return 1
    if br.read_bit() == 0:
        return 2
    v = br.read_bits(2)
    if v < 3:
        return 3 + v
    v = br.read_bits(5)
    if v < 31:
        return 6 + v
    return 37 + br.read_bits(7)


# ------------------------------------------------------------ packet decoder

class PrecinctDecoder:
    def __init__(self, precinct: Precinct):
        self.precinct = precinct
        if precinct.cbw and precinct.cbh:
            self.incl_tree = TagTree(precinct.cbw, precinct.cbh)
            self.imsb_tree = TagTree(precinct.cbw, precinct.cbh)
        else:
            self.incl_tree = None
            self.imsb_tree = None
        self.blocks = [DecBlock() for _ in precinct.code_blocks]


def decode_packet_header(br: BitReader, band_precincts: List[PrecinctDecoder],
                         layer: int, cb_style: int
                         ) -> List[Tuple[DecBlock, int, List[Tuple[int, int]]]]:
    """Decode one packet header; returns per-included-block
    (block, n_new_passes, [(npasses, nbytes) chunks]) in body order."""
    out: List[Tuple[DecBlock, int, List[Tuple[int, int]]]] = []
    if br.read_bit() == 0:
        return out
    for pd in band_precincts:
        for cb, blk in zip(pd.precinct.code_blocks, pd.blocks):
            if not blk.included:
                included = pd.incl_tree.decode(br, cb.cbx, cb.cby, layer + 1)
            else:
                included = bool(br.read_bit())
            if not included:
                continue
            if not blk.included:
                # zero bitplanes: raise threshold until determined
                t = 1
                while not pd.imsb_tree.decode(br, cb.cbx, cb.cby, t):
                    t += 1
                blk.zero_bitplanes = pd.imsb_tree.leaf_value(cb.cbx, cb.cby)
                blk.included = True
            n_new = _decode_num_passes(br)
            # lblock update
            while br.read_bit():
                blk.lblock += 1
            chunks_spec = segment_chunks(blk.passes_done, n_new, cb_style)
            chunks: List[Tuple[int, int]] = []
            for npasses, _ends in chunks_spec:
                nbytes = br.read_bits(blk.lblock + _floor_log2(npasses))
                chunks.append((npasses, nbytes))
            out.append((blk, n_new, chunks))
    return out


def apply_packet_body(data: bytes, pos: int,
                      decoded: List[Tuple[DecBlock, int, List[Tuple[int, int]]]],
                      cb_style: int) -> int:
    """Append body bytes to each block's accumulated codeword; returns new
    position."""
    for blk, n_new, chunks in decoded:
        chunk_flags = segment_chunks(blk.passes_done, n_new, cb_style)
        for (npasses, nbytes), (_np2, ends) in zip(chunks, chunk_flags):
            blk.data.extend(data[pos:pos + nbytes])
            pos += nbytes
            blk.open_segment_bytes += nbytes
            if ends:
                blk.segment_lengths.append(blk.open_segment_bytes)
                blk.open_segment_bytes = 0
        blk.passes_done += n_new
    return pos


def finalize_segments(blk: DecBlock) -> List[int]:
    segs = list(blk.segment_lengths)
    if blk.open_segment_bytes:
        segs.append(blk.open_segment_bytes)
    return segs


# -------------------------------------------------------- progression orders

@dataclasses.dataclass(frozen=True)
class PacketId:
    layer: int
    res: int
    comp: int
    precinct: int


def _order_key(order: int):
    if order == 0:    # LRCP
        return lambda e, l: (l, e[1], e[0], e[2])
    if order == 1:    # RLCP
        return lambda e, l: (e[1], l, e[0], e[2])
    if order == 2:    # RPCL
        return lambda e, l: (e[1], e[4], e[3], e[0], l)
    if order == 3:    # PCRL
        return lambda e, l: (e[4], e[3], e[0], e[1], l)
    return lambda e, l: (e[0], e[4], e[3], e[1], l)   # CPRL


def packet_sequence(tile: Tile, header: Header) -> List[PacketId]:
    """All packets of a tile in progression order (B.12).  When POC marker
    segments are present, packets are emitted per progression-change segment
    (each bounded in resolution/component/layer, skipping already-emitted
    packets), then any remainder follows the COD order — the reference
    parses POC but never applies it."""
    cs = header.coding_style
    num_layers = cs.num_layers
    entries = []
    for ci, tc in enumerate(tile.comps):
        dx = header.components[ci].dx
        dy = header.components[ci].dy
        nl = tc.coding.num_decompositions
        for res in tc.resolutions:
            r = res.r
            scale = 1 << (nl - r)
            for p in range(res.num_px * res.num_py):
                # precinct origin on the reference grid (for position orders)
                px = p % res.num_px
                py = p // res.num_px
                x_anchor = ((res.x0 >> res.ppx) + px) << res.ppx
                y_anchor = ((res.y0 >> res.ppy) + py) << res.ppy
                x_ref = max(x_anchor, res.x0) * scale * dx
                y_ref = max(y_anchor, res.y0) * scale * dy
                entries.append((ci, r, p, x_ref, y_ref))

    def expand(order, pool):
        key = _order_key(order)
        ex = [(key(e, l), PacketId(l, e[1], e[0], e[2])) for e, l in pool]
        ex.sort(key=lambda t: t[0])
        return [p for _, p in ex]

    if not header.poc:
        pool = [(e, l) for e in entries for l in range(num_layers)]
        return expand(cs.progression_order, pool)

    emitted = set()
    packets: List[PacketId] = []
    for pc in header.poc:
        pool = []
        for e in entries:
            if not (pc.res_start <= e[1] < pc.res_end):
                continue
            if not (pc.comp_start <= e[0] < pc.comp_end):
                continue
            for l in range(min(pc.layer_end, num_layers)):
                pid = (l, e[1], e[0], e[2])
                if pid in emitted:
                    continue
                pool.append((e, l))
        for p in expand(pc.progression_order, pool):
            emitted.add((p.layer, p.res, p.comp, p.precinct))
            packets.append(p)
    # remainder (packets outside every POC segment) in COD order
    pool = [(e, l) for e in entries for l in range(num_layers)
            if (l, e[1], e[0], e[2]) not in emitted]
    packets.extend(expand(cs.progression_order, pool))
    return packets


# ------------------------------------------------------------- SOP/EPH wrap

def wrap_packet(header_bytes: bytes, body: bytes, seq: int,
                use_sop: bool, use_eph: bool) -> bytes:
    out = bytearray()
    if use_sop:
        out += struct.pack(">HHH", mk.SOP, 4, seq & 0xFFFF)
    out += header_bytes
    if use_eph:
        out += struct.pack(">H", mk.EPH)
    out += body
    return bytes(out)
