"""Codestream marker segment emission (ISO/IEC 15444-1 Annex A).

Behavioral parity with the reference's marker generation
(/root/reference/encoder.go:328-565) but fully conformant: real QCD step
sizes, CAP with correct Part-15 Pcap bit, COC/QCC support.
"""
from __future__ import annotations

import struct
from typing import List, Optional, Tuple

from ..utils import markers as mk
from .header import CodingStyle, Header, Quantization


def _seg(marker: int, payload: bytes) -> bytes:
    """Marker + 16-bit length (length covers itself + payload)."""
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def write_soc() -> bytes:
    return struct.pack(">H", mk.SOC)


def write_eoc() -> bytes:
    return struct.pack(">H", mk.EOC)


def write_siz(h: Header) -> bytes:
    payload = struct.pack(
        ">HIIIIIIIIH",
        h.profile,
        h.width, h.height, h.x_offset, h.y_offset,
        h.tile_width, h.tile_height, h.tile_x_offset, h.tile_y_offset,
        h.num_components,
    )
    for c in h.components:
        payload += struct.pack(">BBB", c.ssiz, c.dx, c.dy)
    return _seg(mk.SIZ, payload)


def _sp_coding(cs: CodingStyle, with_precincts: bool) -> bytes:
    sp = struct.pack(
        ">BBBBB",
        cs.num_decompositions,
        cs.cb_width_exp - 2,
        cs.cb_height_exp - 2,
        cs.cb_style,
        cs.transform,
    )
    if with_precincts and cs.user_precincts:
        for r in range(cs.num_decompositions + 1):
            ppx, ppy = cs.precinct_exp(r)
            sp += struct.pack(">B", (ppy << 4) | ppx)
    return sp


def write_cod(cs: CodingStyle) -> bytes:
    payload = struct.pack(
        ">BBHB",
        cs.scod,
        cs.progression_order,
        cs.num_layers,
        cs.mct,
    )
    payload += _sp_coding(cs, with_precincts=True)
    return _seg(mk.COD, payload)


def write_coc(comp: int, num_components: int, cs: CodingStyle) -> bytes:
    if num_components <= 256:
        payload = struct.pack(">B", comp)
    else:
        payload = struct.pack(">H", comp)
    scoc = 1 if cs.user_precincts else 0
    payload += struct.pack(">B", scoc)
    payload += _sp_coding(cs, with_precincts=True)
    return _seg(mk.COC, payload)


def _quant_payload(q: Quantization) -> bytes:
    s = struct.pack(">B", (q.guard_bits << 5) | q.style)
    if q.style == mk.QUANT_NONE:
        for st in q.step_sizes:
            s += struct.pack(">B", st.exponent << 3)
    else:
        for st in q.step_sizes:
            s += struct.pack(">H", (st.exponent << 11) | st.mantissa)
    return s


def write_qcd(q: Quantization) -> bytes:
    return _seg(mk.QCD, _quant_payload(q))


def write_qcc(comp: int, num_components: int, q: Quantization) -> bytes:
    if num_components <= 256:
        payload = struct.pack(">B", comp)
    else:
        payload = struct.pack(">H", comp)
    payload += _quant_payload(q)
    return _seg(mk.QCC, payload)


def write_poc(changes, num_components: int) -> bytes:
    payload = b""
    wide = num_components > 256
    for pc in changes:
        if wide:
            payload += struct.pack(">BHHBHB", pc.res_start, pc.comp_start,
                                   pc.layer_end, pc.res_end, pc.comp_end,
                                   pc.progression_order)
        else:
            payload += struct.pack(">BBHBBB", pc.res_start, pc.comp_start,
                                   pc.layer_end, pc.res_end,
                                   min(pc.comp_end, 255), pc.progression_order)
    return _seg(mk.POC, payload)


def write_com(text: str, registration: int = mk.COMMENT_LATIN1) -> bytes:
    return _seg(mk.COM, struct.pack(">H", registration) + text.encode("latin-1"))


def write_cap(pcap: int, ccap: Optional[List[int]] = None) -> bytes:
    payload = struct.pack(">I", pcap)
    for c in (ccap or []):
        payload += struct.pack(">H", c)
    return _seg(mk.CAP, payload)


def write_sot(tile_index: int, tile_part_length: int, tile_part_index: int,
              num_tile_parts: int) -> bytes:
    payload = struct.pack(">HIBB", tile_index, tile_part_length,
                          tile_part_index, num_tile_parts)
    return _seg(mk.SOT, payload)


def write_sod() -> bytes:
    return struct.pack(">H", mk.SOD)


def write_tlm(tile_lengths: List[Tuple[int, int]], ztlm: int = 0) -> bytes:
    # ST=1 (8-bit tile indices) when possible, SP=1 (32-bit lengths)
    st = 1 if all(t <= 255 for t, _ in tile_lengths) else 2
    stlm = (st << 4) | (1 << 6)
    payload = struct.pack(">BB", ztlm, stlm)
    for t, ln in tile_lengths:
        payload += struct.pack(">B" if st == 1 else ">H", t)
        payload += struct.pack(">I", ln)
    return _seg(mk.TLM, payload)


def write_plt(zplt: int, packet_lengths: List[int]) -> bytes:
    payload = bytearray(struct.pack(">B", zplt))
    for ln in packet_lengths:
        # 7-bit big-endian varint with continuation in bit 7
        stack = [ln & 0x7F]
        ln >>= 7
        while ln:
            stack.append(0x80 | (ln & 0x7F))
            ln >>= 7
        payload.extend(reversed(stack))
    return _seg(mk.PLT, bytes(payload))


def write_ppt(headers: bytes) -> bytes:
    """A.7.5 PPT: packed packet headers for one tile-part, split across
    marker segments of <= 65535 bytes (Zppt increments per segment)."""
    out = bytearray()
    z = 0
    for i in range(0, max(1, len(headers)), 65532):
        out += _seg(mk.PPT, struct.pack(">B", z) + headers[i:i + 65532])
        z += 1
    return bytes(out)


def write_ppm(chunks) -> bytes:
    """A.7.4 PPM: packed packet headers in the main header; one
    Nppm-prefixed chunk per tile-part, split across segments as needed."""
    payload = b"".join(struct.pack(">I", len(c)) + c for c in chunks)
    out = bytearray()
    z = 0
    for i in range(0, max(1, len(payload)), 65532):
        out += _seg(mk.PPM, struct.pack(">B", z) + payload[i:i + 65532])
        z += 1
    return bytes(out)
