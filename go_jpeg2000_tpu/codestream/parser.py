"""Codestream parser: main header and tile-part header marker state machines.

Grammar parity with the reference parser
(/root/reference/internal/codestream/parser.go:44-984): SOC→SIZ→
{COD,COC,QCD,QCC,POC,TLM,PLM,PPM,CRG,COM,CAP,...}→SOT, then per tile-part
SOT…{COD,COC,QCD,QCC,POC,PPT,PLT}…SOD.  Unknown markers with length fields are
skipped.  Operates on an in-memory codestream (bytes) with explicit offsets so
tile-part data can be sliced lazily.
"""
from __future__ import annotations

import struct
from typing import List, Optional, Tuple

from ..utils import markers as mk
from .header import (Capabilities, CodingStyle, ComponentInfo, Header,
                     ProgressionChange, Quantization, StepSize, TilePartInfo)


class ParseError(ValueError):
    pass


class Parser:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    # --- primitives -------------------------------------------------------
    def _need(self, n: int) -> None:
        if self.pos + n > len(self.data):
            raise ParseError(f"unexpected end of codestream at {self.pos} (need {n} bytes)")

    def _u8(self) -> int:
        self._need(1)
        v = self.data[self.pos]
        self.pos += 1
        return v

    def _u16(self) -> int:
        self._need(2)
        v = struct.unpack_from(">H", self.data, self.pos)[0]
        self.pos += 2
        return v

    def _u32(self) -> int:
        self._need(4)
        v = struct.unpack_from(">I", self.data, self.pos)[0]
        self.pos += 4
        return v

    def _segment(self) -> Tuple[int, int]:
        """Read a marker's length field; return (payload_start, payload_end)."""
        length = self._u16()
        if length < 2:
            raise ParseError(f"invalid marker segment length {length}")
        start = self.pos
        end = start + length - 2
        if end > len(self.data):
            raise ParseError("marker segment extends past end of codestream")
        return start, end

    # --- main header ------------------------------------------------------
    def read_header(self) -> Header:
        h = Header()
        if self._u16() != mk.SOC:
            raise ParseError("missing SOC marker")
        if self._u16() != mk.SIZ:
            raise ParseError("SIZ must immediately follow SOC")
        self._read_siz(h)
        while True:
            marker = self._u16()
            if marker == mk.SOT:
                self.pos -= 2
                break
            if marker == mk.EOC:
                self.pos -= 2
                break
            if not (0xFF00 <= marker <= 0xFFFF):
                raise ParseError(f"invalid marker 0x{marker:04X} in main header")
            start, end = self._segment()
            body = self.data[start:end]
            if marker == mk.COD:
                h.coding_style = self._parse_cod(body)
            elif marker == mk.COC:
                comp, cs = self._parse_coc(body, h)
                h.comp_coding[comp] = cs
            elif marker == mk.QCD:
                h.quantization = self._parse_quant(body)
            elif marker == mk.QCC:
                comp, q = self._parse_qcc(body, h)
                h.comp_quant[comp] = q
            elif marker == mk.POC:
                h.poc = self._parse_poc(body, h)
            elif marker == mk.CAP:
                h.capabilities = self._parse_cap(body)
            elif marker == mk.COM:
                if len(body) >= 2:
                    reg = struct.unpack_from(">H", body)[0]
                    if reg == mk.COMMENT_LATIN1:
                        h.comments.append(body[2:].decode("latin-1", "replace"))
            elif marker == mk.TLM:
                self._parse_tlm(body, h)
            elif marker == mk.PPM:
                h.ppm += body[1:]
            elif marker == mk.PLM:
                self._parse_plm(body, h)
            elif marker == mk.CRG:
                self._parse_crg(body, h)
            # PRF, CPF, unknown: skipped
            self.pos = end
        h.validate()
        return h

    def _read_siz(self, h: Header) -> None:
        start, end = self._segment()
        h.profile = self._u16()
        h.width = self._u32()
        h.height = self._u32()
        h.x_offset = self._u32()
        h.y_offset = self._u32()
        h.tile_width = self._u32()
        h.tile_height = self._u32()
        h.tile_x_offset = self._u32()
        h.tile_y_offset = self._u32()
        csiz = self._u16()
        if csiz == 0 or csiz > 16384:
            raise ParseError(f"invalid component count {csiz}")
        if end - self.pos < 3 * csiz:
            raise ParseError("SIZ too short for component data")
        for _ in range(csiz):
            ssiz = self._u8()
            dx = self._u8()
            dy = self._u8()
            h.components.append(ComponentInfo(ssiz=ssiz, dx=dx, dy=dy))
        self.pos = end

    def _parse_sp_coding(self, body: bytes, off: int, cs: CodingStyle,
                         with_precincts: bool) -> None:
        if len(body) - off < 5:
            raise ParseError("coding style segment too short")
        cs.num_decompositions = body[off]
        if cs.num_decompositions > 32:
            raise ParseError(f"invalid decomposition count {cs.num_decompositions}")
        cs.cb_width_exp = (body[off + 1] & 0x0F) + 2
        cs.cb_height_exp = (body[off + 2] & 0x0F) + 2
        if cs.cb_width_exp + cs.cb_height_exp > 12:
            raise ParseError("code-block area exceeds 4096 samples")
        cs.cb_style = body[off + 3]
        cs.transform = body[off + 4]
        off += 5
        if with_precincts and cs.user_precincts:
            cs.precincts = []
            for _ in range(cs.num_decompositions + 1):
                if off >= len(body):
                    raise ParseError("COD truncated precinct sizes")
                b = body[off]
                off += 1
                cs.precincts.append((b & 0x0F, b >> 4))

    def _parse_cod(self, body: bytes) -> CodingStyle:
        if len(body) < 9:
            raise ParseError("COD too short")
        cs = CodingStyle()
        cs.scod = body[0]
        cs.progression_order = body[1]
        if cs.progression_order > 4:
            raise ParseError(f"invalid progression order {cs.progression_order}")
        cs.num_layers = struct.unpack_from(">H", body, 2)[0]
        if cs.num_layers == 0:
            raise ParseError("zero quality layers")
        cs.mct = body[4]
        self._parse_sp_coding(body, 5, cs, with_precincts=True)
        return cs

    def _parse_coc(self, body: bytes, h: Header) -> Tuple[int, CodingStyle]:
        off = 1 if h.num_components <= 256 else 2
        if len(body) < off + 1:
            raise ParseError("COC too short")
        comp = body[0] if off == 1 else struct.unpack_from(">H", body)[0]
        if comp >= h.num_components:
            raise ParseError(f"COC component {comp} out of range")
        # Inherit layer/progression/mct from COD.
        cs = CodingStyle(
            scod=h.coding_style.scod,
            progression_order=h.coding_style.progression_order,
            num_layers=h.coding_style.num_layers,
            mct=h.coding_style.mct,
        )
        scoc = body[off]
        cs.scod = (cs.scod & ~mk.SCOD_PRECINCTS_DEFINED) | (scoc & 0x01)
        self._parse_sp_coding(body, off + 1, cs, with_precincts=True)
        return comp, cs

    def _parse_quant(self, body: bytes) -> Quantization:
        if len(body) < 1:
            raise ParseError("QCD too short")
        q = Quantization()
        sqcd = body[0]
        q.style = sqcd & 0x1F
        q.guard_bits = sqcd >> 5
        rest = body[1:]
        if q.style == mk.QUANT_NONE:
            q.step_sizes = [StepSize(0, b >> 3) for b in rest]
        elif q.style in (mk.QUANT_SCALAR_DERIVED, mk.QUANT_SCALAR_EXPOUNDED):
            if len(rest) % 2:
                raise ParseError("QCD step data not 16-bit aligned")
            vals = struct.unpack(f">{len(rest)//2}H", rest)
            q.step_sizes = [StepSize(v & 0x7FF, v >> 11) for v in vals]
        else:
            raise ParseError(f"invalid quantization style {q.style}")
        if not q.step_sizes:
            raise ParseError("quantization marker with no step sizes")
        return q

    def _parse_qcc(self, body: bytes, h: Header) -> Tuple[int, Quantization]:
        off = 1 if h.num_components <= 256 else 2
        if len(body) < off + 1:
            raise ParseError("QCC too short")
        comp = body[0] if off == 1 else struct.unpack_from(">H", body)[0]
        if comp >= h.num_components:
            raise ParseError(f"QCC component {comp} out of range")
        return comp, self._parse_quant(body[off:])

    def _parse_poc(self, body: bytes, h: Header) -> List[ProgressionChange]:
        wide = h.num_components > 256
        entry = 9 if wide else 7
        if len(body) % entry:
            raise ParseError("POC length not a multiple of entry size")
        out = []
        off = 0
        while off < len(body):
            pc = ProgressionChange()
            pc.res_start = body[off]; off += 1
            if wide:
                pc.comp_start = struct.unpack_from(">H", body, off)[0]; off += 2
            else:
                pc.comp_start = body[off]; off += 1
            pc.layer_end = struct.unpack_from(">H", body, off)[0]; off += 2
            pc.res_end = body[off]; off += 1
            if wide:
                pc.comp_end = struct.unpack_from(">H", body, off)[0]; off += 2
            else:
                pc.comp_end = body[off]; off += 1
            pc.progression_order = body[off]; off += 1
            out.append(pc)
        return out

    def _parse_cap(self, body: bytes) -> Capabilities:
        if len(body) < 4:
            raise ParseError("CAP too short")
        cap = Capabilities(pcap=struct.unpack_from(">I", body)[0])
        rest = body[4:]
        cap.ccap = list(struct.unpack(f">{len(rest)//2}H", rest[:len(rest)//2*2]))
        return cap

    def _parse_tlm(self, body: bytes, h: Header) -> None:
        if len(body) < 2:
            raise ParseError("TLM too short")
        stlm = body[1]
        st = (stlm >> 4) & 0x03
        sp = (stlm >> 6) & 0x01
        entry = st + (4 if sp else 2)
        off = 2
        idx = 0
        while off + entry <= len(body):
            if st == 0:
                t = idx
            elif st == 1:
                t = body[off]
            else:
                t = struct.unpack_from(">H", body, off)[0]
            off += st
            if sp:
                ln = struct.unpack_from(">I", body, off)[0]; off += 4
            else:
                ln = struct.unpack_from(">H", body, off)[0]; off += 2
            h.tlm.append((t, ln))
            idx += 1

    def _parse_plm(self, body: bytes, h: Header) -> None:
        """A.7.2 Packet length, main header.  Payload: Zplm index byte, then
        per tile-part an Nplm count byte followed by Nplm bytes of 7-bit
        continuation-coded packet lengths (reference parity: the reference
        parses PLM into header state, parser.go:741-771)."""
        if len(body) < 1:
            raise ParseError("PLM too short")
        off = 1   # skip Zplm
        while off < len(body):
            nplm = body[off]
            off += 1
            end = off + nplm
            if end > len(body):
                raise ParseError("PLM Nplm extends past segment")
            v = 0
            while off < end:
                b = body[off]
                off += 1
                v = (v << 7) | (b & 0x7F)
                if not (b & 0x80):
                    h.plm.append(v)
                    v = 0

    def _parse_crg(self, body: bytes, h: Header) -> None:
        """A.9.1 Component registration: (Xcrg, Ycrg) u16 pairs per
        component (reference parity: parser.go:773-800)."""
        if len(body) % 4 != 0:
            raise ParseError("CRG length must be a multiple of 4")
        for off in range(0, len(body), 4):
            x, y = struct.unpack_from(">HH", body, off)
            h.crg.append((x, y))

    # --- tile-part headers ------------------------------------------------
    def read_tile_part(self, h: Header) -> Optional[TilePartInfo]:
        """Parse one SOT..SOD tile-part header at the current position.

        Returns the TilePartInfo with data_start/data_end slicing the packet
        data, and advances past the tile-part.  Returns None at EOC.
        """
        marker = self._u16()
        if marker == mk.EOC:
            return None
        if marker != mk.SOT:
            raise ParseError(f"expected SOT, got {mk.marker_name(marker)}")
        sot_pos = self.pos - 2
        start, end = self._segment()
        if end - start != 8:
            raise ParseError("SOT payload must be 8 bytes")
        tp = TilePartInfo()
        tp.tile_index = self._u16()
        tp.tile_part_length = self._u32()
        tp.tile_part_index = self._u8()
        tp.num_tile_parts = self._u8()
        if tp.tile_index >= h.num_tiles:
            raise ParseError(f"tile index {tp.tile_index} out of range")
        while True:
            marker = self._u16()
            if marker == mk.SOD:
                break
            if not (0xFF00 <= marker <= 0xFFFF):
                raise ParseError(f"invalid marker 0x{marker:04X} in tile-part header")
            s, e = self._segment()
            body = self.data[s:e]
            if marker == mk.COD:
                tp.coding_style = self._parse_cod(body)
            elif marker == mk.COC:
                comp, cs = self._parse_coc(body, h)
                tp.comp_coding[comp] = cs
            elif marker == mk.QCD:
                tp.quantization = self._parse_quant(body)
            elif marker == mk.QCC:
                comp, q = self._parse_qcc(body, h)
                tp.comp_quant[comp] = q
            elif marker == mk.POC:
                tp.poc = self._parse_poc(body, h)
            elif marker == mk.PPT:
                tp.packed_headers += body[1:]
            elif marker == mk.PLT:
                self._parse_plt(body, tp)
            self.pos = e
        tp.data_start = self.pos
        if tp.tile_part_length == 0:
            # Length 0 => extends to next SOT/EOC (last tile-part only).
            nxt = self._find_next_tile_boundary()
            tp.data_end = nxt
        else:
            tp.data_end = sot_pos + tp.tile_part_length
        if tp.data_end > len(self.data):
            raise ParseError("tile-part length extends past end of codestream")
        self.pos = tp.data_end
        return tp

    def _parse_plt(self, body: bytes, tp: TilePartInfo) -> None:
        """A.7.1 PLT: Zplt then 7-bit varint packet lengths."""
        if len(body) < 1:
            raise ParseError("PLT too short")
        i, v = 1, 0
        while i < len(body):
            v = (v << 7) | (body[i] & 0x7F)
            if not body[i] & 0x80:
                tp.packet_lengths.append(v)
                v = 0
            i += 1

    def _find_next_tile_boundary(self) -> int:
        """Scan for the next SOT/EOC at top level (only valid for streams
        without PPM/PPT where FF90 can't appear in packet bodies... packet
        bodies can contain any bytes, so this is a heuristic used only for
        Psot=0 last tile-parts, where EOC terminates)."""
        return len(self.data) - 2 if self.data.endswith(struct.pack(">H", mk.EOC)) else len(self.data)

    def read_all_tile_parts(self, h: Header) -> List[TilePartInfo]:
        parts = []
        while True:
            tp = self.read_tile_part(h)
            if tp is None:
                break
            tp.order = len(parts)
            parts.append(tp)
            if self.pos >= len(self.data):
                break
        return parts
