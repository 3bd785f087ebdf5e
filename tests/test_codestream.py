"""Tests for markers, bit I/O, and codestream writer/parser round-trips.

Test-strategy parity with the reference: exhaustive marker round-trips
(/root/reference/internal/codestream/parser_test.go) and bio round-trips
(/root/reference/internal/bio/bio_test.go).
"""
import struct

import numpy as np
import pytest

from go_jpeg2000_tpu.utils import bio, markers as mk
from go_jpeg2000_tpu.codestream import writer as cw
from go_jpeg2000_tpu.codestream.header import (CodingStyle, ComponentInfo,
                                               Header, ProgressionChange,
                                               Quantization, StepSize)
from go_jpeg2000_tpu.codestream.parser import ParseError, Parser


# ---------------------------------------------------------------- bit I/O
class TestBitIO:
    def test_roundtrip_simple(self):
        w = bio.BitWriter()
        bits = [1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 1]
        for b in bits:
            w.write_bit(b)
        w.flush()
        r = bio.BitReader(w.getvalue())
        assert [r.read_bit() for _ in range(len(bits))] == bits

    def test_roundtrip_values(self):
        w = bio.BitWriter()
        vals = [(0x5, 3), (0xFF, 8), (0x1234, 16), (1, 1), (0, 7), (0x7FFFFFFF, 31)]
        for v, n in vals:
            w.write_bits(v, n)
        w.flush()
        r = bio.BitReader(w.getvalue())
        for v, n in vals:
            assert r.read_bits(n) == v

    def test_stuffing_after_ff(self):
        w = bio.BitWriter()
        w.write_bits(0xFF, 8)        # byte = 0xFF
        w.write_bits(0x7F, 7)        # next byte has only 7 bits
        w.flush()
        data = w.getvalue()
        assert data[0] == 0xFF
        assert data[1] == 0x7F       # MSB stuffed to 0
        r = bio.BitReader(data)
        assert r.read_bits(8) == 0xFF
        assert r.read_bits(7) == 0x7F

    def test_flush_emits_stuffed_byte_after_trailing_ff(self):
        w = bio.BitWriter()
        w.write_bits(0xFF, 8)
        w.flush()
        assert w.getvalue() == b"\xff\x00"

    def test_align_skips_stuffed_byte(self):
        w = bio.BitWriter()
        w.write_bits(0xFF, 8)
        w.flush()
        data = w.getvalue() + b"\xAB"
        r = bio.BitReader(data)
        assert r.read_bits(8) == 0xFF
        r.align()
        assert r.data[r.pos] == 0xAB

    def test_long_random_roundtrip(self):
        import random
        rng = random.Random(42)
        bits = [rng.randint(0, 1) for _ in range(10_000)]
        # Bias towards long runs of 1s to exercise stuffing.
        bits += [1] * 100 + [0] + [1] * 50
        w = bio.BitWriter()
        for b in bits:
            w.write_bit(b)
        w.flush()
        r = bio.BitReader(w.getvalue())
        assert [r.read_bit() for _ in range(len(bits))] == bits


# ---------------------------------------------------------------- markers
class TestMarkers:
    def test_classification(self):
        assert mk.is_delimiter(mk.SOC)
        assert mk.is_delimiter(mk.EOC)
        assert not mk.is_delimiter(mk.SIZ)
        assert not mk.has_length(mk.SOC)
        assert mk.has_length(mk.SIZ)
        assert mk.has_length(mk.SOT)

    def test_pcap_bit(self):
        # Part 15 flag must match OpenJPEG/OpenJPH convention 0x00020000.
        assert mk.pcap_bit(15) == 0x00020000


# ------------------------------------------------------- header round-trip
def _make_header(**kw) -> Header:
    h = Header()
    h.width = kw.get("width", 512)
    h.height = kw.get("height", 512)
    h.tile_width = kw.get("tile_width", 512)
    h.tile_height = kw.get("tile_height", 512)
    h.components = kw.get("components", [ComponentInfo.make(8)])
    h.coding_style = kw.get("coding_style", CodingStyle(transform=1))
    h.quantization = kw.get(
        "quantization",
        Quantization(style=mk.QUANT_NONE, guard_bits=2,
                     step_sizes=[StepSize(0, e) for e in [8, 9, 9, 10] * 4]))
    return h


class TestWriterParser:
    def _roundtrip(self, h: Header, extra=b"") -> Header:
        data = (cw.write_soc() + cw.write_siz(h) + cw.write_cod(h.coding_style)
                + cw.write_qcd(h.quantization) + extra
                + struct.pack(">H", mk.EOC))
        return Parser(data).read_header()

    def test_siz_roundtrip(self):
        h = _make_header(width=1920, height=1080, tile_width=256, tile_height=128,
                         components=[ComponentInfo.make(12),
                                     ComponentInfo.make(12, dx=2, dy=2),
                                     ComponentInfo.make(12, signed=True, dx=2, dy=1)])
        h2 = self._roundtrip(h)
        assert h2.width == 1920 and h2.height == 1080
        assert h2.tile_width == 256 and h2.tile_height == 128
        assert h2.num_tiles_x == 8 and h2.num_tiles_y == 9
        assert len(h2.components) == 3
        assert h2.components[0].precision == 12
        assert h2.components[1].dx == 2
        assert h2.components[2].signed

    def test_cod_roundtrip(self):
        cs = CodingStyle(scod=mk.SCOD_SOP | mk.SCOD_EPH, progression_order=2,
                         num_layers=5, mct=1, num_decompositions=4,
                         cb_width_exp=5, cb_height_exp=4,
                         cb_style=mk.CBSTYLE_LAZY | mk.CBSTYLE_SEGSYM, transform=0)
        h2 = self._roundtrip(_make_header(coding_style=cs))
        c = h2.coding_style
        assert c.has_sop and c.has_eph
        assert c.progression_order == 2
        assert c.num_layers == 5
        assert c.mct == 1
        assert c.num_decompositions == 4
        assert c.cb_width_exp == 5 and c.cb_height_exp == 4
        assert c.cb_style == (mk.CBSTYLE_LAZY | mk.CBSTYLE_SEGSYM)
        assert c.transform == 0

    def test_cod_precincts_roundtrip(self):
        cs = CodingStyle(scod=mk.SCOD_PRECINCTS_DEFINED, num_decompositions=3,
                         precincts=[(7, 7), (8, 8), (8, 8), (9, 9)], transform=1)
        h2 = self._roundtrip(_make_header(coding_style=cs))
        assert h2.coding_style.precincts == [(7, 7), (8, 8), (8, 8), (9, 9)]

    def test_qcd_none_roundtrip(self):
        q = Quantization(style=mk.QUANT_NONE, guard_bits=1,
                         step_sizes=[StepSize(0, e) for e in [8, 9, 9, 10, 10, 10, 11]])
        h2 = self._roundtrip(_make_header(quantization=q))
        q2 = h2.quantization
        assert q2.style == mk.QUANT_NONE and q2.guard_bits == 1
        assert [s.exponent for s in q2.step_sizes] == [8, 9, 9, 10, 10, 10, 11]

    def test_qcd_expounded_roundtrip(self):
        steps = [StepSize(m, e) for m, e in [(1024, 10), (0, 11), (2047, 9), (5, 12)]]
        q = Quantization(style=mk.QUANT_SCALAR_EXPOUNDED, guard_bits=2, step_sizes=steps)
        h2 = self._roundtrip(_make_header(quantization=q))
        assert [(s.mantissa, s.exponent) for s in h2.quantization.step_sizes] == \
            [(1024, 10), (0, 11), (2047, 9), (5, 12)]

    def test_coc_qcc_roundtrip(self):
        h = _make_header(components=[ComponentInfo.make(8)] * 3)
        coc_cs = CodingStyle(num_decompositions=2, cb_width_exp=4, cb_height_exp=4,
                             transform=1)
        qcc = Quantization(style=mk.QUANT_SCALAR_DERIVED, guard_bits=3,
                           step_sizes=[StepSize(100, 12)])
        extra = cw.write_coc(1, 3, coc_cs) + cw.write_qcc(2, 3, qcc)
        h2 = self._roundtrip(h, extra=extra)
        assert 1 in h2.comp_coding
        assert h2.comp_coding[1].num_decompositions == 2
        assert h2.comp_coding[1].cb_width_exp == 4
        assert 2 in h2.comp_quant
        assert h2.comp_quant[2].style == mk.QUANT_SCALAR_DERIVED
        assert h2.comp_quant[2].step_sizes[0].mantissa == 100
        # precedence: coding_for / quant_for
        assert h2.coding_for(1).num_decompositions == 2
        assert h2.coding_for(0).num_decompositions == 5
        assert h2.quant_for(2).guard_bits == 3

    def test_poc_com_cap_roundtrip(self):
        h = _make_header()
        pocs = [ProgressionChange(res_start=0, comp_start=0, layer_end=3,
                                  res_end=5, comp_end=1, progression_order=4)]
        extra = (cw.write_poc(pocs, 1) + cw.write_com("hello jpeg2000")
                 + cw.write_cap(mk.pcap_bit(15), [0x0802]))
        h2 = self._roundtrip(h, extra=extra)
        assert h2.poc[0].layer_end == 3 and h2.poc[0].progression_order == 4
        assert h2.comments == ["hello jpeg2000"]
        assert h2.capabilities.is_htj2k
        assert h2.is_htj2k

    def test_htj2k_via_cbstyle(self):
        cs = CodingStyle(cb_style=mk.CBSTYLE_HT, transform=1)
        h2 = self._roundtrip(_make_header(coding_style=cs))
        assert h2.is_htj2k

    def test_unknown_marker_skipped(self):
        h = _make_header()
        unknown = struct.pack(">HH", 0xFF70, 6) + b"\x00" * 4
        h2 = self._roundtrip(h, extra=unknown)
        assert h2.width == 512

    def test_tile_part_roundtrip(self):
        h = _make_header()
        payload = b"\xAA" * 37
        sot_len = 12 + 2 + len(payload)
        data = (cw.write_soc() + cw.write_siz(h) + cw.write_cod(h.coding_style)
                + cw.write_qcd(h.quantization)
                + cw.write_sot(0, sot_len, 0, 1) + cw.write_sod() + payload
                + cw.write_eoc())
        p = Parser(data)
        h2 = p.read_header()
        tp = p.read_tile_part(h2)
        assert tp.tile_index == 0
        assert data[tp.data_start:tp.data_end] == payload
        assert p.read_tile_part(h2) is None

    # --- error paths (reference parity: ~90 parser error tests) ---
    def test_missing_soc(self):
        with pytest.raises(ParseError):
            Parser(b"\x00\x00").read_header()

    def test_siz_not_after_soc(self):
        with pytest.raises(ParseError):
            Parser(struct.pack(">HH", mk.SOC, mk.COD)).read_header()

    def test_truncated_everywhere(self):
        h = _make_header()
        data = (cw.write_soc() + cw.write_siz(h) + cw.write_cod(h.coding_style)
                + cw.write_qcd(h.quantization) + struct.pack(">H", mk.EOC))
        for cut in range(2, len(data) - 1, 3):
            with pytest.raises((ParseError, ValueError)):
                hdr = Parser(data[:cut]).read_header()
                # Header may parse if cut lands exactly before EOC;
                # that's fine as long as content validates.
                if cut < len(data) - 2:
                    raise ParseError("short parse unexpectedly succeeded")

    def test_invalid_component_count(self):
        h = _make_header()
        raw = bytearray(cw.write_soc() + cw.write_siz(h))
        # Csiz lives at offset 2 (SOC) + 4 (marker+len) + 34 = 40
        struct.pack_into(">H", raw, 40, 0)
        with pytest.raises(ParseError):
            Parser(bytes(raw) + struct.pack(">H", mk.EOC)).read_header()

    def test_zero_layers_rejected(self):
        h = _make_header()
        cod = bytearray(cw.write_cod(h.coding_style))
        struct.pack_into(">H", cod, 6, 0)  # num_layers field
        data = cw.write_soc() + cw.write_siz(h) + bytes(cod) + \
            cw.write_qcd(h.quantization) + struct.pack(">H", mk.EOC)
        with pytest.raises(ParseError):
            Parser(data).read_header()

    def test_step_size_value(self):
        # Delta = 2^(R-eps) * (1 + mu/2048)
        s = StepSize(mantissa=0, exponent=8)
        assert s.value(8) == 1.0
        s2 = StepSize(mantissa=1024, exponent=8)
        assert s2.value(8) == 1.5
        # from_delta inverse
        for delta in [0.001, 0.5, 1.0, 1.5, 3.7, 100.0]:
            st = StepSize.from_delta(delta, 16)
            assert abs(st.value(16) - delta) / delta < 1e-3

    def test_tile_bounds(self):
        h = _make_header(width=1000, height=600, tile_width=512, tile_height=512)
        assert h.num_tiles_x == 2 and h.num_tiles_y == 2
        assert h.tile_bounds(0) == (0, 0, 512, 512)
        assert h.tile_bounds(1) == (512, 0, 1000, 512)
        assert h.tile_bounds(3) == (512, 512, 1000, 600)


class TestPOC:
    """Progression order changes (B.12.3) are applied during packet
    iteration — the reference parses POC but never applies it
    (/root/reference/internal/codestream/header.go POC handling)."""

    def _img(self):
        rng = np.random.RandomState(11)
        return rng.randint(0, 256, size=(64, 64, 3)).astype(np.uint8)

    def test_poc_roundtrip_and_opj(self, tmp_path):
        import go_jpeg2000_tpu as jp2k
        from go_jpeg2000_tpu.options import Format, Options
        img = self._img()
        opts = Options(format=Format.J2K, lossless=True, num_resolutions=4,
                       num_layers=2,
                       progression_changes=[(0, 0, 2, 2, 3, 0),
                                            (2, 0, 2, 4, 3, 4)])
        data = jp2k.encode(img, opts)
        assert np.array_equal(jp2k.decode(data), img)
        meta = jp2k.decode_metadata(data)
        assert meta.num_layers == 2

    def test_poc_partial_coverage_remainder(self):
        """Packets outside every POC segment follow the COD order."""
        import go_jpeg2000_tpu as jp2k
        from go_jpeg2000_tpu.options import Format, Options
        img = self._img()
        opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                       progression_changes=[(0, 0, 1, 1, 3, 1)])
        data = jp2k.encode(img, opts)
        assert np.array_equal(jp2k.decode(data), img)

    def test_poc_sequence_covers_all_packets_once(self):
        from go_jpeg2000_tpu.codestream.header import ProgressionChange
        from go_jpeg2000_tpu.models.encoder import build_header
        from go_jpeg2000_tpu.options import Format, Options
        from go_jpeg2000_tpu.tcd.geometry import build_tile
        from go_jpeg2000_tpu.tcd.t2 import packet_sequence
        opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                       num_layers=3)
        img = np.zeros((64, 64), dtype=np.uint8)
        h = build_header(img, opts)
        tile = build_tile(h, 0)
        base = packet_sequence(tile, h)
        h.poc = [ProgressionChange(0, 0, 2, 2, 1, 4),
                 ProgressionChange(1, 0, 3, 3, 1, 2)]
        seq = packet_sequence(tile, h)
        assert len(seq) == len(base)
        assert (set((p.layer, p.res, p.comp, p.precinct) for p in seq)
                == set((p.layer, p.res, p.comp, p.precinct) for p in base))


class TestPLTTLM:
    """PLT/TLM marker emission (A.4.17/A.7.1) — the reference has writers
    but no encoder option to emit them."""

    def _roundtrip(self, **kw):
        import go_jpeg2000_tpu as jp2k
        from go_jpeg2000_tpu.options import Format, Options
        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, size=(64, 64)).astype(np.uint8)
        opts = Options(format=Format.J2K, lossless=True, num_resolutions=3, **kw)
        data = jp2k.encode(img, opts)
        assert np.array_equal(jp2k.decode(data), img)
        return data

    def test_plt_present_and_decodes(self):
        data = self._roundtrip(enable_plt=True)
        assert b"\xff\x58" in data                 # PLT marker emitted

    def test_tlm_present_and_decodes(self):
        data = self._roundtrip(enable_tlm=True)
        assert b"\xff\x55" in data                 # TLM marker emitted

    def test_tlm_lengths_match_tile_parts(self):
        data = self._roundtrip(enable_tlm=True, tile_size=(32, 32))
        from go_jpeg2000_tpu.codestream.parser import Parser
        p = Parser(data)
        hdr = p.read_header()
        tps = p.read_all_tile_parts(hdr)
        assert hdr.tlm, "parser should record TLM entries"
        assert [ln for _, ln in hdr.tlm] == [tp.tile_part_length for tp in tps]

    def test_plt_lengths_sum_to_body(self):
        data = self._roundtrip(enable_plt=True, num_layers=2)
        from go_jpeg2000_tpu.codestream.parser import Parser
        p = Parser(data)
        hdr = p.read_header()
        tps = p.read_all_tile_parts(hdr)
        assert tps[0].packet_lengths, "parser should record PLT entries"
        assert (sum(tps[0].packet_lengths)
                == tps[0].data_end - tps[0].data_start)


class TestPackedHeaders:
    """PPT/PPM packed packet headers (A.7.4/A.7.5): emitted by the encoder
    and consumed by the decoder (the reference parses but never uses them)."""

    def _img(self):
        rng = np.random.RandomState(13)
        return rng.randint(0, 256, size=(96, 96, 3)).astype(np.uint8)

    @pytest.mark.parametrize("kw", [
        {"enable_ppt": True},
        {"enable_ppt": True, "tile_size": (48, 48)},
        {"enable_ppt": True, "enable_sop": True, "enable_eph": True},
        {"enable_ppt": True, "high_throughput": True, "num_layers": 2},
        {"enable_ppm": True},
        {"enable_ppm": True, "tile_size": (48, 48), "num_layers": 2},
        {"enable_ppm": True, "enable_sop": True, "enable_eph": True},
    ])
    def test_roundtrip(self, kw):
        import go_jpeg2000_tpu as jp2k
        from go_jpeg2000_tpu.options import Format, Options
        img = self._img()
        data = jp2k.encode(img, Options(format=Format.J2K, lossless=True,
                                        num_resolutions=4, **kw))
        marker = b"\xff\x61" if kw.get("enable_ppt") else b"\xff\x60"
        assert marker in data
        assert np.array_equal(jp2k.decode(data), img)

    def test_ppm_chunks_match_tile_parts(self):
        import go_jpeg2000_tpu as jp2k
        from go_jpeg2000_tpu.codestream.parser import Parser
        from go_jpeg2000_tpu.options import Format, Options
        img = self._img()
        data = jp2k.encode(img, Options(format=Format.J2K, lossless=True,
                                        num_resolutions=3,
                                        tile_size=(48, 48), enable_ppm=True))
        p = Parser(data)
        hdr = p.read_header()
        tps = p.read_all_tile_parts(hdr)
        assert len(hdr.ppm_chunks()) == len(tps) == 4
