"""Decoder robustness: malformed/truncated/garbage inputs must raise clean
errors, never crash or hang (reference parity: FuzzDecode/FuzzDecodeConfig/
FuzzDecodeMetadata, /root/reference/fuzz_test.go:10-63, and the parser's
~90 per-field error-injection tests)."""
import numpy as np
import pytest

import go_jpeg2000_tpu as jp2k
from go_jpeg2000_tpu.options import Format, Options


def _valid_stream():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(32, 32)).astype(np.uint8)
    return img, jp2k.encode(img, Options(format=Format.J2K, lossless=True,
                                         num_resolutions=3))


class TestGarbage:
    @pytest.mark.parametrize("data", [
        b"", b"\x00", b"garbage bytes here", b"\xff\x4f", b"\xff\x4f\xff\x51",
        b"\x00" * 100, b"\xff" * 100,
        b"\x00\x00\x00\x0cjP \x20\x0d\x0a\x87\x0a",          # JP2 sig only
    ])
    def test_decode_raises(self, data):
        with pytest.raises(Exception):
            jp2k.decode(data)

    def test_metadata_raises(self):
        for data in (b"", b"\xff\x4f\x00\x00", b"\x12" * 64):
            with pytest.raises(Exception):
                jp2k.decode_metadata(data)

    def test_random_bytes_never_crash(self):
        rng = np.random.RandomState(1)
        for _ in range(50):
            n = rng.randint(0, 300)
            data = rng.bytes(n)
            try:
                jp2k.decode(data)
            except Exception:
                pass  # clean raise is the contract

    def test_random_with_valid_magic(self):
        rng = np.random.RandomState(2)
        for _ in range(30):
            data = b"\xff\x4f\xff\x51" + rng.bytes(rng.randint(0, 200))
            try:
                jp2k.decode(data)
            except Exception:
                pass


class TestTruncation:
    def test_truncated_everywhere(self):
        img, data = _valid_stream()
        for cut in range(0, len(data), max(1, len(data) // 60)):
            try:
                jp2k.decode(data[:cut])
            except Exception:
                pass

    def test_bitflips(self):
        img, data = _valid_stream()
        rng = np.random.RandomState(3)
        for _ in range(40):
            mutated = bytearray(data)
            i = rng.randint(0, len(mutated))
            mutated[i] ^= 1 << rng.randint(0, 8)
            try:
                out = jp2k.decode(bytes(mutated))
                assert out.shape == img.shape  # header survived: shape holds
            except Exception:
                pass

    def test_tile_data_corruption_isolated(self):
        """Corruption confined to one tile's packet data must leave every
        OTHER tile pixel-exact (per-tile error containment, SURVEY §5.3)."""
        from go_jpeg2000_tpu.codestream.parser import Parser
        rng = np.random.RandomState(4)
        img = rng.randint(0, 256, size=(64, 64)).astype(np.uint8)
        data = jp2k.encode(img, Options(format=Format.J2K, lossless=True,
                                        num_resolutions=2, tile_size=(32, 32)))
        parser = Parser(data)
        header = parser.read_header()
        parts = parser.read_all_tile_parts(header)
        assert len(parts) == 4
        # obliterate tile 0's entire packet data
        tp0 = next(tp for tp in parts if tp.tile_index == 0)
        mutated = bytearray(data)
        for i in range(tp0.data_start, tp0.data_end):
            mutated[i] ^= 0xA5
        out = jp2k.decode(bytes(mutated))
        assert out.shape == img.shape
        # tiles 1..3 (the right column and bottom row) must be untouched
        assert np.array_equal(out[:32, 32:], img[:32, 32:])
        assert np.array_equal(out[32:, :32], img[32:, :32])
        assert np.array_equal(out[32:, 32:], img[32:, 32:])

    def test_plm_crg_parsed(self):
        """PLM and CRG main-header markers parse into Header state
        (reference parity: parser.go:741-800)."""
        import struct
        from go_jpeg2000_tpu.codestream.parser import Parser
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, size=(32, 32)).astype(np.uint8)
        data = jp2k.encode(img, Options(format=Format.J2K, lossless=True,
                                        num_resolutions=2))
        # inject PLM (lengths 5, 200) + CRG (one component) after SIZ
        plm_body = bytes([0, 3, 5, 0x81, 0x48])     # Zplm, Nplm=3, 5, 200
        plm = struct.pack(">HH", 0xFF57, 2 + len(plm_body)) + plm_body
        crg_body = struct.pack(">HH", 0x1234, 0x5678)
        crg = struct.pack(">HH", 0xFF63, 2 + len(crg_body)) + crg_body
        # SOC (2) + SIZ marker (2) + segment of Lsiz bytes
        siz_len = struct.unpack_from(">H", data, 4)[0]
        insert_at = 4 + siz_len
        mutated = data[:insert_at] + plm + crg + data[insert_at:]
        h = Parser(mutated).read_header()
        assert h.plm == [5, 200]
        assert h.crg == [(0x1234, 0x5678)]
        assert np.array_equal(jp2k.decode(mutated), img)
