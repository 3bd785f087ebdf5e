"""Directed MQ coder and byte-stuffing corner tests (the reference's bar:
internal/entropy/coverage_test.go's 0xFF byte-out / carry / BYTEIN branch
coverage) — carry chains into 0xFF, marker-terminated BYTEIN, 0x7F/0x80
stuffing boundaries, and raw-coder stuffing.
"""
import numpy as np
import pytest

from go_jpeg2000_tpu.ops.mq import (MQDecoder, MQEncoder, RawDecoder,
                                    RawEncoder)


def _roundtrip(stream):
    enc = MQEncoder()
    for cx, d in stream:
        enc.encode(d, cx)
    seg = enc.flush()
    dec = MQDecoder(seg)
    out = [(cx, dec.decode(cx)) for cx, _ in stream]
    assert out == list(stream)
    return seg


class TestStuffingBoundaries:
    def test_ff_chains_and_stuffing_invariant(self):
        """All-LPS-ish streams drive C toward 0xFFFF... sequences; every
        byte following an 0xFF in the segment must be <= 0x8F (C.3.2: only
        7 bits + possible carry land after a stuffed byte)."""
        rng = np.random.RandomState(1)
        hit_ff = 0
        for trial in range(60):
            n = int(rng.randint(30, 400))
            stream = [(int(rng.randint(0, 19)), int(rng.randint(0, 2)))
                      for _ in range(n)]
            seg = _roundtrip(stream)
            for i in range(len(seg) - 1):
                if seg[i] == 0xFF:
                    hit_ff += 1
                    assert seg[i + 1] <= 0x8F, \
                        f"trial {trial}: 0xFF followed by {seg[i+1]:#x}"
        assert hit_ff > 0, "battery never exercised a stuffed 0xFF"

    def test_carry_propagation_hits_0x7f_0x80_boundary(self):
        """Hunt for segments containing a byte that was carried into
        (0x80) or sits just below the stuff threshold (0x7F) and verify
        the decoder reproduces the stream across the boundary."""
        rng = np.random.RandomState(7)
        seen_7f = seen_80 = False
        for _ in range(200):
            n = int(rng.randint(20, 200))
            stream = [(int(rng.randint(0, 19)), int(rng.randint(0, 2)))
                      for _ in range(n)]
            seg = _roundtrip(stream)
            seen_7f |= 0x7F in seg
            seen_80 |= 0x80 in seg
            if seen_7f and seen_80:
                break
        assert seen_7f and seen_80

    def test_uni_all_ones_dense_output(self):
        # UNI ctx, all 1-decisions: near-random output bytes, heavy renorm
        stream = [(18, 1)] * 1000
        _roundtrip(stream)

    def test_rl_alternating_lps_storm(self):
        stream = [(17, i & 1) for i in range(801)]
        _roundtrip(stream)


class TestMarkerTerminatedBytein:
    def test_decoder_ignores_trailing_marker(self):
        """BYTEIN treats any byte > 0x8F after 0xFF as end-of-stream
        (C.4): appending a marker must not change decoded decisions."""
        rng = np.random.RandomState(3)
        stream = [(int(rng.randint(0, 19)), int(rng.randint(0, 2)))
                  for _ in range(300)]
        enc = MQEncoder()
        for cx, d in stream:
            enc.encode(d, cx)
        seg = enc.flush()
        dec_plain = MQDecoder(seg)
        dec_marked = MQDecoder(seg + b"\xff\x91\x00\x04")
        for cx, _ in stream:
            assert dec_plain.decode(cx) == dec_marked.decode(cx)

    def test_decode_past_end_feeds_ones(self):
        """Decoding more decisions than encoded must not raise — BYTEIN
        feeds 1-bits past the end (the D.4.1 truncation model)."""
        enc = MQEncoder()
        for i in range(50):
            enc.encode(i & 1, 0)
        seg = enc.flush()
        dec = MQDecoder(seg)
        for _ in range(200):
            dec.decode(0)

    def test_empty_and_tiny_segments(self):
        for seg in (b"", b"\x00", b"\xff", b"\xac\x00"):
            dec = MQDecoder(seg)
            for _ in range(32):
                assert dec.decode(0) in (0, 1)


class TestRawCoder:
    def test_stuffing_after_ff(self):
        """Raw (bypass) coder: after an 0xFF byte only 7 bits load
        (mqc.go:516-600 semantics)."""
        enc = RawEncoder()
        for _ in range(64):
            enc.encode_bit(1)
        seg = enc.flush()
        assert 0xFF in seg
        for i in range(len(seg) - 1):
            if seg[i] == 0xFF:
                assert seg[i + 1] <= 0x7F
        dec = RawDecoder(seg)
        for _ in range(64):
            assert dec.decode_bit() == 1

    @pytest.mark.parametrize("seed", range(5))
    def test_random_roundtrip(self, seed):
        rng = np.random.RandomState(seed)
        bits = [int(b) for b in rng.randint(0, 2, size=333)]
        enc = RawEncoder()
        for b in bits:
            enc.encode_bit(b)
        seg = enc.flush()
        dec = RawDecoder(seg)
        assert [dec.decode_bit() for _ in bits] == bits


class TestCarryIntoSentinel:
    def test_first_byte_carry(self):
        """A carry can ripple into the sentinel byte before any byte is
        committed; flush must still strip exactly one sentinel."""
        # MPS runs on a fresh context push C high quickly
        for pattern in ([(0, 1)] * 40, [(18, 1)] * 40, [(9, 1)] * 64):
            seg = _roundtrip(pattern)
            assert len(seg) >= 1
