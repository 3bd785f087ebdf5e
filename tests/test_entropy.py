"""Tests for MQ coder and EBCOT T1 (reference parity: mqc_test.go, t1_test.go,
coverage_test.go structural checks)."""
import random

import numpy as np
import pytest

from go_jpeg2000_tpu.ops import mq, t1
from go_jpeg2000_tpu.utils import markers as mk


class TestQeTable:
    def test_structure(self):
        assert len(mq.QE_TABLE) == 47
        for i, (qe, nmps, nlps, switch) in enumerate(mq.QE_TABLE):
            assert 0 < qe <= 0x5601
            assert 0 <= nmps < 47 and 0 <= nlps < 47
            assert switch in (0, 1)
        # switch only on the "startup" states
        switches = [i for i, s in enumerate(mq.QE_TABLE) if s[3]]
        assert switches == [0, 6, 14]

    def test_initial_states(self):
        st = mq.initial_states()
        assert st[mq.CTX_UNI][0] == 46
        assert st[mq.CTX_RL][0] == 3
        assert st[mq.CTX_ZC_BASE][0] == 4
        assert all(s == [0, 0] for i, s in enumerate(st)
                   if i not in (mq.CTX_UNI, mq.CTX_RL, mq.CTX_ZC_BASE))


class TestMQRoundtrip:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_decisions(self, seed):
        rng = random.Random(seed)
        seq = [(rng.randint(0, 1), rng.randint(0, 18)) for _ in range(3000)]
        enc = mq.MQEncoder()
        for d, cx in seq:
            enc.encode(d, cx)
        data = enc.flush()
        dec = mq.MQDecoder(data)
        assert all(dec.decode(cx) == d for d, cx in seq)

    def test_skewed_decisions(self):
        # long MPS runs then LPS bursts exercise renorm/byteout paths
        seq = [(0, 0)] * 500 + [(1, 0)] * 30 + [(0, 5)] * 200 + [(1, 18)] * 100
        enc = mq.MQEncoder()
        for d, cx in seq:
            enc.encode(d, cx)
        data = enc.flush()
        dec = mq.MQDecoder(data)
        assert all(dec.decode(cx) == d for d, cx in seq)

    def test_midstream_context_resets(self):
        rng = random.Random(3)
        seq = [(rng.randint(0, 1), rng.randint(0, 18)) for _ in range(800)]
        resets = set(range(0, 800, 53))
        enc = mq.MQEncoder()
        for i, (d, cx) in enumerate(seq):
            if i in resets:
                enc.reset_contexts()
            enc.encode(d, cx)
        data = enc.flush()
        dec = mq.MQDecoder(data)
        for i, (d, cx) in enumerate(seq):
            if i in resets:
                dec.reset_contexts()
            assert dec.decode(cx) == d

    def test_stuffed_byte_may_exceed_7f(self):
        """Regression: the byte after 0xFF carries bit 27 and may reach 0x8F;
        masking it to 0x7F corrupts the codeword."""
        # known sequence that produces ...ff 87... in the codeword
        evts = [(0, 17), (1, 17), (1, 18), (1, 18), (0, 9), (1, 0), (1, 9),
                (1, 3), (0, 10), (1, 7), (1, 11), None, (0, 1), (0, 6), (0, 7),
                (0, 3), (0, 15), (1, 15), (0, 15), (0, 15), None, (1, 17),
                (0, 18), (1, 18), (1, 9), (0, 3), (1, 0), (0, 9), (0, 1), (0, 5)]
        enc = mq.MQEncoder()
        for ev in evts:
            if ev is None:
                enc.reset_contexts()
            else:
                enc.encode(*ev)
        data = enc.flush()
        assert b"\xff\x87" in data
        dec = mq.MQDecoder(data)
        for ev in evts:
            if ev is None:
                dec.reset_contexts()
            else:
                assert dec.decode(ev[1]) == ev[0]

    def test_empty_codeword_decode(self):
        dec = mq.MQDecoder(b"")
        # decoding from nothing yields bits without crashing
        for _ in range(10):
            assert dec.decode(0) in (0, 1)


class TestRawCoder:
    def test_roundtrip_with_stuffing(self):
        rng = random.Random(9)
        bits = [rng.randint(0, 1) for _ in range(500)] + [1] * 100
        enc = mq.RawEncoder()
        for b in bits:
            enc.encode_bit(b)
        data = enc.flush()
        dec = mq.RawDecoder(data)
        assert all(dec.decode_bit() == b for b in bits)
        # all-ones must have produced stuffing (no 0xFF followed by >0x7F MSB)
        for i in range(len(data) - 1):
            if data[i] == 0xFF:
                assert data[i + 1] <= 0x7F


class TestZCLut:
    def test_spec_values(self):
        # Table D-1 spot checks, class A (LL/LH)
        assert t1.ZC_LUT[0, 2, 0, 0] == 8
        assert t1.ZC_LUT[0, 1, 1, 0] == 7
        assert t1.ZC_LUT[0, 1, 0, 1] == 6
        assert t1.ZC_LUT[0, 1, 0, 0] == 5
        assert t1.ZC_LUT[0, 0, 2, 0] == 4
        assert t1.ZC_LUT[0, 0, 1, 0] == 3
        assert t1.ZC_LUT[0, 0, 0, 2] == 2
        assert t1.ZC_LUT[0, 0, 0, 1] == 1
        assert t1.ZC_LUT[0, 0, 0, 0] == 0
        # HL swaps H and V
        assert t1.ZC_LUT[1, 0, 2, 0] == 8
        assert t1.ZC_LUT[1, 1, 0, 0] == 3
        # HH diagonal-primary
        assert t1.ZC_LUT[2, 0, 0, 3] == 8
        assert t1.ZC_LUT[2, 1, 1, 2] == 7
        assert t1.ZC_LUT[2, 0, 0, 0] == 0

    def test_sc_table_symmetry(self):
        # negating both contributions gives same ctx with flipped xor
        for (h, v), (cx, xor) in t1.SC_TABLE.items():
            cx2, xor2 = t1.SC_TABLE[(-h, -v)]
            assert cx2 == cx and xor2 == (1 - xor if (h, v) != (0, 0) else xor) or (h, v) == (0, 0)


class TestT1:
    @pytest.mark.parametrize("band", ["LL", "HL", "LH", "HH"])
    def test_roundtrip_bands(self, band):
        rng = np.random.RandomState(hash(band) % 100)
        c = rng.randint(-900, 900, size=(16, 16)).astype(np.int32)
        c[rng.rand(16, 16) < 0.6] = 0
        r = t1.encode_block(c, band)
        d = t1.decode_block(r.data, 16, 16, r.num_bitplanes, len(r.passes), band)
        np.testing.assert_array_equal(d, c)

    @pytest.mark.parametrize("shape", [(1, 1), (1, 8), (8, 1), (3, 5), (5, 3),
                                       (4, 4), (17, 9), (64, 64)])
    def test_roundtrip_shapes(self, shape):
        rng = np.random.RandomState(shape[0] * 100 + shape[1])
        c = rng.randint(-100, 100, size=shape).astype(np.int32)
        r = t1.encode_block(c, "HH")
        d = t1.decode_block(r.data, shape[1], shape[0], r.num_bitplanes,
                            len(r.passes), "HH")
        np.testing.assert_array_equal(d, c)

    def test_all_zero_block(self):
        c = np.zeros((8, 8), dtype=np.int32)
        r = t1.encode_block(c, "LL")
        assert r.num_bitplanes == 0 and r.data == b"" and not r.passes
        d = t1.decode_block(b"", 8, 8, 0, 0, "LL")
        np.testing.assert_array_equal(d, c)

    def test_single_coefficient(self):
        c = np.zeros((4, 4), dtype=np.int32)
        c[2, 1] = -37
        r = t1.encode_block(c, "HL")
        d = t1.decode_block(r.data, 4, 4, r.num_bitplanes, len(r.passes), "HL")
        np.testing.assert_array_equal(d, c)

    def test_num_passes(self):
        c = np.full((4, 4), 5, dtype=np.int32)   # numbps = 3
        r = t1.encode_block(c, "LL")
        assert r.num_bitplanes == 3
        assert len(r.passes) == 3 * 3 - 2

    @pytest.mark.parametrize("style", [
        mk.CBSTYLE_LAZY, mk.CBSTYLE_RESET, mk.CBSTYLE_TERMALL,
        mk.CBSTYLE_VSC, mk.CBSTYLE_SEGSYM,
        mk.CBSTYLE_LAZY | mk.CBSTYLE_TERMALL,
        mk.CBSTYLE_LAZY | mk.CBSTYLE_RESET | mk.CBSTYLE_VSC
        | mk.CBSTYLE_SEGSYM | mk.CBSTYLE_TERMALL,
    ])
    def test_mode_switches(self, style):
        rng = np.random.RandomState(style)
        c = rng.randint(-5000, 5000, size=(24, 17)).astype(np.int32)
        c[rng.rand(24, 17) < 0.4] = 0
        r = t1.encode_block(c, "LH", cb_style=style)
        d = t1.decode_block(r.data, 17, 24, r.num_bitplanes, len(r.passes),
                            "LH", cb_style=style,
                            segment_lengths=r.segment_lengths)
        np.testing.assert_array_equal(d, c)

    def test_truncated_passes_decode(self):
        """Decoding a prefix of passes yields a coarser but valid result."""
        rng = np.random.RandomState(7)
        c = rng.randint(-1000, 1000, size=(12, 12)).astype(np.int32)
        r = t1.encode_block(c, "LL", cb_style=mk.CBSTYLE_TERMALL)
        full_passes = len(r.passes)
        for k in range(1, full_passes + 1):
            nbytes = r.passes[k - 1].rate
            d = t1.decode_block(r.data[:nbytes], 12, 12, r.num_bitplanes, k,
                                "LL", cb_style=mk.CBSTYLE_TERMALL,
                                segment_lengths=[p.rate for p in r.passes[:k]] and
                                [r.segment_lengths[i] for i in range(k)])
            # magnitudes decoded so far must be prefixes of the true values
            err = np.abs(d.astype(np.int64) - c)
            assert err.max() <= (np.abs(c).max() + 1)
        # full decode is exact
        np.testing.assert_array_equal(
            t1.decode_block(r.data, 12, 12, r.num_bitplanes, full_passes, "LL",
                            cb_style=mk.CBSTYLE_TERMALL,
                            segment_lengths=r.segment_lengths), c)

    def test_rd_stats_monotone(self):
        rng = np.random.RandomState(11)
        c = rng.randint(-2000, 2000, size=(16, 16)).astype(np.int32)
        r = t1.encode_block(c, "LL")
        rates = [p.rate for p in r.passes]
        dists = [p.distortion for p in r.passes]
        assert rates == sorted(rates)
        assert dists == sorted(dists)
        # full decode means distortion reduction ~ total energy
        total = float((c.astype(np.int64) ** 2).sum())
        assert dists[-1] >= 0.95 * total


class TestPTerm:
    """Predictable termination (D.4.2): erterm flush for MQ segments and
    alternating-bit padding for raw segments; streams decode in libopenjp2
    (reference has no PTERM support)."""

    STYLES = [mk.CBSTYLE_PTERM,
              mk.CBSTYLE_PTERM | mk.CBSTYLE_TERMALL,
              mk.CBSTYLE_PTERM | mk.CBSTYLE_TERMALL | mk.CBSTYLE_LAZY,
              mk.CBSTYLE_PTERM | mk.CBSTYLE_LAZY | mk.CBSTYLE_RESET]

    @pytest.mark.parametrize("style", STYLES)
    def test_block_roundtrip(self, style):
        from go_jpeg2000_tpu.tcd.t2 import segment_chunks
        rng = np.random.RandomState(17)
        co = rng.randint(-900, 900, size=(20, 24)).astype(np.int64)
        r = t1.encode_block(co, "HL", style)
        chunks = segment_chunks(0, len(r.passes), style, len(r.passes))
        segs, p, prev = [], 0, 0
        for npasses, _ in chunks:
            p += npasses
            segs.append(r.passes[p - 1].rate - prev)
            prev = r.passes[p - 1].rate
        dec = t1.decode_block(r.data, 24, 20, r.num_bitplanes, len(r.passes),
                              "HL", style, segs)
        assert np.array_equal(dec, co)

    @pytest.mark.parametrize("style", STYLES)
    def test_native_matches_oracle(self, style):
        from go_jpeg2000_tpu.native import loader
        if not loader.available():
            pytest.skip("native backend unavailable")
        rng = np.random.RandomState(18)
        co = rng.randint(-500, 500, size=(17, 29)).astype(np.int64)
        rp = t1.encode_block(co, "LH", style)
        rn = loader.encode_blocks([(co.astype(np.int32), "LH", style)])[0]
        assert rp.data == rn.data
        assert [p.rate for p in rp.passes] == [p.rate for p in rn.passes]

    def test_e2e_image(self):
        import go_jpeg2000_tpu as jp2k
        from go_jpeg2000_tpu.options import Format, Options
        rng = np.random.RandomState(19)
        img = rng.randint(0, 256, size=(64, 64)).astype(np.uint8)
        style = mk.CBSTYLE_PTERM | mk.CBSTYLE_TERMALL
        d = jp2k.encode(img, Options(format=Format.J2K, lossless=True,
                                     num_resolutions=3,
                                     code_block_style=style))
        assert np.array_equal(jp2k.decode(d), img)
