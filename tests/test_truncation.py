"""Exact pass truncation lengths (spec D.4.1 semantics; VERDICT r2 ask #7).

Every pass rate must be the length of a prefix that decodes that many
passes exactly — the basis PCRD layer boundaries are built on.  The
reference has no analog (it does no rate control at all); OpenJPEG uses
safe over-estimates.  Here rates are exact minimal lengths computed from
the MQ coder's interval registers (ops/mq.py exact_rates), mirrored
bit-for-bit by the native C++ coder.
"""
import numpy as np
import pytest

from go_jpeg2000_tpu.ops import t1
from go_jpeg2000_tpu.ops.mq import MQEncoder, MQDecoder, exact_rates
from go_jpeg2000_tpu.utils import markers as mk

STYLES = [0, mk.CBSTYLE_LAZY, mk.CBSTYLE_RESET,
          mk.CBSTYLE_LAZY | mk.CBSTYLE_RESET | mk.CBSTYLE_VSC]


def _seg_list_for(num_passes, style, seg_lens, rate):
    counts = t1._num_segments(num_passes, style)
    segs = []
    rem = rate
    for _, sl in zip(counts, seg_lens):
        segs.append(min(sl, rem))
        rem = max(0, rem - sl)
    return segs


class TestExactRatesMQ:
    def test_minimal_vs_bruteforce(self):
        """exact_rates returns the true minimal prefix per boundary."""
        rng = np.random.RandomState(42)
        n = 1200
        decisions = rng.randint(0, 2, n).tolist()
        ctxs = rng.randint(0, 19, n).tolist()
        enc = MQEncoder()
        marks, mark_at = [], []
        for i, (d, cx) in enumerate(zip(decisions, ctxs)):
            enc.encode(d, cx)
            if (i + 1) % 150 == 0 and i + 1 < n:
                marks.append(enc.mark())
                mark_at.append(i + 1)
        seg = enc.flush()
        rates = exact_rates(enc.final_buf, len(seg), marks)

        def decodes_ok(nd, nbytes):
            dec = MQDecoder(seg[:nbytes])
            return all(dec.decode(ctxs[j]) == decisions[j] for j in range(nd))

        for nd, r in zip(mark_at, rates):
            assert decodes_ok(nd, r), (nd, r)
            if r > 0:
                assert not decodes_ok(nd, r - 1), (nd, r)   # minimal


class TestTruncateEveryPass:
    @pytest.mark.parametrize("style", STYLES)
    def test_truncate_every_pass_decodes(self, style):
        rng = np.random.RandomState(7)
        h, w = 28, 33
        c = rng.randint(-2000, 2000, size=(h, w)).astype(np.int32)
        c[rng.rand(h, w) < 0.6] = 0
        r = t1.encode_block(c, "HL", cb_style=style)
        assert len(r.passes) > 10
        for i, p in enumerate(r.passes):
            exp = t1.decode_block(
                r.data, w, h, r.num_bitplanes, i + 1, "HL", style,
                _seg_list_for(i + 1, style, r.segment_lengths, len(r.data)))
            got = t1.decode_block(
                r.data[:p.rate], w, h, r.num_bitplanes, i + 1, "HL", style,
                _seg_list_for(i + 1, style, r.segment_lengths, p.rate))
            np.testing.assert_array_equal(exp, got, err_msg=f"pass {i}")
        # full decode is the coefficients
        full = t1.decode_block(r.data, w, h, r.num_bitplanes, len(r.passes),
                               "HL", style, r.segment_lengths)
        np.testing.assert_array_equal(full, c)

    def test_rates_monotone_and_tight(self):
        rng = np.random.RandomState(3)
        c = rng.randint(-500, 500, size=(24, 24)).astype(np.int32)
        c[rng.rand(24, 24) < 0.5] = 0
        r = t1.encode_block(c, "LL")
        rates = [p.rate for p in r.passes]
        assert rates == sorted(rates)
        assert rates[-1] == len(r.data)
