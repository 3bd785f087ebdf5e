"""Differential tests: native C++ entropy backend vs the Python oracle.

The reference's fast-vs-safe equivalence pattern
(/root/reference/internal/entropy/t1_fast_test.go) applied to our
native/Python pair: codewords, pass rates, segments, and decodes must be
bit-identical.
"""
import numpy as np
import pytest

from go_jpeg2000_tpu.native import loader
from go_jpeg2000_tpu.ops import t1 as t1_py
from go_jpeg2000_tpu.utils import markers as mk

pytestmark = pytest.mark.skipif(not loader.available(),
                                reason="native backend unavailable")

STYLES = [0, mk.CBSTYLE_LAZY, mk.CBSTYLE_RESET, mk.CBSTYLE_TERMALL,
          mk.CBSTYLE_VSC, mk.CBSTYLE_SEGSYM,
          mk.CBSTYLE_LAZY | mk.CBSTYLE_TERMALL,
          mk.CBSTYLE_LAZY | mk.CBSTYLE_RESET | mk.CBSTYLE_VSC
          | mk.CBSTYLE_SEGSYM]


def _jobs(seed=0, n=24):
    rng = np.random.RandomState(seed)
    jobs = []
    for i in range(n):
        style = STYLES[i % len(STYLES)]
        band = ["LL", "HL", "LH", "HH"][i % 4]
        h, w = rng.randint(1, 64), rng.randint(1, 64)
        c = rng.randint(-3000, 3000, size=(h, w)).astype(np.int32)
        c[rng.rand(h, w) < 0.5] = 0
        jobs.append((c, band, style))
    return jobs


class TestNativeEncode:
    def test_bitexact_vs_python(self):
        jobs = _jobs()
        res_n = loader.encode_blocks(jobs)
        for (c, band, s), rn in zip(jobs, res_n):
            rp = t1_py.encode_block(c, band, cb_style=s)
            assert rn.data == rp.data, (band, hex(s), c.shape)
            assert rn.num_bitplanes == rp.num_bitplanes
            assert rn.segment_lengths == rp.segment_lengths
            assert [p.rate for p in rn.passes] == [p.rate for p in rp.passes]
            assert [p.terminated for p in rn.passes] == \
                [p.terminated for p in rp.passes]
            for pn, pp in zip(rn.passes, rp.passes):
                assert abs(pn.distortion - pp.distortion) <= 1e-6 * max(
                    1.0, abs(pp.distortion))

    def test_zero_blocks(self):
        jobs = [(np.zeros((8, 8), dtype=np.int32), "LL", 0)]
        res = loader.encode_blocks(jobs)
        assert res[0].num_bitplanes == 0 and res[0].data == b""


class TestNativeDecode:
    def test_native_roundtrip(self):
        jobs = _jobs(seed=1)
        res = loader.encode_blocks(jobs)
        djobs = [(r.data, c.shape[1], c.shape[0], r.num_bitplanes,
                  len(r.passes), band, s, r.segment_lengths)
                 for (c, band, s), r in zip(jobs, res)]
        decs = loader.decode_blocks(djobs)
        for (c, _, _), d in zip(jobs, decs):
            np.testing.assert_array_equal(d, c)

    def test_cross_decode(self):
        """Python-encoded streams decode identically in native and vice versa."""
        jobs = _jobs(seed=2, n=8)
        for c, band, s in jobs:
            rp = t1_py.encode_block(c, band, cb_style=s)
            if rp.num_bitplanes == 0:
                continue
            dn = loader.decode_blocks([(rp.data, c.shape[1], c.shape[0],
                                        rp.num_bitplanes, len(rp.passes),
                                        band, s, rp.segment_lengths)])[0]
            np.testing.assert_array_equal(dn, c)


class TestNativePipeline:
    def test_full_pipeline_native_equals_python(self):
        import go_jpeg2000_tpu as jp2k
        from go_jpeg2000_tpu.options import Options, Format
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, size=(96, 64)).astype(np.uint8)
        d_native = jp2k.encode(img, Options(format=Format.J2K, lossless=True,
                                            num_resolutions=3, backend="native"))
        d_python = jp2k.encode(img, Options(format=Format.J2K, lossless=True,
                                            num_resolutions=3, backend="python"))
        assert d_native == d_python
        np.testing.assert_array_equal(jp2k.decode(d_native), img)
