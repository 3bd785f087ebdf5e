"""HTJ2K (ISO/IEC 15444-15) block coder and pipeline tests.

Self-round-trip is exact for all shapes/contents, and our HT streams decode
bit-exact in OpenJPEG (libopenjp2 2.5, via the ctypes conformance harness) —
the conformance bar the reference never attempts: its HT is a simplified toy
with a stubbed SigProp/MagRef (ht.go:866) and non-conformant table usage.
"""
import io

import numpy as np
import pytest

import go_jpeg2000_tpu as jp2k
from go_jpeg2000_tpu.ops import ht
from go_jpeg2000_tpu.options import Config, Format, Options

OPTS = dict(format=Format.J2K, lossless=True, high_throughput=True)


def _opj_decode(data):
    try:
        import tools.opj_harness as opj
    except Exception:
        return None, ["harness unavailable"]
    open("/tmp/_httest.j2k", "wb").write(data)
    return opj.decode("/tmp/_httest.j2k", verbose=False)


class TestHTBlockCoder:
    @pytest.mark.parametrize("shape", [(1, 1), (2, 2), (4, 4), (3, 5), (8, 8),
                                       (17, 9), (1, 16), (16, 1), (33, 31)])
    def test_roundtrip_shapes(self, shape):
        rng = np.random.RandomState(shape[0] * 31 + shape[1])
        c = rng.randint(-500, 500, size=shape).astype(np.int32)
        c[rng.rand(*shape) < 0.5] = 0
        seg, nbps, umax = ht.encode_cleanup(c)
        d = ht.decode_cleanup(seg, shape[1], shape[0], nbps)
        np.testing.assert_array_equal(d, c)

    def test_zero_block(self):
        seg, nbps, umax = ht.encode_cleanup(np.zeros((8, 8), dtype=np.int32))
        assert seg == b"" and nbps == 0

    def test_large_magnitudes(self):
        rng = np.random.RandomState(5)
        c = rng.randint(-60000, 60000, size=(16, 16)).astype(np.int32)
        seg, nbps, umax = ht.encode_cleanup(c)
        d = ht.decode_cleanup(seg, 16, 16, nbps)
        np.testing.assert_array_equal(d, c)

    def test_random_battery(self):
        rng = np.random.RandomState(0)
        for _ in range(60):
            h, w = rng.randint(1, 40), rng.randint(1, 40)
            c = rng.randint(-4000, 4000, size=(h, w)).astype(np.int32)
            c[rng.rand(h, w) < rng.uniform(0.1, 0.95)] = 0
            seg, nbps, umax = ht.encode_cleanup(c)
            d = ht.decode_cleanup(seg, w, h, nbps)
            np.testing.assert_array_equal(d, c)

    def test_scup_layout(self):
        c = np.zeros((4, 4), dtype=np.int32)
        c[0, 0] = 100
        seg, nbps, _ = ht.encode_cleanup(c)
        scup = (seg[-1] << 4) | (seg[-2] & 0x0F)
        assert 2 <= scup <= len(seg)


class TestHTPipeline:
    @pytest.mark.parametrize("shape", [(32, 32), (64, 48), (33, 65)])
    def test_gray_lossless(self, shape):
        rng = np.random.RandomState(shape[0])
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        data = jp2k.encode(img, Options(num_resolutions=3, **OPTS))
        np.testing.assert_array_equal(jp2k.decode(data), img)

    def test_rgb_lossless(self):
        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, size=(48, 48, 3)).astype(np.uint8)
        data = jp2k.encode(img, Options(num_resolutions=3, **OPTS))
        np.testing.assert_array_equal(jp2k.decode(data), img)

    def test_16bit(self):
        rng = np.random.RandomState(10)
        img = rng.randint(0, 65536, size=(32, 32)).astype(np.uint16)
        data = jp2k.encode(img, Options(num_resolutions=2, **OPTS))
        np.testing.assert_array_equal(jp2k.decode(data), img)

    def test_metadata_flags_htj2k(self):
        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
        data = jp2k.encode(img, Options(num_resolutions=2, **OPTS))
        md = jp2k.decode_metadata(data)
        assert md.is_htj2k

    def test_ht_smaller_or_comparable_to_t1(self):
        """HT trades a little compression for speed; sizes stay in range."""
        rng = np.random.RandomState(12)
        a = rng.randint(0, 256, size=(64, 64)).astype(np.float32)
        for ax in (0, 1):
            a = (a + np.roll(a, 1, axis=ax) + np.roll(a, -1, axis=ax)) / 3
        img = a.astype(np.uint8)
        d_ht = jp2k.encode(img, Options(num_resolutions=4, **OPTS))
        d_t1 = jp2k.encode(img, Options(format=Format.J2K, lossless=True,
                                        num_resolutions=4))
        assert len(d_ht) < len(d_t1) * 1.6


class TestHTOpenJPEGInterop:
    def _roundtrip_opj(self, img, nres=1):
        data = jp2k.encode(img, Options(num_resolutions=nres, **OPTS))
        arr, msgs = _opj_decode(data)
        return arr is not None and np.array_equal(arr.reshape(img.shape), img)

    def test_opj_initial_stripe(self):
        rng = np.random.RandomState(3)
        for _ in range(5):
            img = np.full((2, 16), 128, dtype=np.uint8)
            m = rng.rand(2, 16) < 0.4
            img[m] = rng.randint(0, 256, size=m.sum())
            assert self._roundtrip_opj(img)

    def test_opj_multistripe_w_context(self):
        # stripe 0 empty: only W/AZC context paths in later stripes
        for (y, x) in [(2, 0), (3, 1), (2, 4), (3, 7)]:
            img = np.full((4, 8), 128, dtype=np.uint8)
            img[y, x] = 133
            assert self._roundtrip_opj(img)

    def test_opj_noninit_n_term(self):
        img = np.full((4, 8), 128, dtype=np.uint8)
        img[1, 0] = 133
        img[2, 0] = 120
        assert self._roundtrip_opj(img)

    def test_opj_random_battery(self):
        rng = np.random.RandomState(7)
        for i in range(10):
            img = np.full((8, 10), 128, dtype=np.uint8)
            mask = rng.rand(8, 10) < (0.1 + 0.8 * i / 10)
            img[mask] = rng.randint(0, 256, size=mask.sum())
            assert self._roundtrip_opj(img), i

    def test_opj_full_pipeline(self):
        rng = np.random.RandomState(8)
        img = rng.randint(0, 256, size=(64, 64)).astype(np.uint8)
        assert self._roundtrip_opj(img, nres=4)

    def test_opj_rgb_pipeline(self):
        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, size=(48, 48, 3)).astype(np.uint8)
        assert self._roundtrip_opj(img, nres=3)
