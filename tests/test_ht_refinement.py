"""HT SigProp/MagRef refinement passes: unit round-trips, full-pipeline
lossless round-trips, OpenJPEG cross-decode, and lossy R-D behavior.

The reference stubs refinement decode entirely
(/root/reference/internal/entropy/ht.go:866-869); these tests pin our full
3-pass HT set (T.814 §7.4) against the serial oracle and libopenjp2.
"""
import io

import numpy as np
import pytest

import go_jpeg2000_tpu as jp2k
from go_jpeg2000_tpu.ops import ht
from go_jpeg2000_tpu.options import Config, Format, Options


def _opj_decode(data):
    try:
        import tools.opj_harness as opj
    except Exception:
        pytest.skip("opj harness unavailable")
    with open("/tmp/_htref_test.j2k", "wb") as f:
        f.write(data)
    return opj.decode("/tmp/_htref_test.j2k", verbose=False)


def _smooth(img):
    for ax in (0, 1):
        img = (img + np.roll(img, 1, axis=ax)) / 2
    return img


class TestSigPropMagRefUnits:
    def _random_block(self, h, w, seed, scale=40):
        rng = np.random.RandomState(seed)
        return np.round(rng.laplace(0, scale, size=(h, w))).astype(np.int64)

    @pytest.mark.parametrize("seed", range(6))
    def test_sigprop_roundtrip(self, seed):
        c = self._random_block(16, 20, seed)
        sigma = ((np.abs(c) >> 1) != 0).astype(np.uint8)
        spp = ht.encode_sigprop(c, sigma, shift=1)
        out = (np.sign(c) * ((np.abs(c) >> 1) << 1)).astype(np.int64)
        sig2 = sigma.copy()
        ht.decode_sigprop(spp, out, sig2, shift=1)
        # every SigProp member with an odd magnitude becomes significant
        # with value +/-1; everything else is untouched
        n_m, n_new, n_lost = ht.sigprop_stats(c, sigma)
        assert int(((sig2 == 1) & (sigma == 0)).sum()) == n_new

    @pytest.mark.parametrize("seed", range(6))
    def test_magref_roundtrip(self, seed):
        c = self._random_block(12, 24, seed)
        sigma = ((np.abs(c) >> 1) != 0).astype(np.uint8)
        mrp = ht.encode_magref(c, sigma, shift=1)
        # start from the cleanup reconstruction (halved magnitudes, bit0 = 0)
        out = (np.sign(c) * ((np.abs(c) >> 1) << 1)).astype(np.int64)
        ht.decode_magref(mrp, out, sigma, shift=1)
        mask = sigma.astype(bool)
        assert np.array_equal(np.abs(out[mask]), np.abs(c[mask]))
        assert np.array_equal(np.sign(out[mask]), np.sign(c[mask]))

    @pytest.mark.parametrize("seed", range(8))
    def test_encode_refined_exact_roundtrip(self, seed):
        c = self._random_block(32, 32, seed, scale=60)
        cup, spp, mrp, numbps, _ = ht.encode_refined(c)
        if numbps < 2:
            pytest.skip("block fell back to cleanup-only")
        data = cup + spp + mrp
        dec = ht.decode_ht_block(data, 32, 32, numbps, num_passes=3,
                                 segment_lengths=[len(cup),
                                                  len(spp) + len(mrp)])
        _, _, n_lost = ht.sigprop_stats(
            c, ((np.abs(c) >> 1) != 0).astype(np.uint8))
        if n_lost == 0:
            assert np.array_equal(dec.astype(np.int64), c)
        else:
            # unreachable odd units are the only allowed error
            diff = np.abs(dec.astype(np.int64) - c)
            assert diff.max() <= 1 and int((diff > 0).sum()) <= n_lost

    def test_truncated_two_pass_decode(self):
        """Dropping MagRef leaves exactly the bit-0 refinement of
        cleanup-significant samples uncoded."""
        c = self._random_block(16, 16, 3, scale=80)
        cup, spp, mrp, numbps, _ = ht.encode_refined(c)
        if numbps < 2:
            pytest.skip("block fell back to cleanup-only")
        dec2 = ht.decode_ht_block(cup + spp, 16, 16, numbps, num_passes=2,
                                  segment_lengths=[len(cup), len(spp)])
        sigma = ((np.abs(c) >> 1) != 0)
        d = np.abs(dec2.astype(np.int64) - c)
        # errors only at cleanup-significant samples, magnitude <= 1
        assert d[~sigma & (d > 0)].size == 0 or np.all(d[~sigma] <= 1)
        assert np.all(d[sigma] <= 1)

    def test_one_pass_decode_is_cleanup_only(self):
        c = self._random_block(16, 16, 4, scale=80)
        cup, spp, mrp, numbps, _ = ht.encode_refined(c)
        if numbps < 2:
            pytest.skip("fell back")
        dec1 = ht.decode_ht_block(cup, 16, 16, numbps, num_passes=1,
                                  segment_lengths=[len(cup)])
        expect = (np.sign(c) * ((np.abs(c) >> 1) << 1)).astype(np.int64)
        assert np.array_equal(dec1.astype(np.int64), expect)


class TestRefinedPipeline:
    def _img(self, shape, seed=0):
        rng = np.random.RandomState(seed)
        return _smooth(rng.randint(0, 256, size=shape).astype(
            np.float32)).astype(np.uint8)

    def test_lossless_roundtrip_gray(self):
        img = self._img((96, 80), 1)
        opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                       high_throughput=True, ht_refinement=True,
                       backend="python")
        data = jp2k.encode(img, opts)
        assert np.array_equal(jp2k.decode(data), img)

    def test_lossless_roundtrip_rgb_mct(self):
        img = self._img((64, 64, 3), 2)
        opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                       high_throughput=True, ht_refinement=True,
                       backend="python")
        data = jp2k.encode(img, opts)
        assert np.array_equal(jp2k.decode(data), img)

    @pytest.mark.parametrize("seed", range(4))
    def test_opj_cross_decode_refined(self, seed):
        """libopenjp2 must decode our 3-pass HT sets bit-exact — the
        conformance bar the reference's stub cannot meet."""
        img = self._img((64, 64), 10 + seed)
        opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                       high_throughput=True, ht_refinement=True,
                       backend="python")
        data = jp2k.encode(img, opts)
        arr, msgs = _opj_decode(data)
        assert arr is not None and np.array_equal(arr.reshape(img.shape), img)

    def test_opj_cross_decode_refined_rgb(self):
        img = self._img((48, 48, 3), 21)
        opts = Options(format=Format.J2K, lossless=True, num_resolutions=2,
                       high_throughput=True, ht_refinement=True,
                       backend="python")
        data = jp2k.encode(img, opts)
        arr, msgs = _opj_decode(data)
        assert arr is not None and np.array_equal(arr.reshape(img.shape), img)

    def test_refined_blocks_have_three_truncation_points(self):
        """PCRD sees >= 3 pass boundaries per refined block (the lossy-HT
        requirement; cleanup-only sets give exactly one)."""
        from go_jpeg2000_tpu.models.entropy_backend import encode_blocks_batch
        from go_jpeg2000_tpu.utils import markers as mk
        rng = np.random.RandomState(5)
        c = np.round(rng.laplace(0, 60, size=(32, 32))).astype(np.int32)
        jobs = [(c, "LL", mk.CBSTYLE_HT, 12)]
        res = encode_blocks_batch(jobs, backend="python",
                                  ht_refinement=True,
                                  ht_require_exact=False)[0]
        assert len(res.passes) == 3
        rates = [p.rate for p in res.passes]
        assert rates[0] < rates[1] <= rates[2]
        # distortion contributions must be monotone (more passes, less error)
        dists = [p.distortion for p in res.passes]
        assert dists[0] <= dists[1] <= dists[2]

    def test_lossy_ht_layers_rd(self):
        """Multi-layer HT encode with a byte budget: decoding more layers
        must not increase MSE, and the refined set must beat cleanup-only
        at the same layer count."""
        img = self._img((128, 128), 7)
        opts = Options(format=Format.J2K, lossless=False, num_resolutions=4,
                       high_throughput=True, ht_refinement=True,
                       backend="python", num_layers=3,
                       compression_ratio=4.0)
        data = jp2k.encode(img, opts)
        mses = []
        for ql in (1, 2, 3):
            dec = jp2k.decode(data, Config(quality_layers=ql))
            mses.append(float(((dec.astype(np.float64)
                                - img.astype(np.float64)) ** 2).mean()))
        assert mses[2] <= mses[1] <= mses[0]
        assert mses[2] < mses[0] or mses[0] == 0.0


class TestNativeRefinement:
    """C++ SigProp/MagRef (native/j2k_native.cpp) vs the Python oracle:
    byte-identical segments, identical pass metadata, identical decodes
    (including truncation), and the full pipeline on backend='native'."""

    def _blocks(self):
        rng = np.random.RandomState(11)
        out = []
        for i in range(12):
            h = int(rng.choice([8, 16, 28, 32]))
            w = int(rng.choice([8, 16, 33, 32]))
            scale = rng.choice([3, 30, 120])
            out.append(np.round(rng.laplace(0, scale, size=(h, w)))
                       .astype(np.int32))
        out.append(np.zeros((16, 16), np.int32))
        one = np.zeros((8, 8), np.int32)
        one[3, 4] = 1
        out.append(one)   # max magnitude 1 -> cleanup-only fallback
        return out

    def test_native_encode_matches_oracle(self):
        from go_jpeg2000_tpu.native import loader
        if not loader.available():
            pytest.skip("native unavailable")
        blocks = self._blocks()
        res = loader.ht_encode_refined_blocks(blocks, require_exact=True)
        for c, (data, numbps, lc, lspp, lref, refined, dist) in \
                zip(blocks, res):
            cup, spp, mrp, nbp_py, _ = ht.encode_refined(
                np.asarray(c, np.int64))
            if int(np.abs(c).max(initial=0)) == 0:
                assert numbps == 0
                continue
            py_data = cup + spp + mrp
            assert numbps == nbp_py
            assert data == py_data, "segment bytes differ from oracle"
            if refined:
                assert lc == len(cup) and lspp == len(spp) \
                    and lref == len(spp) + len(mrp)

    def test_native_decode_matches_oracle_with_truncation(self):
        from go_jpeg2000_tpu.native import loader
        if not loader.available():
            pytest.skip("native unavailable")
        rng = np.random.RandomState(12)
        c = np.round(rng.laplace(0, 60, size=(32, 32))).astype(np.int64)
        cup, spp, mrp, numbps, _ = ht.encode_refined(c)
        if numbps < 2:
            pytest.skip("fell back")
        data = cup + spp + mrp
        for npass, payload, segs in (
                (3, data, [len(cup), len(spp) + len(mrp)]),
                (2, cup + spp, [len(cup), len(spp)]),
                (1, cup, [len(cup)])):
            py = ht.decode_ht_block(payload, 32, 32, numbps,
                                    num_passes=npass, segment_lengths=segs)
            lc = segs[0]
            lr = segs[1] if len(segs) > 1 else 0
            nat = loader.ht_decode_refined_blocks(
                [(payload, 32, 32, numbps, npass, lc, lr)])[0]
            np.testing.assert_array_equal(py, nat.astype(py.dtype),
                                          err_msg=f"npass {npass}")

    def test_native_pipeline_roundtrip_and_opj(self):
        from go_jpeg2000_tpu.native import loader
        if not loader.available():
            pytest.skip("native unavailable")
        rng = np.random.RandomState(13)
        img = _smooth(rng.randint(0, 256, size=(96, 96)).astype(
            np.float32)).astype(np.uint8)
        opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                       high_throughput=True, ht_refinement=True,
                       backend="native")
        data = jp2k.encode(img, opts)
        assert np.array_equal(jp2k.decode(data), img)
        # byte-identity with the python backend
        opts_py = Options(format=Format.J2K, lossless=True,
                          num_resolutions=3, high_throughput=True,
                          ht_refinement=True, backend="python")
        assert data == jp2k.encode(img, opts_py)
        arr, msgs = _opj_decode(data)
        assert arr is not None and np.array_equal(arr.reshape(img.shape), img)

    def test_native_lossy_ht_layers(self):
        from go_jpeg2000_tpu.native import loader
        if not loader.available():
            pytest.skip("native unavailable")
        rng = np.random.RandomState(14)
        img = _smooth(rng.randint(0, 256, size=(128, 128)).astype(
            np.float32)).astype(np.uint8)
        opts = Options(format=Format.J2K, lossless=False, quality=95,
                       num_resolutions=4, high_throughput=True,
                       ht_refinement=True, backend="native", num_layers=3,
                       compression_ratio=4.0)
        data = jp2k.encode(img, opts)
        mses = []
        for ql in (1, 3):
            dec = jp2k.decode(data, Config(quality_layers=ql))
            mses.append(float(((dec.astype(np.float64)
                                - img.astype(np.float64)) ** 2).mean()))
        assert mses[1] <= mses[0]
