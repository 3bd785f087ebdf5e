"""Differential tests: Pallas fused DWT kernel vs the jnp lifting oracle.

Runs in interpreter mode on the CPU test mesh (the compiled kernel is
exercised on real TPU by the bench/driver); bit-exactness is required.
"""
import numpy as np
import pytest

from go_jpeg2000_tpu.ops import dwt, dwt_pallas

pytestmark = pytest.mark.skipif(not dwt_pallas.HAVE_PALLAS,
                                reason="pallas unavailable")


class TestPallasDWT:
    @pytest.mark.parametrize("shape", [(1, 2, 2), (2, 64, 64), (1, 128, 256),
                                       (4, 32, 128), (3, 8, 8)])
    def test_level_matches_jnp(self, shape):
        rng = np.random.RandomState(shape[1])
        x = rng.randint(-2000, 2000, size=shape).astype(np.int32)
        ref = dwt.forward_2d(x, dwt.REV53)
        got = dwt_pallas.forward_2d_53(x, interpret=True)
        for k in ref:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(ref[k]))

    def test_multilevel_matches(self):
        rng = np.random.RandomState(9)
        x = rng.randint(-500, 500, size=(2, 64, 64)).astype(np.int32)
        p1 = dwt.decompose(x, 3, dwt.REV53)
        p2 = dwt_pallas.decompose_53(x, 3, interpret=True)
        for lev in range(3):
            for k in p1[lev]:
                np.testing.assert_array_equal(np.asarray(p2[lev][k]),
                                              np.asarray(p1[lev][k]))

    def test_usable_gating(self):
        assert dwt_pallas.usable(512, 512, 0, 0, "53")
        assert dwt_pallas.usable(512, 512, 0, 0, "97")
        assert not dwt_pallas.usable(511, 512, 0, 0, "53")   # odd size
        assert not dwt_pallas.usable(512, 512, 1, 0, "53")   # odd origin
        assert not dwt_pallas.usable(4096, 4096, 0, 0, "53")  # VMEM blowout
        assert not dwt_pallas.usable(512, 48, 0, 0, "53", levels=5)  # odd at L4

    @pytest.mark.parametrize("shape", [(1, 2, 2), (2, 64, 64), (1, 128, 256),
                                       (3, 8, 8)])
    def test_inverse53_matches_jnp(self, shape):
        rng = np.random.RandomState(shape[1] + 1)
        x = rng.randint(-2000, 2000, size=shape).astype(np.int32)
        bands = dwt.forward_2d(x, dwt.REV53)
        rec = dwt_pallas.inverse_2d_53(bands, interpret=True)
        np.testing.assert_array_equal(np.asarray(rec), x)
        ref = dwt.inverse_2d(bands, dwt.REV53)
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(ref))

    @pytest.mark.parametrize("shape", [(2, 64, 64), (1, 128, 256), (3, 8, 8)])
    def test_97_kernels_match_jnp(self, shape):
        rng = np.random.RandomState(shape[1] + 2)
        x = (rng.randn(*shape) * 100).astype(np.float32)
        ref = dwt.forward_2d(x, dwt.IRR97)
        got = dwt_pallas.forward_2d_97(x, interpret=True)
        for k in ref:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(ref[k]), rtol=1e-5,
                                       atol=1e-3)
        rec = dwt_pallas.inverse_2d_97(got, interpret=True)
        np.testing.assert_allclose(np.asarray(rec), x, rtol=1e-4, atol=0.02)

    def test_inverse_multilevel_roundtrip(self):
        rng = np.random.RandomState(11)
        x = rng.randint(-500, 500, size=(2, 64, 64)).astype(np.int32)
        pyr = dwt_pallas.decompose_53(x, 3, interpret=True)
        cur = pyr[-1]["LL"]
        for entry in reversed(pyr):
            bands = {k: entry[k] for k in ("HL", "LH", "HH")}
            bands["LL"] = cur
            cur = dwt_pallas.inverse_2d_53(bands, interpret=True)
        np.testing.assert_array_equal(np.asarray(cur), x)
