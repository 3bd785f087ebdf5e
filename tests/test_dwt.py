"""DWT tests: round-trips, NumPy scalar oracle equivalence, parity handling.

Test-strategy parity with the reference (internal/dwt/dwt_test.go):
exact 5/3 round-trips, 9/7 tolerance round-trips, multi-level — plus the
odd-origin parity cases the reference doesn't support.
"""
import numpy as np
import pytest

from go_jpeg2000_tpu.ops import dwt


# --- scalar oracle: direct transcription of Annex F lifting -----------------

def _ext(arr, i):
    """Whole-sample symmetric extension index."""
    n = len(arr)
    if n == 1:
        return 0
    period = 2 * (n - 1)
    i = i % period
    if i < 0:
        i += period
    return i if i < n else period - i


def oracle_53_fwd(x, parity):
    x = list(int(v) for v in x)
    n = len(x)
    if n == 1:
        return ([], [x[0] * 2]) if parity else ([x[0]], [])
    get = lambda i: x[_ext(x, i)]
    # odd update
    for i in range(n):
        if (i + parity) % 2 == 1:
            x[i] = x[i] - ((get(i - 1) + get(i + 1)) >> 1)
    # even update
    for i in range(n):
        if (i + parity) % 2 == 0:
            x[i] = x[i] + ((get(i - 1) + get(i + 1) + 2) >> 2)
    low = [x[i] for i in range(n) if (i + parity) % 2 == 0]
    high = [x[i] for i in range(n) if (i + parity) % 2 == 1]
    return low, high


def oracle_97_fwd(x, parity):
    x = [float(v) for v in x]
    n = len(x)
    if n == 1:
        return ([], [x[0]]) if parity else ([x[0]], [])
    get = lambda i: x[_ext(x, i)]
    for coef, odd in [(dwt.ALPHA, 1), (dwt.BETA, 0), (dwt.GAMMA, 1), (dwt.DELTA, 0)]:
        for i in range(n):
            if (i + parity) % 2 == odd:
                x[i] = x[i] + coef * (get(i - 1) + get(i + 1))
    for i in range(n):
        if (i + parity) % 2 == 0:
            x[i] /= dwt.K
        else:
            x[i] *= dwt.K
    low = [x[i] for i in range(n) if (i + parity) % 2 == 0]
    high = [x[i] for i in range(n) if (i + parity) % 2 == 1]
    return low, high


class TestOracle1D:
    @pytest.mark.parametrize("n", [2, 3, 4, 5, 7, 8, 16, 17, 64, 101])
    @pytest.mark.parametrize("parity", [0, 1])
    def test_53_matches_oracle(self, n, parity):
        rng = np.random.RandomState(n * 7 + parity)
        x = rng.randint(-1000, 1000, size=n).astype(np.int32)
        low, high = dwt.forward_1d(x, dwt.REV53, parity=parity)
        olow, ohigh = oracle_53_fwd(x, parity)
        np.testing.assert_array_equal(np.asarray(low), olow)
        np.testing.assert_array_equal(np.asarray(high), ohigh)

    @pytest.mark.parametrize("n", [2, 5, 16, 33])
    @pytest.mark.parametrize("parity", [0, 1])
    def test_97_matches_oracle(self, n, parity):
        rng = np.random.RandomState(n + parity)
        x = rng.uniform(-100, 100, size=n).astype(np.float32)
        low, high = dwt.forward_1d(x, dwt.IRR97, parity=parity)
        olow, ohigh = oracle_97_fwd(x, parity)
        np.testing.assert_allclose(np.asarray(low), olow, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(high), ohigh, rtol=1e-4, atol=1e-3)

    def test_53_known_values(self):
        # Constant signal: high band must be exactly zero, low = signal.
        x = np.full(16, 100, dtype=np.int32)
        low, high = dwt.forward_1d(x, dwt.REV53)
        np.testing.assert_array_equal(np.asarray(high), 0)
        np.testing.assert_array_equal(np.asarray(low), 100)

    def test_53_ramp_high_zero(self):
        # Linear ramp is annihilated by the 5/3 high-pass (2 vanishing moments
        # pre-floor; with integer floors small residue possible — check ±1).
        x = np.arange(0, 64, dtype=np.int32) * 2
        _, high = dwt.forward_1d(x, dwt.REV53)
        assert np.abs(np.asarray(high)[:-1]).max() <= 1


class TestRoundTrip1D:
    @pytest.mark.parametrize("n", [2, 3, 4, 5, 6, 7, 8, 9, 31, 32, 33, 100, 127])
    @pytest.mark.parametrize("parity", [0, 1])
    def test_53_exact(self, n, parity):
        rng = np.random.RandomState(n * 3 + parity)
        x = rng.randint(-(2 ** 15), 2 ** 15, size=n).astype(np.int32)
        low, high = dwt.forward_1d(x, dwt.REV53, parity=parity)
        rec = dwt.inverse_1d(low, high, dwt.REV53, parity=parity)
        np.testing.assert_array_equal(np.asarray(rec), x)

    @pytest.mark.parametrize("n", [2, 3, 8, 17, 100])
    @pytest.mark.parametrize("parity", [0, 1])
    def test_97_tolerance(self, n, parity):
        rng = np.random.RandomState(n)
        x = rng.uniform(-1000, 1000, size=n).astype(np.float32)
        low, high = dwt.forward_1d(x, dwt.IRR97, parity=parity)
        rec = dwt.inverse_1d(low, high, dwt.IRR97, parity=parity)
        np.testing.assert_allclose(np.asarray(rec), x, rtol=1e-3, atol=1e-2)

    def test_single_sample(self):
        x = np.array([42], dtype=np.int32)
        low, high = dwt.forward_1d(x, dwt.REV53, parity=0)
        assert np.asarray(low)[0] == 42 and high.shape[0] == 0
        low1, high1 = dwt.forward_1d(x, dwt.REV53, parity=1)
        assert np.asarray(high1)[0] == 84 and low1.shape[0] == 0


class TestRoundTrip2D:
    @pytest.mark.parametrize("shape", [(8, 8), (7, 9), (16, 5), (1, 8), (8, 1),
                                       (33, 65), (64, 64)])
    @pytest.mark.parametrize("origin", [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)])
    def test_53_exact(self, shape, origin):
        rng = np.random.RandomState(hash(shape) % 1000)
        a = rng.randint(-(2 ** 12), 2 ** 12, size=shape).astype(np.int32)
        u0, v0 = origin
        bands = dwt.forward_2d(a, dwt.REV53, u0=u0, v0=v0)
        rec = dwt.inverse_2d(bands, dwt.REV53, u0=u0, v0=v0)
        np.testing.assert_array_equal(np.asarray(rec), a)

    @pytest.mark.parametrize("shape", [(16, 16), (31, 17)])
    def test_97_tolerance(self, shape):
        rng = np.random.RandomState(1)
        a = rng.uniform(-500, 500, size=shape).astype(np.float32)
        bands = dwt.forward_2d(a, dwt.IRR97)
        rec = dwt.inverse_2d(bands, dwt.IRR97)
        np.testing.assert_allclose(np.asarray(rec), a, rtol=1e-3, atol=0.05)

    def test_band_shapes(self):
        a = np.zeros((13, 21), dtype=np.int32)
        bands = dwt.forward_2d(a, dwt.REV53, u0=0, v0=0)
        assert bands["LL"].shape == (7, 11)
        assert bands["HL"].shape == (7, 10)
        assert bands["LH"].shape == (6, 11)
        assert bands["HH"].shape == (6, 10)
        # odd origin flips low/high split
        bands = dwt.forward_2d(a, dwt.REV53, u0=1, v0=1)
        assert bands["LL"].shape == (6, 10)
        assert bands["HH"].shape == (7, 11)


class TestMultiLevel:
    @pytest.mark.parametrize("levels", [0, 1, 2, 3, 5])
    @pytest.mark.parametrize("shape", [(64, 64), (65, 33), (100, 30)])
    def test_53_exact(self, levels, shape):
        rng = np.random.RandomState(levels)
        a = rng.randint(-(2 ** 10), 2 ** 10, size=shape).astype(np.int32)
        pyr = dwt.decompose(a, levels, dwt.REV53)
        rec = dwt.reconstruct(pyr, dwt.REV53)
        np.testing.assert_array_equal(np.asarray(rec), a)

    @pytest.mark.parametrize("levels", [1, 3])
    def test_97_tolerance(self, levels):
        rng = np.random.RandomState(9)
        a = rng.uniform(-500, 500, size=(64, 48)).astype(np.float32)
        pyr = dwt.decompose(a, levels, dwt.IRR97)
        rec = dwt.reconstruct(pyr, dwt.IRR97)
        np.testing.assert_allclose(np.asarray(rec), a, rtol=1e-3, atol=0.1)

    def test_odd_origin_multilevel(self):
        rng = np.random.RandomState(11)
        a = rng.randint(-512, 512, size=(37, 53)).astype(np.int32)
        pyr = dwt.decompose(a, 3, dwt.REV53, u0=5, v0=3)
        rec = dwt.reconstruct(pyr, dwt.REV53, u0=5, v0=3)
        np.testing.assert_array_equal(np.asarray(rec), a)

    def test_subband_shapes_match(self):
        a = np.zeros((100, 30), dtype=np.int32)
        pyr = dwt.decompose(a, 3, dwt.REV53, u0=7, v0=2)
        shapes = dwt.subband_shapes(100, 30, 3, u0=7, v0=2)
        for lev in range(3):
            for k, arr in pyr[lev].items():
                assert shapes[lev][k] == arr.shape, (lev, k)

    def test_batched_leading_axes(self):
        rng = np.random.RandomState(2)
        a = rng.randint(-100, 100, size=(4, 32, 32)).astype(np.int32)
        pyr = dwt.decompose(a, 2, dwt.REV53)
        rec = dwt.reconstruct(pyr, dwt.REV53)
        np.testing.assert_array_equal(np.asarray(rec), a)
        assert pyr[0]["HH"].shape == (4, 16, 16)
