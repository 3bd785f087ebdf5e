"""Differential tests: TPU HT cleanup field kernel (ops/ht_tpu.py) vs the
OpenJPEG-validated Python oracle (ops/ht.py), via both the Python and the
native C++ serializer.  The kernel must be bit-identical — same guarantee the
reference gives for its fast-vs-safe encoder pair (t1.go:918-923)."""
import numpy as np
import pytest

from go_jpeg2000_tpu.ops import ht, ht_tpu


def _cases(seed=0):
    rng = np.random.RandomState(seed)
    cases = []
    for shape in [(4, 4), (8, 8), (16, 16), (6, 10), (2, 4), (32, 8),
                  (12, 4), (2, 2), (10, 6), (64, 48)]:
        for sparsity in (0.0, 0.7, 0.95, 1.0):
            for mag in (1, 200, 4000):
                c = rng.randint(-mag, mag + 1, size=shape).astype(np.int32)
                c[rng.rand(*shape) < sparsity] = 0
                cases.append(c)
    cases.append(np.zeros((8, 8), np.int32))
    return cases


def test_fields_kernel_bit_identical_python_serializer():
    cases = _cases()
    outs = ht_tpu.encode_cleanup_blocks(cases, max_mn=16)
    for c, (seg, nb, um) in zip(cases, outs):
        rseg, rnb, rum = ht.encode_cleanup(c)
        assert (seg, nb, um) == (rseg, rnb, rum), c.shape


def test_fields_kernel_bit_identical_native_serializer():
    from go_jpeg2000_tpu.native import loader
    if not loader.available():
        pytest.skip("native backend unavailable")
    cases = _cases(seed=1)
    hmax = max(b.shape[0] for b in cases)
    wmax = max(b.shape[1] for b in cases)
    hmax += hmax & 1
    wmax += wmax & 1
    nb = len(cases)
    arr = np.zeros((nb, hmax, wmax), np.int32)
    hs = np.zeros(nb, np.int32)
    ws = np.zeros(nb, np.int32)
    for i, b in enumerate(cases):
        arr[i, :b.shape[0], :b.shape[1]] = b
        hs[i], ws[i] = b.shape
    out = {k: np.asarray(v)
           for k, v in ht_tpu.cleanup_fields(arr, hs, ws, 16).items()}
    mw = out["ms_words"].shape[1]
    vw = out["vlc_words"].shape[1]
    ew = out["mel_words"].shape[1]
    words = np.concatenate([out["ms_words"].ravel(), out["vlc_words"].ravel(),
                            out["mel_words"].ravel()]).astype(np.uint32)
    base_v = nb * mw
    base_e = base_v + nb * vw
    idx = np.arange(nb, dtype=np.int64)
    segs = loader.ht_serialize_blocks(
        words,
        idx * mw, np.full(nb, mw, np.int64), out["ms_bits"],
        base_v + idx * vw, np.full(nb, vw, np.int64), out["vlc_bits"],
        base_e + idx * ew, np.full(nb, ew, np.int64), out["mel_bits"],
        out["numbps"])
    for i, c in enumerate(cases):
        rseg, _, _ = ht.encode_cleanup(c)
        assert segs[i] == rseg, (i, c.shape)


def test_roundtrip_through_decoder():
    cases = _cases(seed=2)[:40]
    outs = ht_tpu.encode_cleanup_blocks(cases, max_mn=16)
    for c, (seg, nb, um) in zip(cases, outs):
        h, w = c.shape
        dec = ht.decode_cleanup(seg, w, h, nb)
        assert np.array_equal(dec, c)
