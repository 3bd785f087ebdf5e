"""End-to-end sharded encode pipeline on the virtual 8-device CPU mesh.

BASELINE configs 4/5: tiles shard over 'dp', rows over 'sp' (ppermute halo
exchange), per-shard host entropy, DISTRIBUTED PCRD via mesh psum/pmax
collectives (rate.assign_layers_sharded + MeshComm), Tier-2 on host.  The
bar: output byte-identical to the single-device encoder, and the stream
decodes pixel-exact.  (The reference's only parallelism is a goroutine
pool, /root/reference/encoder.go:690-742.)
"""
import numpy as np
import pytest

import jax

from go_jpeg2000_tpu.models import decoder, encoder
from go_jpeg2000_tpu.options import Config, Format, Options
from go_jpeg2000_tpu.parallel import mesh as pmesh
from go_jpeg2000_tpu.parallel import sharded


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8)


def _img(shape, seed=0, depth=8):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 1 << depth, size=shape).astype(np.float32)
    for ax in (0, 1):
        a = (a + np.roll(a, 1, axis=ax)) / 2
    return a.astype(np.uint8 if depth <= 8 else np.uint16)


def test_sharded_lossless_byte_identical(mesh8):
    img = _img((128, 128, 3), 1)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                   tile_size=(64, 64))
    data = sharded.encode_sharded(img, mesh8, opts)
    assert data == encoder.encode(img, opts)
    assert np.array_equal(decoder.decode(data), img)


def test_sharded_16bit_mct_config4(mesh8):
    """Config-4 semantics: multi-tile 16-bit + MCT, tiles over dp."""
    img = _img((128, 128, 3), 2, depth=16)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                   tile_size=(64, 64))
    data = sharded.encode_sharded(img, mesh8, opts)
    assert data == encoder.encode(img, opts)
    assert np.array_equal(decoder.decode(data), img)


def test_sharded_distributed_pcrd(mesh8):
    """Budget + layers: the psum-bisection threshold must reproduce the
    local PCRD byte-for-byte, and the budget must actually bind."""
    img = _img((128, 128), 3)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                   tile_size=(64, 64), num_layers=3, compression_ratio=8.0)
    data = sharded.encode_sharded(img, mesh8, opts)
    assert data == encoder.encode(img, opts)
    assert len(data) <= img.size // 8 + 512
    dec = decoder.decode(data)
    assert dec.shape == img.shape
    # more layers -> monotonically decreasing error
    m = []
    for ql in (1, 3):
        d = decoder.decode(data, Config(quality_layers=ql))
        m.append(float(((d.astype(np.float64) - img) ** 2).mean()))
    assert m[1] <= m[0]


def test_sharded_single_tile(mesh8):
    """One big tile: dp shards idle on tiles, sp carries the DWT."""
    img = _img((128, 64), 4)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3)
    data = sharded.encode_sharded(img, mesh8, opts)
    assert data == encoder.encode(img, opts)
    assert np.array_equal(decoder.decode(data), img)


def test_sharded_gates(mesh8):
    img = _img((64, 64), 5)
    with pytest.raises(ValueError):
        # no decomposition levels: nothing to shard over 'sp'
        sharded.encode_sharded(
            img, mesh8, Options(lossless=True, num_resolutions=1))
    with pytest.raises(ValueError):
        # tile height 12 not divisible by sp * 2^levels (and origins not
        # divisible by 2^levels)
        sharded.encode_sharded(
            img, mesh8, Options(lossless=True, num_resolutions=3,
                                tile_size=(8, 12)))


def test_meshcomm_reductions(mesh8):
    comm = sharded.MeshComm(mesh8)
    v = np.arange(1.0, 9.0)
    assert comm(v, "sum") == float(v.sum())
    assert comm(v, "max") == 8.0
    assert comm(v, "min") == 1.0
    assert comm(v[:4], "sum") == float(v[:4].sum())
    assert comm(v[:4], "max") == 4.0
    assert comm(v[:4], "min") == 1.0


def test_meshcomm_exact_beyond_f32(mesh8):
    """ADVICE r4 #1: byte totals above 2^24 and slope extrema must reduce
    EXACTLY (f64), not through a silent f32 cast — integer-limb psums and
    sortable-key pmax/pmin carry the full double precision."""
    comm = sharded.MeshComm(mesh8)
    # integer sums way past the f32 24-bit mantissa (odd values -> any
    # rounding is detectable), up to the 2^53 f64-integer range
    big = np.asarray([(1 << 30) + 1, (1 << 42) + 3, 5, (1 << 50) + 7,
                      0, 1, (1 << 24) + 1, (1 << 33) + 9], np.float64)
    assert comm(big, "sum") == float(int(big.sum()))
    # max/min must distinguish values that collide after f32 rounding
    a = 1.0 + 2.0 ** -40
    b = 1.0 + 2.0 ** -41
    v = np.asarray([b, a, b, b, b, b, b, b])
    assert comm(v, "max") == a
    assert comm(v, "min") == b
    neg = -v
    assert comm(neg, "min") == -a
    assert comm(neg, "max") == -b
    # inf fills for short vectors keep working
    assert comm(v[:3], "max") == a
    assert comm(np.asarray([3.5]), "min") == 3.5
    with pytest.raises(ValueError):
        comm(np.asarray([1.5, 2.0]), "sum")


def test_sharded_ht_device_entropy(mesh8):
    """VERDICT r4 next #1: the sharded HT path must run its entropy through
    the DEVICE field kernel (multi-tile plans incl. offset code-block
    grids), byte-identical to the single-device encoder and pixel-exact."""
    from go_jpeg2000_tpu.parallel import sharded as sh

    for shape, seed in (((128, 128, 3), 21), ((128, 192), 22)):
        img = _img(shape, seed)
        opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                       tile_size=(64, 64), high_throughput=True)
        # the device path must actually engage (not silently fall back)
        from go_jpeg2000_tpu.codestream.header import Header
        from go_jpeg2000_tpu.models import encoder as enc
        hdr = enc.build_header(np.asarray(img), opts)
        calls = []
        orig = sh._device_ht_entropy

        def spy(*a, **kw):
            r = orig(*a, **kw)
            calls.append(r is not None)
            return r

        sh._device_ht_entropy = spy
        try:
            data = sh.encode_sharded(img, mesh8, opts)
        finally:
            sh._device_ht_entropy = orig
        assert calls == [True], "device HT entropy did not engage"
        assert data == encoder.encode(img, opts)
        assert np.array_equal(decoder.decode(data), img)


def test_sharded_ht_16bit_mct_device_entropy(mesh8):
    """Config-4 semantics through the device entropy kernel: multi-tile
    16-bit RGB + RCT."""
    img = _img((128, 128, 3), 23, depth=16)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                   tile_size=(64, 64), high_throughput=True)
    data = sharded.encode_sharded(img, mesh8, opts)
    assert data == encoder.encode(img, opts)
    assert np.array_equal(decoder.decode(data), img)


def test_sharded_decode_matches_single(mesh8):
    """decode_sharded: host entropy per shard + ONE mesh-sharded inverse
    (halo-exchange IDWT) must be pixel-identical to decoder.decode."""
    img = _img((128, 128, 3), 6)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                   tile_size=(64, 64))
    data = encoder.encode(img, opts)
    out = sharded.decode_sharded(data, mesh8)
    assert np.array_equal(out, decoder.decode(data))
    assert np.array_equal(out, img)


def test_sharded_ht_device_decode(mesh8):
    """decode_sharded's device entropy (the decode twin of
    test_sharded_ht_device_entropy): HT streams route through the native
    control-phase parse + device MagSgn kernel, leaves staying on device,
    and remain pixel-identical to the host paths."""
    from go_jpeg2000_tpu.parallel import sharded as sh

    for shape, seed in (((128, 128, 3), 31), ((128, 192), 32)):
        img = _img(shape, seed)
        opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                       tile_size=(64, 64), high_throughput=True)
        data = encoder.encode(img, opts)
        calls = []
        orig = sh._device_ht_decode

        def spy(*a, **kw):
            r = orig(*a, **kw)
            calls.append(r is not None)
            return r

        sh._device_ht_decode = spy
        try:
            out = sh.decode_sharded(data, mesh8)
        finally:
            sh._device_ht_decode = orig
        assert calls == [True], "device HT decode did not engage"
        assert np.array_equal(out, img)
        assert np.array_equal(out, decoder.decode(data))


def test_sharded_ht_device_decode_16bit(mesh8):
    img = _img((128, 128, 3), 33, depth=16)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                   tile_size=(64, 64), high_throughput=True)
    data = sharded.encode_sharded(img, mesh8, opts)
    out = sharded.decode_sharded(data, mesh8)
    assert np.array_equal(out, img)


def test_sharded_roundtrip_both_directions(mesh8):
    """encode_sharded -> decode_sharded end-to-end on the mesh."""
    img = _img((128, 64), 7, depth=16)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                   tile_size=(64, 64))
    data = sharded.encode_sharded(img, mesh8, opts)
    out = sharded.decode_sharded(data, mesh8)
    assert np.array_equal(out, img)


def test_sharded_decode_missing_tile_zero_fills(mesh8):
    """A codestream missing one tile's tile-parts decodes with that area
    zero-filled (matching _decode_tiles), not IndexError (ADVICE r4 #4)."""
    from go_jpeg2000_tpu.codestream.parser import Parser
    img = _img((64, 128), 9)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                   tile_size=(64, 64))
    data = encoder.encode(img, opts)
    parser = Parser(data)
    header = parser.read_header()
    tps = parser.read_all_tile_parts(header)
    drop = next(tp for tp in tps if tp.tile_index == 1)
    # SOT marker sits 12 bytes + SOD(2) before data_start
    sot_pos = data.rfind(b"\xff\x90", 0, drop.data_start)
    stripped = data[:sot_pos] + data[drop.data_end:]
    out = sharded.decode_sharded(stripped, mesh8)
    full = decoder.decode(stripped)
    assert np.array_equal(out, full)
    assert np.array_equal(out[:, :64], img[:, :64])
    assert not np.array_equal(out[:, 64:], img[:, 64:])


def _psnr(x, y):
    mse = np.mean((x.astype(np.float64) - y.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse else 99.0


def test_sharded_lossy97_ht_device_paths(mesh8):
    """Lossy 9/7 through the SHARDED pipeline (closes VERDICT r4 weak #6's
    'lossless 5/3 only' gate): device ICT + sharded 9/7 DWT + on-device
    deadzone quant + device HT entropy on encode; device MagSgn + midpoint
    dequant + sharded inverse 9/7 on decode.

    Byte-identity with the single-device encoder is NOT asserted (float32
    DWT ulps legitimately differ between differently-shaped XLA programs —
    same contract as tests/test_lossy_fused.py); the bars are engagement,
    conformance, and quality parity."""
    from go_jpeg2000_tpu.parallel import sharded as sh

    img = _img((128, 128, 3), 31)
    opts = Options(format=Format.J2K, lossless=False, quality=85,
                   num_resolutions=3, tile_size=(64, 64),
                   high_throughput=True)
    calls = []
    orig = sh._device_ht_entropy

    def spy(*a, **kw):
        r = orig(*a, **kw)
        calls.append(r is not None)
        return r

    sh._device_ht_entropy = spy
    try:
        data = sh.encode_sharded(img, mesh8, opts)
    finally:
        sh._device_ht_entropy = orig
    assert calls == [True], "device HT entropy did not engage for lossy"

    dec_sh = decoder.decode(data)
    dec_si = decoder.decode(encoder.encode(img, opts))
    assert abs(_psnr(dec_sh, img) - _psnr(dec_si, img)) <= 0.05

    # sharded decode (device MagSgn + dequant + sharded inverse 9/7)
    dcalls = []
    dorig = sh._device_ht_decode

    def dspy(*a, **kw):
        r = dorig(*a, **kw)
        dcalls.append(r is not None)
        return r

    sh._device_ht_decode = dspy
    try:
        out = sh.decode_sharded(data, mesh8)
    finally:
        sh._device_ht_decode = dorig
    assert dcalls == [True], "device HT decode did not engage for lossy"
    assert np.max(np.abs(out.astype(np.int32) - dec_sh.astype(np.int32))) <= 1


def test_sharded_lossy97_16bit_mct(mesh8):
    """Config-4's bit depth through the lossy sharded path: 16-bit RGB +
    ICT + 9/7 + device quant, decoded both ways."""
    img = _img((128, 128, 3), 33, depth=16)
    opts = Options(format=Format.J2K, lossless=False, quality=85,
                   num_resolutions=3, tile_size=(64, 64),
                   high_throughput=True)
    data = sharded.encode_sharded(img, mesh8, opts)
    dec_g = decoder.decode(data)
    dec_si = decoder.decode(encoder.encode(img, opts))

    def psnr16(x):
        mse = np.mean((x.astype(np.float64) - img) ** 2)
        return 10 * np.log10(65535.0 ** 2 / mse) if mse else 199.0

    assert abs(psnr16(dec_g) - psnr16(dec_si)) <= 0.05
    out = sharded.decode_sharded(data, mesh8)
    assert np.max(np.abs(out.astype(np.int64)
                         - dec_g.astype(np.int64))) <= 1


def test_sharded_lossy97_ebcot_host_fallback(mesh8):
    """Lossy non-HT (EBCOT) through the sharded pipeline: host entropy per
    dp-shard over the mesh-computed 9/7 pyramid; decode_sharded exercises
    the host-T1 fallback + float32 leaves + sharded inverse 9/7."""
    img = _img((128, 128), 32)
    opts = Options(format=Format.J2K, lossless=False, quality=85,
                   num_resolutions=3, tile_size=(64, 64),
                   high_throughput=False)
    data = sharded.encode_sharded(img, mesh8, opts)
    dec_g = decoder.decode(data)
    dec_si = decoder.decode(encoder.encode(img, opts))
    assert abs(_psnr(dec_g, img) - _psnr(dec_si, img)) <= 0.05
    out = sharded.decode_sharded(data, mesh8)
    assert np.max(np.abs(out.astype(np.int32) - dec_g.astype(np.int32))) <= 1


def test_sharded_decode_gates(mesh8):
    img = _img((64, 64), 8)
    # a stream with no decomposition levels has nothing to shard over 'sp'
    flat = encoder.encode(img, Options(format=Format.J2K, lossless=True,
                                       num_resolutions=1))
    with pytest.raises(ValueError):
        sharded.decode_sharded(flat, mesh8)
    # reduced/windowed decodes must be REFUSED, not silently full-size
    ok = encoder.encode(img, Options(format=Format.J2K, lossless=True,
                                     num_resolutions=3))
    with pytest.raises(ValueError):
        sharded.decode_sharded(ok, mesh8, Config(reduce_resolution=1))
    with pytest.raises(ValueError):
        sharded.decode_sharded(ok, mesh8, Config(decode_area=(0, 0, 32, 32)))
