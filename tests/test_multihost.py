"""Multi-host decomposition (BASELINE config 5 / SURVEY §5.8): separate OS
processes, each owning its tile subset end-to-end, pipe-based reduction
server standing in for DCN.  Bar: byte-identity with the single-process
encoder — every PCRD decision must derive from globally-reduced scalars
only."""
import numpy as np
import pytest

from go_jpeg2000_tpu.models import decoder, encoder
from go_jpeg2000_tpu.options import Format, Options
from go_jpeg2000_tpu.parallel import multihost


def _img(shape, seed=0, depth=8):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 1 << depth, size=shape).astype(np.float32)
    for ax in (0, 1):
        a = (a + np.roll(a, 1, axis=ax)) / 2
    return a.astype(np.uint8 if depth <= 8 else np.uint16)


def test_inline_host_half_matches_encoder():
    """The host-local half with the numpy reducer (n_hosts=1) reproduces
    the standard encoder exactly — the decomposition itself is lossless."""
    img = _img((128, 128), 1)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                   tile_size=(64, 64))
    data = multihost.encode_multihost(img, opts, n_hosts=1)
    assert data == encoder.encode(img, opts)
    assert np.array_equal(decoder.decode(data), img)


def test_two_processes_byte_identical_ht():
    """Two real processes, disjoint tile ownership, DCN-analog reduction:
    byte-identical to the single-process encoder (VERDICT r4 next #6);
    HT coder, so the throughput path crosses the process decomposition."""
    img = _img((128, 128, 3), 2)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                   tile_size=(64, 64), high_throughput=True)
    stats = {}
    data = multihost.encode_multihost(img, opts, n_hosts=2, _stats=stats)
    assert data == encoder.encode(img, opts)
    assert np.array_equal(decoder.decode(data), img)
    assert stats["gathered_bytes"] > 0


def test_four_processes_budgeted_pcrd():
    """Four hosts + budget: the PCRD bisection and the budget-fit loop's
    size probes reduce through the pipe server across FOUR processes
    (striped tile ownership) and still land byte-identical."""
    img = _img((128, 256), 3)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                   tile_size=(64, 64), num_layers=2, compression_ratio=6.0)
    stats = {}
    data = multihost.encode_multihost(img, opts, n_hosts=4, _stats=stats)
    assert data == encoder.encode(img, opts)
    # the bisection + size probes actually crossed the process boundary
    assert stats["reduce_rounds"] >= 50
    dec = decoder.decode(data)
    assert dec.shape == img.shape


def test_two_processes_byte_identical_lossy97():
    """Lossy 9/7 through the process decomposition: per-host device
    transforms + host entropy are the SAME per-tile programs the
    single-process encoder runs, so even the float32 path must land
    byte-identical — including a budgeted encode whose PCRD bisection
    and size probes reduce across the two processes."""
    img = _img((128, 128, 3), 9)
    opts = Options(format=Format.J2K, lossless=False, quality=85,
                   num_resolutions=3, tile_size=(64, 64),
                   high_throughput=True)
    data = multihost.encode_multihost(img, opts, n_hosts=2)
    assert data == encoder.encode(img, opts)
    opts_b = Options(format=Format.J2K, lossless=False, num_resolutions=3,
                     tile_size=(64, 64), num_layers=2,
                     compression_ratio=12.0, high_throughput=True)
    data_b = multihost.encode_multihost(img, opts_b, n_hosts=2)
    assert data_b == encoder.encode(img, opts_b)
    out = multihost.decode_multihost(data, n_hosts=2)
    assert np.array_equal(out, decoder.decode(data))


def test_decode_multihost_pixel_identical():
    """Decode decomposition: two processes each run the full per-tile chain
    for their tiles (no reductions — tiles are independent), host 0
    gathers pixels.  Pixel-identical to the single-process decoder."""
    img = _img((128, 128, 3), 6)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                   tile_size=(64, 64), high_throughput=True)
    data = encoder.encode(img, opts)
    out = multihost.decode_multihost(data, n_hosts=2)
    assert np.array_equal(out, decoder.decode(data))
    assert np.array_equal(out, img)
    # inline 1-host path too
    assert np.array_equal(multihost.decode_multihost(data, n_hosts=1), img)


def test_multihost_gates():
    img = _img((64, 64), 5)
    with pytest.raises(ValueError):
        multihost.encode_multihost(
            img, Options(lossless=True, enable_ppm=True), n_hosts=2)
