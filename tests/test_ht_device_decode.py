"""Device HT decode path (VERDICT r4 next #2): host T2+MEL/VLC control
phase (native ht_t2_parse_frames) + device MagSgn extraction fused with the
inverse DWT (ops/ht_tpu_decode.py).

The contract: decode_batch on HT streams engages the parse path and remains
pixel-exact vs both the original frames and the general decoder."""
import numpy as np
import pytest

from go_jpeg2000_tpu.models import decoder
from go_jpeg2000_tpu.models.encoder import encode_batch
from go_jpeg2000_tpu.options import Format, Options


def _nat(h, w, seed, depth=8):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 1 << depth, (h, w)).astype(np.float32)
    for ax in (0, 1):
        a = (a + np.roll(a, 1, axis=ax)) / 2
    return a.astype(np.uint8 if depth <= 8 else np.uint16)


def _native():
    from go_jpeg2000_tpu.native import loader
    return loader if loader.available() else pytest.skip("native unavailable")


def _roundtrip_device(frames, opts, expect_engage=True):
    loader = _native()
    streams = encode_batch(frames, opts)
    calls = []
    orig = loader.ht_t2_parse_frames

    def spy(*a, **k):
        r = orig(*a, **k)
        calls.append(r is not None)
        return r

    loader.ht_t2_parse_frames = spy
    try:
        decs = decoder.decode_batch(streams)
    finally:
        loader.ht_t2_parse_frames = orig
    if expect_engage:
        assert calls and all(calls), f"device parse path did not engage: {calls}"
    for d, f in zip(decs, frames):
        assert np.array_equal(d, f)
    # general (per-frame) decoder agrees
    assert np.array_equal(decoder.decode(streams[0]), frames[0])
    return decs


def test_device_decode_gray():
    frames = [_nat(96, 96, i) for i in range(3)]
    _roundtrip_device(frames, Options(format=Format.J2K, lossless=True,
                                      num_resolutions=4,
                                      high_throughput=True))


def test_device_decode_odd_dims():
    """Odd block edges: rho bits at clipped rows/cols, offset prefix sums
    must stay aligned with the host walk."""
    frames = [_nat(130, 97, i + 5) for i in range(2)]
    _roundtrip_device(frames, Options(format=Format.J2K, lossless=True,
                                      num_resolutions=3,
                                      high_throughput=True))


def test_device_decode_16bit():
    """Deep magnitudes: U up to ~18, multi-word MagSgn fields spanning
    word boundaries in the pool."""
    frames = [_nat(64, 64, i + 11, depth=16) for i in range(2)]
    _roundtrip_device(frames, Options(format=Format.J2K, lossless=True,
                                      num_resolutions=3,
                                      high_throughput=True))


def test_device_decode_rgb_mct():
    rng = np.random.RandomState(7)
    frames = [np.stack([_nat(96, 96, i), _nat(96, 96, i + 9),
                        _nat(96, 96, i + 17)], axis=-1) for i in range(2)]
    _roundtrip_device(frames, Options(format=Format.J2K, lossless=True,
                                      num_resolutions=4,
                                      high_throughput=True))


def test_device_decode_small_blocks():
    """32x32 HT blocks (config-3 small-block variant)."""
    frames = [_nat(128, 128, i + 23) for i in range(2)]
    _roundtrip_device(frames, Options(format=Format.J2K, lossless=True,
                                      num_resolutions=3,
                                      high_throughput=True,
                                      ht_block_width=32, ht_block_height=32))


def test_parse_matches_decode_frames():
    """ht_t2_parse_frames + device extraction must produce the same
    coefficients as the all-host ht_t2_decode_frames."""
    loader = _native()
    import jax.numpy as jnp
    from go_jpeg2000_tpu.codestream.parser import Parser
    from go_jpeg2000_tpu.models import fused_encode
    from go_jpeg2000_tpu.models.encoder import build_header
    from go_jpeg2000_tpu.ops import ht_tpu_decode
    from go_jpeg2000_tpu.tcd import geometry as geo

    frames = [_nat(96, 96, 31), _nat(96, 96, 32)]
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=3,
                   high_throughput=True)
    streams = encode_batch(frames, opts)
    header = build_header(frames[0], opts)
    tile = geo.build_tile(header, 0)
    plan = fused_encode.plan_for(header, tile)
    assert plan is not None
    geom = fused_encode.t2_geom(header, tile, plan)
    datas = []
    for s in streams:
        parser = Parser(s)
        hdr = parser.read_header()
        tps = parser.read_all_tile_parts(hdr)
        datas.append(b"".join(s[tp.data_start:tp.data_end] for tp in tps))
    frame_off = np.zeros(len(streams) + 1, np.int64)
    np.cumsum([len(d) for d in datas], out=frame_off[1:])
    buf = np.frombuffer(b"".join(datas), dtype=np.uint8)
    n = len(streams)
    coeffs = loader.ht_t2_decode_frames(
        buf, frame_off, n, plan.nb, geom, geom["mb"], plan.ws, plan.hs,
        plan.cbh, plan.cbw)
    parsed = loader.ht_t2_parse_frames(
        buf, frame_off, n, plan.nb, geom, geom["mb"], plan.ws, plan.hs,
        plan.cbh, plan.cbw)
    assert coeffs is not None and parsed is not None
    qinfo, pool, woff, _nw, _numbps = parsed
    blocks = np.asarray(ht_tpu_decode.magsgn_decode_blocks(
        jnp.asarray(qinfo), jnp.asarray(pool),
        jnp.asarray(woff.astype(np.int32)), plan.cbh, plan.cbw))
    assert np.array_equal(blocks.reshape(coeffs.shape), coeffs)
