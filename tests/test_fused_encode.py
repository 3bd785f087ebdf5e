"""Differential tests for the fully fused device encode path
(models/fused_encode.py): its codestreams must be byte-identical to the host
entropy path (the reference's EncodeSafe-vs-fast pattern, t1.go:918-923)."""
import numpy as np
import pytest

import go_jpeg2000_tpu as jp2k
from go_jpeg2000_tpu.models import fused_encode
from go_jpeg2000_tpu.models.encoder import encode_batch, build_header
from go_jpeg2000_tpu.models.decoder import decode_batch
from go_jpeg2000_tpu.options import Format, Options
from go_jpeg2000_tpu.tcd import geometry as geo


def _imgs(n, h, w, seed=0, smooth=True):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        a = rng.randint(0, 256, size=(h, w)).astype(np.float32)
        if smooth:
            for ax in (0, 1):
                a = (a + np.roll(a, 1, axis=ax) + np.roll(a, -1, axis=ax)) / 3
        out.append(a.astype(np.uint8))
    return out


OPTS = dict(format=Format.J2K, lossless=True, high_throughput=True,
            num_resolutions=6)


def _native_ok():
    try:
        from go_jpeg2000_tpu.native import loader
        return loader.available()
    except Exception:
        return False


needs_native = pytest.mark.skipif(not _native_ok(),
                                  reason="native backend unavailable")


@needs_native
def test_plan_eligibility():
    o = Options(**OPTS)
    img = _imgs(1, 128, 128)[0]
    header = build_header(img, o)
    tile = geo.build_tile(header, 0)
    plan = fused_encode.plan_for(header, tile)
    assert plan is not None
    # total blocks match geometry walk
    n_geo = sum(len(p.code_blocks) for tc in tile.comps
                for r in tc.resolutions for b in r.bands
                for p in b.precincts)
    assert plan.nb == n_geo


@needs_native
@pytest.mark.parametrize("shape", [(128, 128), (96, 80), (256, 256)])
def test_fused_matches_host_path(shape):
    h, w = shape
    frames = _imgs(3, h, w, seed=1)
    o = Options(**OPTS)
    fused = encode_batch(frames, o)
    host = [jp2k.encode(f, o) for f in frames]
    assert all(a == b for a, b in zip(fused, host))
    decs = decode_batch(fused)
    assert all(np.array_equal(d, f) for d, f in zip(decs, frames))


@needs_native
def test_fused_rgb_mct():
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (64, 96, 3), np.uint8) for _ in range(2)]
    o = Options(**OPTS)
    fused = encode_batch(frames, o)
    host = [jp2k.encode(f, o) for f in frames]
    assert all(a == b for a, b in zip(fused, host))


@needs_native
def test_fused_noise_no_overflow_or_fallback():
    # pure noise is near-incompressible; path must either serialize
    # correctly or fall back — output must match the host path either way
    frames = _imgs(2, 128, 128, seed=7, smooth=False)
    o = Options(**OPTS)
    fused = encode_batch(frames, o)
    host = [jp2k.encode(f, o) for f in frames]
    assert all(a == b for a, b in zip(fused, host))


@needs_native
def test_fused_multi_layer():
    frames = _imgs(2, 128, 128, seed=5)
    o = Options(num_layers=3, **OPTS)
    fused = encode_batch(frames, o)
    host = [jp2k.encode(f, o) for f in frames]
    assert all(a == b for a, b in zip(fused, host))
