#!/usr/bin/env python
"""Benchmark: prints ONE JSON line {metric, value, unit, vs_baseline}.

Primary metric (BASELINE.md): Mpixels/s/chip, encode+decode, config 1
(512x512 8-bit grayscale, single tile, lossless 5/3, 1 layer, LRCP, 64x64
code-blocks, J2K).  vs_baseline is the fraction of the 1 Gpixel/s north-star
target (BASELINE.json).

Runs on whatever jax backend the environment provides (TPU under the driver,
CPU elsewhere); the transform stage runs on device, entropy on host threads.
"""
from __future__ import annotations

import json
import time

import numpy as np


def natural_image(h, w, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w)).astype(np.float32)
    for ax in (0, 1):
        a = (a + np.roll(a, 1, axis=ax) + np.roll(a, -1, axis=ax)) / 3
    return a.astype(np.uint8)


def main():
    import go_jpeg2000_tpu as jp2k
    from go_jpeg2000_tpu.models.encoder import encode_batch
    from go_jpeg2000_tpu.models.decoder import decode_batch
    from go_jpeg2000_tpu.options import Format, Options

    frames = [natural_image(512, 512, seed=i) for i in range(8)]
    # HTJ2K path: the high-throughput block coder is the production
    # throughput configuration (BASELINE.md config 3; still lossless 5/3).
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=6,
                   high_throughput=True, backend="auto")

    # warm-up (jit compile, native build)
    outs = encode_batch(frames, opts)
    decs = decode_batch(outs)
    assert np.array_equal(decs[0], frames[0]), "lossless round-trip must be bit-exact"

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = encode_batch(frames, opts)
    t_enc = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    for _ in range(iters):
        decs = decode_batch(outs)
    t_dec = (time.perf_counter() - t0) / iters
    assert all(np.array_equal(d, f) for d, f in zip(decs, frames))

    pixels = sum(f.size for f in frames)
    value = (2 * pixels) / (t_enc + t_dec) / 1e6   # Mpix/s, enc+dec combined
    print(json.dumps({
        "metric": "mpixels_per_s_per_chip_encdec_lossless53_512",
        "value": round(value, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(value / 1000.0, 6),
    }))


if __name__ == "__main__":
    main()
