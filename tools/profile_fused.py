#!/usr/bin/env python
"""Fine-grained stage profile of the FUSED encode/decode paths (the bench
path), on whatever device the environment provides.

Usage: python tools/profile_fused.py [H] [N_FRAMES] [CHUNK]
"""
from __future__ import annotations

import os
import sys
import time
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def natural_image(h, w, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w)).astype(np.float32)
    for ax in (0, 1):
        a = (a + np.roll(a, 1, axis=ax) + np.roll(a, -1, axis=ax)) / 3
    return a.astype(np.uint8)


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import go_jpeg2000_tpu.models.encoder as enc_mod
    from go_jpeg2000_tpu.models import fused_encode
    from go_jpeg2000_tpu.models.encoder import encode_batch, build_header
    from go_jpeg2000_tpu.models.decoder import decode_batch
    from go_jpeg2000_tpu.options import Format, Options
    from go_jpeg2000_tpu.tcd import geometry as geo
    from go_jpeg2000_tpu.native import loader

    frames = [natural_image(H, H, seed=i) for i in range(N)]
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=6,
                   high_throughput=True, backend="auto")

    # warm-up (jit compile)
    outs = encode_batch(frames, opts)
    decs = decode_batch(outs)
    assert np.array_equal(decs[0], frames[0])

    header = build_header(frames[0], opts)
    from go_jpeg2000_tpu.models.encoder import component_quant
    precision = header.components[0].precision
    signed = header.components[0].signed
    header.quantization = component_quant(header, opts, 0, precision)
    tile = geo.build_tile(header, 0)
    plan = fused_encode.plan_for(header, tile)
    assert plan is not None
    nl0 = tile.comps[0].coding.num_decompositions
    batch = np.stack([f[None] for f in frames])

    def timeit(fn, iters=3):
        fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        return (time.perf_counter() - t0) / iters

    pix = N * H * H / 1e6

    # --- stage: device dispatch+sync (transform + HT fields + compaction) ---
    def stage_device():
        hs = [fused_encode.dispatch(batch[s:s + CHUNK], nl0, False,
                                    precision, signed, plan)
              for s in range(0, N, CHUNK)]
        for d in hs:
            [p.block_until_ready() for p in d.out]
    t_dev = timeit(stage_device)

    # --- stage: device + d2h fetch ---
    raws = []

    def stage_fetch():
        raws.clear()
        hs = [fused_encode.dispatch(batch[s:s + CHUNK], nl0, False,
                                    precision, signed, plan)
              for s in range(0, N, CHUNK)]
        for d in hs:
            from go_jpeg2000_tpu.utils import fetch as _f; raws.append((d, _f.gather(d.out)))
    t_fetch = timeit(stage_fetch)

    # --- stage: full fused encode (incl. native serialize + T2 + wrap) ---
    def stage_encode():
        return encode_batch(frames, opts)
    t_enc = timeit(stage_encode)

    # --- native serialize+T2 alone, on prefetched raw ---
    geom = fused_encode.t2_geom(header, tile, plan)

    def stage_native():
        from go_jpeg2000_tpu.ops import ht_tpu
        for d, raw in raws:
            n = d.n
            cap_ms, cap_vlc, cap_mel = d.caps
            nmeta = 6 * plan.nb * n
            meta = raw[:nmeta].view(np.int32).reshape(6, plan.nb * n)
            pool = raw[nmeta:]
            ms_bits, vlc_bits, mel_bits, numbps = meta[0], meta[1], meta[2], meta[3]
            ms_off, ms_nw, _ = ht_tpu.pool_offsets(ms_bits, 0, cap_ms)
            vlc_off, vlc_nw, _ = ht_tpu.pool_offsets(vlc_bits, cap_ms, cap_vlc)
            mel_off, mel_nw, _ = ht_tpu.pool_offsets(mel_bits, cap_ms + cap_vlc, cap_mel)
            mb = np.tile(geom["mb"], n)
            zbp = np.where(numbps > 0, mb - 1, mb).astype(np.int32)
            loader.ht_t2_encode_frames(
                pool, ms_off, ms_nw, ms_bits, vlc_off, vlc_nw, vlc_bits,
                mel_off, mel_nw, mel_bits, numbps.astype(np.int32), zbp,
                n, plan.nb, geom)
    t_native = timeit(stage_native)

    # --- decode stages ---
    outs = encode_batch(frames, opts)

    def stage_decode():
        return decode_batch(outs)
    t_dec = timeit(stage_decode)

    # native T2 decode alone
    from go_jpeg2000_tpu.codestream.parser import Parser

    parsed = []
    for s in outs:
        parser = Parser(s)
        hdr_i = parser.read_header()
        tps = parser.read_all_tile_parts(hdr_i)
        parsed.append((hdr_i, tps, s))

    def stage_t2dec():
        for st in range(0, N, CHUNK):
            group = parsed[st:st + CHUNK]
            datas = [b"".join(c[tp.data_start:tp.data_end] for tp in tps)
                     for (_h, tps, c) in group]
            frame_off = np.zeros(len(group) + 1, np.int64)
            np.cumsum([len(d) for d in datas], out=frame_off[1:])
            buf = np.frombuffer(b"".join(datas), dtype=np.uint8)
            loader.ht_t2_decode_frames(
                buf, frame_off, len(group), plan.nb, geom,
                geom["mb"], plan.ws, plan.hs, plan.cbh, plan.cbw)
    t_t2dec = timeit(stage_t2dec)

    print(f"frames={N}x{H}x{H} ({pix:.2f} Mpix) chunk={CHUNK} "
          f"nb={plan.nb} blocks/frame")
    rows = [
        ("enc.device(dispatch+sync)", t_dev),
        ("enc.device+fetch", t_fetch),
        ("enc.fetch(d2h only)", t_fetch - t_dev),
        ("enc.native(ser+T2)", t_native),
        ("enc.total", t_enc),
        ("enc.other", t_enc - t_fetch - t_native),
        ("dec.native(T2+HT)", t_t2dec),
        ("dec.total", t_dec),
        ("encdec.total", t_enc + t_dec),
    ]
    for k, v in rows:
        print(f"{k:28s} {v*1000:9.1f} ms  {pix/v:9.1f} Mpix/s")
    print(f"bench metric (2*pix/(enc+dec)): "
          f"{2*pix/(t_enc+t_dec):.1f} Mpix/s")


if __name__ == "__main__":
    main()
