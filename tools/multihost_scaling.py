#!/usr/bin/env python
"""Multi-host scaling harness (BASELINE config 5's efficiency table).

Runs the process-decomposed encoder (parallel/multihost.py) at 1, 2 and 4
simulated hosts on one machine and reports compute-phase wall time (the
start barrier excludes child interpreter/JAX startup — real pod processes
are long-lived), plus the reduction-round count (the DCN chatter).

Host-count scaling on ONE machine is bounded by the physical cores (2 on
this rig), so the efficiency column is meaningful up to n_cores and
documents the decomposition overhead beyond it.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from go_jpeg2000_tpu.models import encoder
    from go_jpeg2000_tpu.options import Format, Options
    from go_jpeg2000_tpu.parallel import multihost

    rng = np.random.RandomState(0)
    a = rng.randint(0, 256, size=(1024, 1024)).astype(np.float32)
    for ax in (0, 1):
        a = (a + np.roll(a, 1, axis=ax)) / 2
    img = a.astype(np.uint8)
    opts = Options(format=Format.J2K, lossless=True, num_resolutions=4,
                   tile_size=(256, 256), high_throughput=True)

    ref = encoder.encode(img, opts)
    print(f"image {img.shape}, {img.size/1e6:.1f} Mpix, 16 tiles, "
          f"single-process encode -> {len(ref)} bytes")
    base = None
    for n_hosts in (1, 2, 4):
        stats = {}
        t0 = time.perf_counter()
        data = multihost.encode_multihost(img, opts, n_hosts=n_hosts,
                                          _stats=stats, warmups=1)
        total = time.perf_counter() - t0
        wall = stats.get("compute_wall_s", total)
        assert data == ref, f"n_hosts={n_hosts}: bytes diverged"
        if base is None:
            base = wall
        eff = base / (wall * n_hosts) * 100
        print(f"hosts={n_hosts}: compute {wall*1e3:7.1f} ms "
              f"({img.size/wall/1e6:6.2f} Mpix/s) "
              f"speedup {base/wall:4.2f}x  efficiency {eff:5.1f}%  "
              f"reduce rounds {stats.get('reduce_rounds', 0)}  "
              f"[byte-identical]")


if __name__ == "__main__":
    main()
