"""Parallel chunked device->host fetch.

The remote-TPU tunnel is extremely asymmetric: h2d uploads sustain ~1.5 GB/s
while d2h fetches swing between 2 and 55 MB/s with tunnel load (r3
measurements: dispatch latency 0.06 ms, pinned_host outputs no faster, no
data-dependence).  The whole encode+decode pipeline is d2h-bound on this
platform, so every bulk fetch goes through here: `split_async` slices a flat
device array into k contiguous device chunks (one extra jitted dispatch,
~0.06 ms) and starts an independent async copy per chunk; `gather` waits and
reassembles on host.  Concurrent streams measured up to ~2x a single stream
in congested windows and neutral otherwise.

No reference analog: the reference is a single-process CPU library
(/root/reference/encoder.go) with no device boundary to cross.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np

_MIN_BYTES = 512 * 1024      # don't split below 512 KiB per stream
_STREAMS = 8


@functools.lru_cache(maxsize=512)
def _split_fn(size: int, dtype: str, k: int):
    import jax

    step = -(-size // k)
    bounds = [(i * step, min(size, (i + 1) * step)) for i in range(k)
              if i * step < size]

    def f(x):
        return tuple(jax.lax.slice_in_dim(x, b, e, axis=0)
                     for b, e in bounds)

    return jax.jit(f)


def split_async(x) -> Tuple:
    """Start a parallel d2h copy of a flat device array; returns the parts
    handle to pass to `gather`.  Host numpy arrays pass through untouched."""
    if isinstance(x, np.ndarray):
        return (x,)
    nbytes = x.size * x.dtype.itemsize
    k = int(min(_STREAMS, max(1, nbytes // _MIN_BYTES)))
    if k <= 1 or x.ndim != 1:
        if hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
        return (x,)
    parts = _split_fn(int(x.size), str(x.dtype), k)(x)
    for p in parts:
        if hasattr(p, "copy_to_host_async"):
            p.copy_to_host_async()
    return parts


def gather(parts: Sequence) -> np.ndarray:
    """Block on a `split_async` handle and reassemble the flat host array."""
    if len(parts) == 1:
        return np.asarray(parts[0])
    return np.concatenate([np.asarray(p) for p in parts])
