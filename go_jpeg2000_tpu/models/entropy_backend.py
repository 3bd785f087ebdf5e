"""Entropy backend dispatch: native (C++) batch coder vs Python oracle.

The reference parallelizes block coding with a goroutine pool
(/root/reference/encoder.go:690-742); here the batch boundary is explicit so
the native backend can thread across code-blocks, and the Python oracle stays
available for differential testing (the reference's EncodeSafe/EncodeFast5
pattern, t1.go:918-923).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..ops import t1


def _native_available() -> bool:
    try:
        from ..native import loader
        return loader.available()
    except Exception:
        return False


def encode_blocks_batch(jobs: Sequence[Tuple], backend: str = "auto"
                        ) -> List[t1.T1EncodeResult]:
    """jobs: (coeffs int32 [h,w], band_name, cb_style, mb) per block."""
    use_native = backend == "native" or (backend == "auto" and _native_available())
    if use_native:
        from ..native import loader
        return loader.encode_blocks([(j[0], j[1], j[2]) for j in jobs])
    return [t1.encode_block(j[0], j[1], cb_style=j[2]) for j in jobs]


def decode_blocks_batch(jobs: Sequence[Tuple], backend: str = "auto"
                        ) -> List[np.ndarray]:
    """jobs: (data, w, h, numbps, num_passes, band, cb_style, segment_lengths)."""
    use_native = backend == "native" or (backend == "auto" and _native_available())
    if use_native:
        from ..native import loader
        return loader.decode_blocks(jobs)
    return [t1.decode_block(*j) for j in jobs]
