"""go_jpeg2000_tpu — TPU-native JPEG 2000 + HTJ2K engine (JAX/XLA/Pallas).

A from-scratch implementation of ISO/IEC 15444-1 (JPEG 2000 core) and
15444-15 (HTJ2K) with the capabilities of the reference Go library
(mrjoshuak/go-jpeg2000), redesigned TPU-first:

- device (jnp/Pallas): MCT, colorspace, 5/3 + 9/7 lifting DWT, quantization,
  bitplane/significance compute
- host (Python/C++): codestream syntax, Tier-2 packets, entropy backends
- parallel: tile sharding over a jax.sharding.Mesh with halo exchange

Public API (parity with /root/reference/jpeg2000.go:318-342):
    encode(image, options) -> bytes
    decode(data, config) -> np.ndarray
    decode_metadata(data) -> Metadata
"""

import os as _os

# Persistent XLA compilation cache: fused pipeline programs take ~1-2 min to
# compile through the remote-TPU tunnel; caching makes every later process
# reuse them.  Opt out by setting JAX_COMPILATION_CACHE_DIR="".
# CPU is deliberately EXCLUDED: cached CPU AOT executables are machine-
# feature-specific, and loading one compiled on a different host stalls or
# SIGILLs (observed r5: a cache read inside jit hung a CPU test run for
# >30 min; the loader itself warns "could lead to execution errors").
try:
    import jax as _jax
    _plat = _os.environ.get("JAX_PLATFORMS", "").lower()
    if ("JAX_COMPILATION_CACHE_DIR" not in _os.environ
            and not _plat.startswith("cpu")):
        _cache = _os.path.expanduser("~/.cache/jax_comp")
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from .options import (ColorSpace, Config, Format, Metadata, Options, Profile,
                      ProgressionOrder, default_options)
from .models.encoder import encode
from .models.decoder import decode, decode_metadata, DecodeError
from .utils.metrics import counters

__version__ = "0.1.0"

__all__ = [
    "encode", "decode", "decode_metadata", "DecodeError",
    "Options", "Config", "Metadata", "Format", "Profile",
    "ProgressionOrder", "ColorSpace", "default_options", "counters",
]
