"""Device-link environment probe: pick entropy-path compositions by the
MEASURED host<->device link, not by platform name alone.

The r4 hardware ablation (tools/ablate_ebcot.py, PROFILE.md "EBCOT paths")
showed the fastest EBCOT composition depends on the d2h link:

  - tunnel-class links (the axon remote-TPU proxy, 0.2-55 MB/s): path C —
    device transform + host C++ T1 over compressed int16 coefficients —
    measured 3.0 Mpix/s vs 2.3 (all-device) and 1.2 (hybrid, drowned by
    13 MB/Mpix decision-stream fetch);
  - local-PCIe links (>= GB/s): path B — device decision kernel + host MQ
    over the fetched decision streams (device half 7.1 Mpix/s overlapped
    with 18.3 Mpix/s/2-core host MQ) — wins and scales with host cores.

`backend="auto"` consults :func:`preferred_ebcot_path` once per process;
`backend="device"` always forces the all-device kernel (path A).

The reference has no analog: it is a single-process CPU library whose only
environment sensitivity is GOMAXPROCS=1 forcing sequential encode
(/root/reference/encoder.go:676-677).
"""
from __future__ import annotations

import logging
import os
import time
from typing import Optional

log = logging.getLogger("go_jpeg2000_tpu")

_PCIE_MBPS = 500.0          # below this the d2h link is "tunnel-class"
_PROBE_BYTES = 4 << 20

_cache: dict = {}


def _is_tunnel_platform() -> bool:
    """The axon remote-TPU proxy announces itself via JAX_PLATFORMS; its
    link swings 0.2-55 MB/s, so no probe is needed (and a probe on a
    congested window could cost seconds)."""
    return "axon" in os.environ.get("JAX_PLATFORMS", "").lower()


def d2h_mbps(force_probe: bool = False) -> float:
    """Measured (or inferred) device->host bandwidth in MB/s, cached per
    process.  Random payload: compressing tunnels overstate zero-filled
    probes 3-10x."""
    if "d2h" in _cache and not force_probe:
        return _cache["d2h"]
    if _is_tunnel_platform() and not force_probe:
        _cache["d2h"] = 25.0          # representative tunnel figure
        return _cache["d2h"]
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        n = _PROBE_BYTES // 4
        x = jax.jit(
            lambda: jax.random.bits(jax.random.PRNGKey(7), (n,), jnp.uint32)
        )()
        x.block_until_ready()
        t0 = time.perf_counter()
        host = np.asarray(x)
        dt = time.perf_counter() - t0
        _cache["d2h"] = float(host.nbytes / 1e6 / max(dt, 1e-9))
    except Exception:
        _cache["d2h"] = _PCIE_MBPS   # unknown: assume healthy local link
    return _cache["d2h"]


def preferred_ebcot_path() -> str:
    """'hybrid' (B: device decisions + host MQ) on local-PCIe-class links,
    'host' (C: device transform + host C++ T1) on tunnel-class links.
    The all-device kernel (A) is only ever forced via backend="device"."""
    if "ebcot_path" in _cache:
        return _cache["ebcot_path"]
    bw = d2h_mbps()
    path = "hybrid" if bw >= _PCIE_MBPS else "host"
    log.info("backend=auto EBCOT path selection: d2h %.1f MB/s -> "
             "%s (%s)", bw, path,
             "device decisions + host MQ" if path == "hybrid"
             else "device transform + host C++ T1")
    _cache["ebcot_path"] = path
    return path


def reset(path: Optional[str] = None) -> None:
    """Test hook: clear the cache or pin a path."""
    _cache.clear()
    if path is not None:
        _cache["ebcot_path"] = path
