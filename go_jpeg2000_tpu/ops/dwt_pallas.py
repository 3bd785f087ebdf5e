"""Pallas TPU kernel for the 2-D 5/3 lifting DWT.

The TPU-native replacement for the reference's assembly lifting kernels
(/root/reference/internal/dwt/dwt_amd64.s, dwt_arm64.s): one fused kernel
performs both lifting passes of a full 2-D decomposition level in VMEM —
a single HBM round-trip per level.  The kernel keeps the signal interleaved
(roll + parity masks, pure VPU ops; Mosaic supports neither strided slices
nor sublane-splitting reshapes) and XLA performs the cheap strided
deinterleave outside.

Even-origin (parity 0) and even block sizes only — the encoder's standard
tile path; other cases fall back to the jnp implementation in ops/dwt.py
(bit-identical; differentially tested in tests/test_dwt_pallas.py).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _lift53_axis(x, axis: int):
    """In-place-interleaved forward 5/3 lifting along `axis` (size even,
    even origin), built from roll + parity masks."""
    n = x.shape[axis]
    h, w = x.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), axis)
    odd = (rows & 1) == 1

    up = pltpu.roll(x, n - 1, axis)  # x[i+1]  (roll takes shift >= 0)
    dn = pltpu.roll(x, 1, axis)      # x[i-1]
    # bottom edge (last row is odd since n even): neighbor i+1 reflects to i-1
    up_fix = jnp.where(rows == n - 1, dn, up)
    x = jnp.where(odd, x - ((dn + up_fix) >> 1), x)

    up = pltpu.roll(x, n - 1, axis)
    dn = pltpu.roll(x, 1, axis)
    # top edge (row 0 is even): neighbor i-1 reflects to i+1
    dn_fix = jnp.where(rows == 0, up, dn)
    x = jnp.where(odd, x, x + ((dn_fix + up + 2) >> 2))
    return x


def _dwt53_level_kernel(x_ref, out_ref):
    x = x_ref[0]
    x = _lift53_axis(x, 0)
    x = _lift53_axis(x, 1)
    out_ref[0] = x


@functools.lru_cache(maxsize=64)
def _level_fn(n: int, h: int, w: int, interpret: bool):
    """Jitted: [N, H, W] int32 -> interleaved-lifted [N, H, W] via Pallas,
    then XLA deinterleaves into the four subbands."""
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=(pltpu.ANY if interpret else pltpu.VMEM))
    call = pl.pallas_call(
        _dwt53_level_kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        grid=(n,),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )

    def fn(x):
        y = call(x)
        lo_y = y[:, 0::2, :]
        hi_y = y[:, 1::2, :]
        return (lo_y[:, :, 0::2], lo_y[:, :, 1::2],
                hi_y[:, :, 0::2], hi_y[:, :, 1::2])

    return jax.jit(fn)


def forward_2d_53(x, interpret: bool = False):
    """One 2-D 5/3 level via the Pallas kernel.  x: [N, H, W] int32,
    even sizes, even origin."""
    n, h, w = x.shape
    ll, hl, lh, hh = _level_fn(n, h, w, interpret)(x)
    return {"LL": ll, "HL": hl, "LH": lh, "HH": hh}


def decompose_53(x, levels: int, interpret: bool = False):
    """Multi-level decomposition matching ops/dwt.decompose (parity 0,
    even sizes at every level)."""
    out = []
    cur = x
    for lev in range(1, levels + 1):
        bands = forward_2d_53(cur, interpret=interpret)
        entry = {k: bands[k] for k in ("HL", "LH", "HH")}
        cur = bands["LL"]
        if lev == levels:
            entry["LL"] = cur
        out.append(entry)
    return out


def usable(h: int, w: int, u0: int, v0: int, kind: str,
           levels: int = 1) -> bool:
    """Pallas path eligibility: 5/3, even origin, even sizes at every level,
    and a block that fits comfortably in VMEM."""
    if not HAVE_PALLAS or kind != "53":
        return False
    if (u0 & 1) or (v0 & 1):
        return False
    hh, ww = h, w
    for _ in range(levels):
        if (hh & 1) or (ww & 1) or hh < 2 or ww < 2:
            return False
        hh //= 2
        ww //= 2
    return 2 * h * w * 4 <= 12 * 1024 * 1024
