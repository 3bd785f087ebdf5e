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


def _odd_step(x, axis: int, f):
    """x[odd] = f(x, x[i-1], x[i+1]) with symmetric extension; size even,
    even origin (so the last index n-1 is odd: i+1 reflects to i-1)."""
    n = x.shape[axis]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    odd = (rows & 1) == 1
    up = pltpu.roll(x, n - 1, axis)  # x[i+1]  (roll takes shift >= 0)
    dn = pltpu.roll(x, 1, axis)      # x[i-1]
    up = jnp.where(rows == n - 1, dn, up)
    return jnp.where(odd, f(x, dn, up), x)


def _even_step(x, axis: int, f):
    """x[even] = f(x, x[i-1], x[i+1]); index 0 is even: i-1 reflects to
    i+1."""
    n = x.shape[axis]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    odd = (rows & 1) == 1
    up = pltpu.roll(x, n - 1, axis)
    dn = pltpu.roll(x, 1, axis)
    dn = jnp.where(rows == 0, up, dn)
    return jnp.where(odd, x, f(x, dn, up))


def _lift53_axis(x, axis: int):
    """In-place-interleaved forward 5/3 lifting along `axis` (size even,
    even origin), built from roll + parity masks."""
    x = _odd_step(x, axis, lambda c, l, r: c - ((l + r) >> 1))
    x = _even_step(x, axis, lambda c, l, r: c + ((l + r + 2) >> 2))
    return x


def _ilift53_axis(x, axis: int):
    """Inverse of _lift53_axis (F.3.8 2D_SR ordering within one axis)."""
    x = _even_step(x, axis, lambda c, l, r: c - ((l + r + 2) >> 2))
    x = _odd_step(x, axis, lambda c, l, r: c + ((l + r) >> 1))
    return x


# 9/7 lifting constants (Table F.4; match ops/dwt.py)
_ALPHA = -1.586134342059924
_BETA = -0.052980118572961
_GAMMA = 0.882911075530934
_DELTA = 0.443506852043971
_K = 1.230174104914001


def _scale97(x, axis: int, even_scale: float, odd_scale: float):
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    odd = (rows & 1) == 1
    return jnp.where(odd, x * odd_scale, x * even_scale)


def _lift97_axis(x, axis: int):
    x = _odd_step(x, axis, lambda c, l, r: c + _ALPHA * (l + r))
    x = _even_step(x, axis, lambda c, l, r: c + _BETA * (l + r))
    x = _odd_step(x, axis, lambda c, l, r: c + _GAMMA * (l + r))
    x = _even_step(x, axis, lambda c, l, r: c + _DELTA * (l + r))
    return _scale97(x, axis, 1.0 / _K, _K)


def _ilift97_axis(x, axis: int):
    x = _scale97(x, axis, _K, 1.0 / _K)
    x = _even_step(x, axis, lambda c, l, r: c - _DELTA * (l + r))
    x = _odd_step(x, axis, lambda c, l, r: c - _GAMMA * (l + r))
    x = _even_step(x, axis, lambda c, l, r: c - _BETA * (l + r))
    x = _odd_step(x, axis, lambda c, l, r: c - _ALPHA * (l + r))
    return x


def _dwt53_level_kernel(x_ref, out_ref):
    x = x_ref[0]
    x = _lift53_axis(x, 0)
    x = _lift53_axis(x, 1)
    out_ref[0] = x


def _idwt53_level_kernel(x_ref, out_ref):
    # 2D_SR: horizontal first, then vertical (ops/dwt.py inverse_2d)
    x = x_ref[0]
    x = _ilift53_axis(x, 1)
    x = _ilift53_axis(x, 0)
    out_ref[0] = x


def _dwt97_level_kernel(x_ref, out_ref):
    x = x_ref[0]
    x = _lift97_axis(x, 0)
    x = _lift97_axis(x, 1)
    out_ref[0] = x


def _idwt97_level_kernel(x_ref, out_ref):
    x = x_ref[0]
    x = _ilift97_axis(x, 1)
    x = _ilift97_axis(x, 0)
    out_ref[0] = x


_KERNELS = {
    ("53", False): (_dwt53_level_kernel, jnp.int32),
    ("53", True): (_idwt53_level_kernel, jnp.int32),
    ("97", False): (_dwt97_level_kernel, jnp.float32),
    ("97", True): (_idwt97_level_kernel, jnp.float32),
}


@functools.lru_cache(maxsize=128)
def _level_fn(n: int, h: int, w: int, kind: str, inverse: bool,
              interpret: bool):
    """Jitted forward: [N, H, W] -> interleaved-lifted [N, H, W] via Pallas,
    then XLA deinterleaves into the four subbands.  Inverse: interleaved
    input -> reconstructed signal (caller interleaves the bands)."""
    kernel, dtype = _KERNELS[(kind, inverse)]
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=(pl.ANY if interpret else pltpu.VMEM))
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w), dtype),
        grid=(n,),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )
    if inverse:
        return jax.jit(call)

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
    ll, hl, lh, hh = _level_fn(n, h, w, "53", False, interpret)(x)
    return {"LL": ll, "HL": hl, "LH": lh, "HH": hh}


def forward_2d_97(x, interpret: bool = False):
    """One 2-D 9/7 level via the Pallas kernel.  x: [N, H, W] float32."""
    n, h, w = x.shape
    ll, hl, lh, hh = _level_fn(n, h, w, "97", False, interpret)(x)
    return {"LL": ll, "HL": hl, "LH": lh, "HH": hh}


def _interleave_bands(bands):
    """{LL,HL,LH,HH} [N,h2,w2] -> interleaved [N,H,W] (parity 0)."""
    ll, hl, lh, hh = bands["LL"], bands["HL"], bands["LH"], bands["HH"]
    n, h2, w2 = ll.shape
    lo_y = jnp.stack([ll, hl], axis=-1).reshape(n, h2, 2 * w2)
    hi_y = jnp.stack([lh, hh], axis=-1).reshape(n, h2, 2 * w2)
    return jnp.stack([lo_y, hi_y], axis=-2).reshape(n, 2 * h2, 2 * w2)


def inverse_2d_53(bands, interpret: bool = False):
    """One 2-D inverse 5/3 level via the Pallas kernel (even sizes, even
    origin).  bands: {LL,HL,LH,HH} [N, h2, w2] int32 -> [N, H, W]."""
    x = _interleave_bands(bands)
    n, h, w = x.shape
    return _level_fn(n, h, w, "53", True, interpret)(x)


def inverse_2d_97(bands, interpret: bool = False):
    x = _interleave_bands(bands)
    n, h, w = x.shape
    return _level_fn(n, h, w, "97", True, interpret)(x)


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
    """Pallas path eligibility: even origin, even sizes at every level,
    and a block that fits comfortably in VMEM (5/3 and 9/7, both
    directions)."""
    if not HAVE_PALLAS or kind not in ("53", "97"):
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
