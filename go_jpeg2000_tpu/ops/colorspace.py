"""Colorspace -> sRGB conversions (vectorized jnp element-wise kernels).

Capability parity with the reference's 14 converters
(/root/reference/colorspace.go:54-302): sYCC, BT.601 YCbCr (625/525),
PhotoYCC, CMY, CMYK, YCCK, CIELab (D50->D65), CIEJab, e-sRGB, ROMM-RGB,
YPbPr (60/50), e-sYCC — precision-generic (1-16 bit), all expressed as 3x3
matrix + offset + gamma element-wise math that XLA fuses into one pass.

Each converter takes a list of component arrays (full resolution, unsigned
integer range [0, 2^P - 1]) and returns sRGB (or gray) arrays in the same
range.
"""
from __future__ import annotations

from typing import Callable, List, Optional

import jax.numpy as jnp

from ..options import ColorSpace


def _maxval(precision: int) -> float:
    return float((1 << precision) - 1)


def _clip(x: jnp.ndarray, precision: int) -> jnp.ndarray:
    return jnp.clip(jnp.round(x), 0, _maxval(precision)).astype(jnp.int32)


def _ycc_to_rgb(y, cb, cr, precision, kr, kb):
    """Generic YCbCr->RGB with BT matrix weights kr, kb (full range)."""
    mx = _maxval(precision)
    half = (mx + 1.0) / 2.0
    kg = 1.0 - kr - kb
    y = y.astype(jnp.float32)
    pb = cb.astype(jnp.float32) - half
    pr = cr.astype(jnp.float32) - half
    r = y + 2.0 * (1.0 - kr) * pr
    b = y + 2.0 * (1.0 - kb) * pb
    g = y - (2.0 * kb * (1.0 - kb) * pb + 2.0 * kr * (1.0 - kr) * pr) / kg
    return r, g, b


def convert_sycc(comps: List[jnp.ndarray], precision: int) -> List[jnp.ndarray]:
    """sYCC (BT.601 matrix on sRGB primaries, enumcs 18)."""
    r, g, b = _ycc_to_rgb(comps[0], comps[1], comps[2], precision, 0.299, 0.114)
    return [_clip(r, precision), _clip(g, precision), _clip(b, precision)]


def convert_ycbcr601(comps: List[jnp.ndarray], precision: int) -> List[jnp.ndarray]:
    """BT.601 YCbCr, studio-range expansion (enumcs 3 and 4)."""
    mx = _maxval(precision)
    scale = mx / 255.0
    y = (comps[0].astype(jnp.float32) / scale - 16.0) * (255.0 / 219.0)
    cb = (comps[1].astype(jnp.float32) / scale - 128.0) * (255.0 / 224.0)
    cr = (comps[2].astype(jnp.float32) / scale - 128.0) * (255.0 / 224.0)
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return [_clip(v * scale, precision) for v in (r, g, b)]


def convert_ypbpr(kr: float, kb: float) -> Callable:
    def conv(comps: List[jnp.ndarray], precision: int) -> List[jnp.ndarray]:
        r, g, b = _ycc_to_rgb(comps[0], comps[1], comps[2], precision, kr, kb)
        return [_clip(r, precision), _clip(g, precision), _clip(b, precision)]
    return conv


def convert_photo_ycc(comps: List[jnp.ndarray], precision: int) -> List[jnp.ndarray]:
    """Kodak PhotoYCC (enumcs 9)."""
    mx = _maxval(precision)
    scale = mx / 255.0
    y = comps[0].astype(jnp.float32) / scale * 1.3584
    c1 = (comps[1].astype(jnp.float32) / scale - 156.0) * 2.2179
    c2 = (comps[2].astype(jnp.float32) / scale - 137.0) * 1.8215
    r = y + c2
    g = y - 0.194 * c1 - 0.509 * c2
    b = y + c1
    return [_clip(v / 255.0 * mx, precision) for v in (r, g, b)]


def convert_cmy(comps: List[jnp.ndarray], precision: int) -> List[jnp.ndarray]:
    mx = _maxval(precision)
    return [_clip(mx - c.astype(jnp.float32), precision) for c in comps[:3]]


def convert_cmyk(comps: List[jnp.ndarray], precision: int) -> List[jnp.ndarray]:
    mx = _maxval(precision)
    c, m, y, k = (x.astype(jnp.float32) / mx for x in comps[:4])
    r = (1.0 - c) * (1.0 - k)
    g = (1.0 - m) * (1.0 - k)
    b = (1.0 - y) * (1.0 - k)
    return [_clip(v * mx, precision) for v in (r, g, b)]


def convert_ycck(comps: List[jnp.ndarray], precision: int) -> List[jnp.ndarray]:
    """YCCK (enumcs 13): sYCC-decode Y/Cb/Cr, invert, then CMYK composite."""
    mx = _maxval(precision)
    r, g, b = _ycc_to_rgb(comps[0], comps[1], comps[2], precision, 0.299, 0.114)
    k = comps[3].astype(jnp.float32) / mx
    c = 1.0 - jnp.clip(r, 0, mx) / mx
    m = 1.0 - jnp.clip(g, 0, mx) / mx
    y = 1.0 - jnp.clip(b, 0, mx) / mx
    rr = (1.0 - c) * (1.0 - k)
    gg = (1.0 - m) * (1.0 - k)
    bb = (1.0 - y) * (1.0 - k)
    return [_clip(v * mx, precision) for v in (rr, gg, bb)]


def srgb_gamma(linear: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB transfer function (IEC 61966-2-1)."""
    return jnp.where(linear <= 0.0031308,
                     12.92 * linear,
                     1.055 * jnp.power(jnp.maximum(linear, 1e-12), 1.0 / 2.4) - 0.055)


def srgb_degamma(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(v <= 0.04045, v / 12.92,
                     jnp.power((v + 0.055) / 1.055, 2.4))


# XYZ (D65) -> linear sRGB
_XYZ_TO_SRGB = (
    (3.2406, -1.5372, -0.4986),
    (-0.9689, 1.8758, 0.0415),
    (0.0557, -0.2040, 1.0570),
)
# Bradford chromatic adaptation D50 -> D65
_D50_TO_D65 = (
    (0.9555766, -0.0230393, 0.0631636),
    (-0.0282895, 1.0099416, 0.0210077),
    (0.0122982, -0.0204830, 1.3299098),
)


def convert_cielab(comps: List[jnp.ndarray], precision: int) -> List[jnp.ndarray]:
    """CIELab (D50) -> sRGB with Bradford adaptation to D65 (enumcs 14).

    Uses the JP2 default Lab encoding ranges: L* in [0,100],
    a*,b* in [-85,85] / [-75,125] per the default (RL=100, Ra=170, ...);
    here the common symmetric defaults: L = 100*v, a/b = 255*v - 128 scaled.
    """
    mx = _maxval(precision)
    L = comps[0].astype(jnp.float32) / mx * 100.0
    a = comps[1].astype(jnp.float32) / mx * 255.0 - 128.0
    bb = comps[2].astype(jnp.float32) / mx * 255.0 - 128.0
    # Lab -> XYZ (D50 white)
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - bb / 200.0

    def finv(t):
        t3 = t * t * t
        return jnp.where(t3 > 0.008856, t3, (t - 16.0 / 116.0) / 7.787)

    xn, yn, zn = 0.9642, 1.0, 0.8249  # D50
    x = finv(fx) * xn
    y = jnp.where(L > 7.9996, fy ** 3, L / 903.3) * yn
    z = finv(fz) * zn
    # adapt D50 -> D65
    m = _D50_TO_D65
    x65 = m[0][0] * x + m[0][1] * y + m[0][2] * z
    y65 = m[1][0] * x + m[1][1] * y + m[1][2] * z
    z65 = m[2][0] * x + m[2][1] * y + m[2][2] * z
    s = _XYZ_TO_SRGB
    rl = s[0][0] * x65 + s[0][1] * y65 + s[0][2] * z65
    gl = s[1][0] * x65 + s[1][1] * y65 + s[1][2] * z65
    bl = s[2][0] * x65 + s[2][1] * y65 + s[2][2] * z65
    out = [srgb_gamma(jnp.clip(v, 0.0, 1.0)) * mx for v in (rl, gl, bl)]
    return [_clip(v, precision) for v in out]


def convert_esrgb(comps: List[jnp.ndarray], precision: int) -> List[jnp.ndarray]:
    """e-sRGB (enumcs 20): extended-range sRGB; map the [0.375, 0.625]-coded
    nominal range back to sRGB and clip."""
    mx = _maxval(precision)
    out = []
    for c in comps[:3]:
        v = c.astype(jnp.float32) / (mx + 1.0)
        v = (v - 0.375) * 4.0  # nominal [0,1] range
        out.append(_clip(jnp.clip(v, 0.0, 1.0) * mx, precision))
    return out


def convert_romm(comps: List[jnp.ndarray], precision: int) -> List[jnp.ndarray]:
    """ROMM-RGB / ProPhoto (enumcs 21) -> sRGB via XYZ D50->D65."""
    mx = _maxval(precision)
    # ROMM gamma 1.8 with linear toe
    def degamma(v):
        return jnp.where(v < 16.0 * 0.001953, v / 16.0, jnp.power(v, 1.8))
    rgb = [degamma(c.astype(jnp.float32) / mx) for c in comps[:3]]
    # ROMM -> XYZ (D50)
    m = ((0.7977, 0.1352, 0.0313),
         (0.2880, 0.7119, 0.0001),
         (0.0000, 0.0000, 0.8249))
    x = m[0][0] * rgb[0] + m[0][1] * rgb[1] + m[0][2] * rgb[2]
    y = m[1][0] * rgb[0] + m[1][1] * rgb[1] + m[1][2] * rgb[2]
    z = m[2][0] * rgb[0] + m[2][1] * rgb[1] + m[2][2] * rgb[2]
    a = _D50_TO_D65
    x65 = a[0][0] * x + a[0][1] * y + a[0][2] * z
    y65 = a[1][0] * x + a[1][1] * y + a[1][2] * z
    z65 = a[2][0] * x + a[2][1] * y + a[2][2] * z
    s = _XYZ_TO_SRGB
    rl = s[0][0] * x65 + s[0][1] * y65 + s[0][2] * z65
    gl = s[1][0] * x65 + s[1][1] * y65 + s[1][2] * z65
    bl = s[2][0] * x65 + s[2][1] * y65 + s[2][2] * z65
    return [_clip(srgb_gamma(jnp.clip(v, 0.0, 1.0)) * mx, precision)
            for v in (rl, gl, bl)]


def convert_eycc(comps: List[jnp.ndarray], precision: int) -> List[jnp.ndarray]:
    """e-sYCC (enumcs 24): sYCC matrix with extended range."""
    return convert_sycc(comps, precision)


def convert_ciejab(comps: List[jnp.ndarray], precision: int) -> List[jnp.ndarray]:
    """CIEJab (enumcs 19): CIECAM02-based; approximate via the Lab path
    (the reference does the same class of approximation)."""
    return convert_cielab(comps, precision)


def get_color_conversion(cs: ColorSpace) -> Optional[Callable]:
    """Dispatch table (reference parity: colorspace.go:54-88).  Returns None
    for colorspaces that are already displayable (sRGB/Gray/unspecified)."""
    table = {
        ColorSpace.SYCC: convert_sycc,
        ColorSpace.EYCC: convert_eycc,
        ColorSpace.YCBCR2: convert_ycbcr601,
        ColorSpace.YCBCR3: convert_ycbcr601,
        ColorSpace.PHOTO_YCC: convert_photo_ycc,
        ColorSpace.CMY: convert_cmy,
        ColorSpace.CMYK: convert_cmyk,
        ColorSpace.YCCK: convert_ycck,
        ColorSpace.CIELAB: convert_cielab,
        ColorSpace.CIEJAB: convert_ciejab,
        ColorSpace.ESRGB: convert_esrgb,
        ColorSpace.ROMM_RGB: convert_romm,
        ColorSpace.YPBPR60: convert_ypbpr(0.2126, 0.0722),   # BT.709
        ColorSpace.YPBPR50: convert_ypbpr(0.2126, 0.0722),
    }
    return table.get(cs)
