"""Rate control: quality -> step size mapping, PCRD-opt layer allocation.

The reference has no rate-distortion optimization (CodingPass.Slope exists
but is unused, /root/reference/internal/tcd/tcd.go:141; quality maps to a
global quantizer step, encoder.go:265-277).  This module implements real
PCRD-opt (Taubman's post-compression rate-distortion optimization): convex
hulls of per-pass (rate, distortion) points per code-block, a global slope
threshold per layer, and bisection to hit a byte budget.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..options import Options


def base_delta_for_quality(quality: int, precision: int) -> float:
    """Map quality 1-100 to a base quantizer step (in sample units).

    quality 100 -> tiny step (near-lossless); quality 1 -> coarse.
    Exponential mapping akin to the reference's linear one
    (encoder.go:519-523) but with perceptually sensible range.
    """
    quality = min(100, max(1, quality))
    # step from ~2^-1 (q=100) up to ~2^(p-3) (q=1)
    t = (100 - quality) / 99.0
    log_step = -1.0 + t * (precision - 2.0)
    return 2.0 ** log_step


def byte_budget(image: np.ndarray, opts: Options) -> Optional[int]:
    """Target codestream bytes from compression_ratio (None = no cap)."""
    if opts.lossless or opts.compression_ratio <= 1.0:
        return None
    precision = opts.precision or (16 if image.dtype == np.uint16 else 8)
    raw_bytes = image.size * ((precision + 7) // 8)
    return int(raw_bytes / opts.compression_ratio)


def _convex_hull_passes(rates: Sequence[int], dists: Sequence[float]
                        ) -> List[Tuple[int, float]]:
    """Indices of passes on the convex hull of (rate, dist), with slopes.

    Returns [(pass_index, slope)] with strictly decreasing slopes.
    """
    hull: List[Tuple[int, float]] = []
    prev_r, prev_d = 0, 0.0
    for i in range(len(rates)):
        r, d = rates[i], dists[i]
        dr = r - prev_r
        dd = d - prev_d
        if dr <= 0:
            slope = math.inf if dd > 0 else 0.0
        else:
            slope = dd / dr
        # maintain decreasing slopes: pop non-convex points
        while hull and slope >= hull[-1][1]:
            idx, _ = hull.pop()
            if hull:
                pr = rates[hull[-1][0]]
                pd = dists[hull[-1][0]]
            else:
                pr, pd = 0, 0.0
            dr2 = r - pr
            dd2 = d - pd
            slope = (dd2 / dr2) if dr2 > 0 else (math.inf if dd2 > 0 else 0.0)
        hull.append((i, slope))
        prev_r, prev_d = r, d
    return hull


def assign_layers(blocks: Sequence, weights: Sequence[float], num_layers: int,
                  budget: Optional[int]) -> None:
    """Distribute each block's passes over quality layers in-place
    (fills blk.layer_passes).

    Single layer without budget: everything in layer 0 (lossless default).
    Otherwise: compute hull slopes (distortion weighted by band delta^2),
    choose per-layer slope thresholds — geometric between max and min slope,
    with the final threshold chosen by bisection when a byte budget is set.
    """
    if num_layers == 1 and budget is None:
        for blk in blocks:
            blk.layer_passes[0] = blk.num_passes_total
        return

    hulls = []
    for blk, w in zip(blocks, weights):
        rates = blk.pass_rates
        dists = [p.distortion * w for p in blk._passes]
        hulls.append(_convex_hull_passes(rates, dists))

    def included_passes(threshold: float) -> List[int]:
        out = []
        for hull in hulls:
            n = 0
            for idx, slope in hull:
                if slope >= threshold:
                    n = idx + 1
            out.append(n)
        return out

    def total_bytes(incl: List[int]) -> int:
        tot = 0
        for blk, n in zip(blocks, incl):
            if n > 0:
                tot += blk.pass_rates[n - 1] + 8   # ~header overhead/block
        return tot

    slopes = [s for hull in hulls for _, s in hull if math.isfinite(s) and s > 0]
    if not slopes:
        for blk in blocks:
            blk.layer_passes[num_layers - 1] = blk.num_passes_total
        return
    s_max, s_min = max(slopes), min(slopes)

    # final-layer threshold
    if budget is not None:
        lo, hi = 0.0, s_max * 2
        final_thresh = 0.0
        for _ in range(50):
            mid = (lo + hi) / 2
            if total_bytes(included_passes(mid)) > budget:
                lo = mid
            else:
                hi = mid
        final_thresh = hi
    else:
        final_thresh = 0.0   # include everything by the last layer

    # layer thresholds: geometric from s_max down to final_thresh
    thresholds = []
    lo_ref = max(final_thresh, s_min * 0.5, 1e-9)
    for l in range(num_layers):
        if l == num_layers - 1:
            thresholds.append(final_thresh)
        else:
            f = (l + 1) / num_layers
            thresholds.append(s_max * (lo_ref / s_max) ** f if s_max > 0 else 0.0)

    prev_incl = [0] * len(blocks)
    for l, th in enumerate(thresholds):
        incl = included_passes(th)
        if th <= 0.0:
            incl = [blk.num_passes_total for blk in blocks]
        for bi, blk in enumerate(blocks):
            n = max(incl[bi], prev_incl[bi])
            blk.layer_passes[l] = n - prev_incl[bi]
            prev_incl[bi] = n
    # anything left over (when final layer had a budget) stays unsent
