"""Spatially-sharded DWT with ICI halo exchange + sharded encode step.

The sequence-parallelism analog for a codec (SURVEY.md §5.7): rows of a
tile-component shard over the 'sp' mesh axis; each 5/3 lifting step needs one
boundary row from the neighboring shard, exchanged with jax.lax.ppermute
(rides ICI on a real slice).  Rate-allocation statistics reduce with psum —
the PCRD allreduce of BASELINE.json config 5.

Shapes must satisfy H % (sp * 2^levels) == 0 so every shard starts on an
even global row at every level (asserted in the wrapper).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import dwt


def _vlift53_sharded(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Vertical 5/3 forward lifting on a row-shard [..., rows, W] whose global
    start row is even; boundary rows exchanged with the neighbor shards."""
    sp = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    rows = x.shape[-2]

    # --- step 1: odd rows -= floor((even_above + even_below)/2) ---
    evens = x[..., 0::2, :]
    odds = x[..., 1::2, :]
    # even row below odd row k is evens[k+1]; the last odd row needs the next
    # shard's first row (global reflection at the true bottom edge).
    from_next = jax.lax.ppermute(x[..., 0:1, :], axis_name,
                                 [(i, (i - 1) % sp) for i in range(sp)])
    # bottom shard: reflect (odd row r-1 at global bottom: X[b+1] -> X[b-1])
    bottom_fill = x[..., rows - 2:rows - 1, :]
    below_last = jnp.where(idx == sp - 1, bottom_fill, from_next)
    even_below = jnp.concatenate([evens[..., 1:, :], below_last], axis=-2)
    odds = odds - ((evens + even_below) >> 1)

    # --- step 2: even rows += floor((odd_above + odd_below + 2)/4) ---
    # odd row above even row k is odds[k-1]; the first even row needs the
    # previous shard's last (odd, updated) row.
    from_prev = jax.lax.ppermute(odds[..., -1:, :], axis_name,
                                 [(i, (i + 1) % sp) for i in range(sp)])
    # top shard: reflect (X[-1] -> X[1], i.e. odds[0])
    top_fill = odds[..., 0:1, :]
    above_first = jnp.where(idx == 0, top_fill, from_prev)
    odd_above = jnp.concatenate([above_first, odds[..., :-1, :]], axis=-2)
    evens = evens + ((odd_above + odds + 2) >> 2)
    return evens, odds


def _vlift53_inverse_sharded(low: jnp.ndarray, high: jnp.ndarray,
                             axis_name: str) -> jnp.ndarray:
    """Inverse of :func:`_vlift53_sharded` (same halo pattern, reversed)."""
    sp = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    evens, odds = low, high
    # undo step 2
    from_prev = jax.lax.ppermute(odds[..., -1:, :], axis_name,
                                 [(i, (i + 1) % sp) for i in range(sp)])
    top_fill = odds[..., 0:1, :]
    above_first = jnp.where(idx == 0, top_fill, from_prev)
    odd_above = jnp.concatenate([above_first, odds[..., :-1, :]], axis=-2)
    evens = evens - ((odd_above + odds + 2) >> 2)
    # undo step 1
    from_next = jax.lax.ppermute(evens[..., 0:1, :], axis_name,
                                 [(i, (i - 1) % sp) for i in range(sp)])
    # global bottom reflection: X[H] -> X[H-2], the last even row = evens[-1]
    bottom_fill = evens[..., -1:, :]
    below_last = jnp.where(idx == sp - 1, bottom_fill, from_next)
    even_below = jnp.concatenate([evens[..., 1:, :], below_last], axis=-2)
    odds = odds + ((evens + even_below) >> 1)
    # interleave
    shp = list(evens.shape)
    shp[-2] = evens.shape[-2] + odds.shape[-2]
    out = jnp.stack([evens, odds], axis=-2)   # [..., rows/2, 2, W]
    return out.reshape(shp)


def dwt53_level_sharded(x: jnp.ndarray, axis_name: str
                        ) -> Dict[str, jnp.ndarray]:
    """One 2-D 5/3 level on a row-sharded tile: vertical lifting with halo
    exchange, then local horizontal lifting."""
    lo_y, hi_y = _vlift53_sharded(x, axis_name)
    ll, hl = dwt.forward_1d(lo_y, dwt.REV53, axis=-1, parity=0)
    lh, hh = dwt.forward_1d(hi_y, dwt.REV53, axis=-1, parity=0)
    return {"LL": ll, "HL": hl, "LH": lh, "HH": hh}


def idwt53_level_sharded(bands: Dict[str, jnp.ndarray], axis_name: str
                         ) -> jnp.ndarray:
    lo_y = dwt.inverse_1d(bands["LL"], bands["HL"], dwt.REV53, axis=-1, parity=0)
    hi_y = dwt.inverse_1d(bands["LH"], bands["HH"], dwt.REV53, axis=-1, parity=0)
    return _vlift53_inverse_sharded(lo_y, hi_y, axis_name)


def dwt53_multilevel_sharded(x: jnp.ndarray, levels: int, axis_name: str
                             ) -> List[Dict[str, jnp.ndarray]]:
    out = []
    cur = x
    for lev in range(1, levels + 1):
        bands = dwt53_level_sharded(cur, axis_name)
        entry = {k: bands[k] for k in ("HL", "LH", "HH")}
        cur = bands["LL"]
        if lev == levels:
            entry["LL"] = cur
        out.append(entry)
    return out


def idwt53_multilevel_sharded(pyramid: List[Dict[str, jnp.ndarray]],
                              axis_name: str) -> jnp.ndarray:
    cur = pyramid[-1]["LL"]
    for lev in range(len(pyramid), 0, -1):
        entry = pyramid[lev - 1]
        cur = idwt53_level_sharded(
            {"LL": cur, "HL": entry["HL"], "LH": entry["LH"],
             "HH": entry["HH"]}, axis_name)
    return cur


def make_encode_step(mesh: Mesh, levels: int = 3, precision: int = 8):
    """Jitted, mesh-sharded forward encode step (the 'training step' analog).

    Input: uint8/int32 batch [B, H, W, C] with B % dp == 0 and
    H % (sp * 2^levels) == 0.  Runs DC shift + RCT + sharded multi-level 5/3
    DWT + per-band significance/rate statistics with a psum allreduce.
    Returns (subband pyramid pytree, rate_stats).
    """
    from ..ops import mct
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]

    def local_step(batch):
        # batch local shard: [B/dp, H/sp, W, C]
        x = batch.astype(jnp.int32) - (1 << (precision - 1))
        if x.shape[-1] >= 3:
            y, u, v = mct.forward_rct(x[..., 0], x[..., 1], x[..., 2])
            planes = [y, u, v] + [x[..., i] for i in range(3, x.shape[-1])]
        else:
            planes = [x[..., i] for i in range(x.shape[-1])]
        comp = jnp.stack(planes, axis=1)      # [B/dp, C, H/sp, W]
        pyr = dwt53_multilevel_sharded(comp, levels, "sp")
        # rate-allocation stats: total |coeff| energy and significant-sample
        # count per level, allreduced over the whole mesh (PCRD psum).
        stats = []
        for entry in pyr:
            for k in ("HL", "LH", "HH"):
                a = entry[k]
                stats.append(jnp.stack([
                    jnp.sum(jnp.abs(a).astype(jnp.float32)),
                    jnp.sum((a != 0).astype(jnp.float32)),
                ]))
        stats = jnp.stack(stats)
        stats = jax.lax.psum(stats, "sp")
        stats = jax.lax.psum(stats, "dp")
        return pyr, stats

    from jax import shard_map
    in_spec = P("dp", "sp", None, None)
    # pyramid leaves: [B/dp, C, H/sp /2^k, W/2^k] -> batch over dp, rows over sp
    out_spec = (P("dp", None, "sp", None), P())
    fn = shard_map(local_step, mesh=mesh, in_specs=(in_spec,),
                   out_specs=out_spec, check_vma=False)
    return jax.jit(fn)
