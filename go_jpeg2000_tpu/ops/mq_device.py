"""Lockstep vectorized MQ coder: one lane per code-block, on device.

Stage 2 of device EBCOT (SURVEY hard part #1; stage 1 is the decision
kernel in ops/ebcot_device.py).  Every lane runs the identical ISO C.3
flowchart over its own (ctx, bit) decision stream — per-lane A/C/CT
registers, 19-entry context state, carry/stuffing BYTEOUT and the
OpenJPEG-compatible FLUSH — as masked vector ops inside one lax.scan.
Divergence is handled by predication (inactive lanes and the
renormalization shift count per decision), exactly the design SURVEY §7
sketches.  All state-table lookups are one-hot contractions: a gather
inside a scan costs ~18us/step on this platform, the one-hot form ~0.2us.

Byte emission: each decision commits 0..3 bytes (15 renorm shifts max,
first BYTEOUT after >=1 shift, then every 7-8).  Commits land in a dense
staging buffer at static per-step columns (dynamic-update-slice, no
scatter), then ONE key-sort per batch compacts them into per-lane rows
and a second sort into the global byte pool the host fetches (the sort
idiom from ops/ht_tpu.compact_pool — scatters are pathologically slow
here, sorts are fast).

Bit-exactness contract: feeding the same decision stream through
ops/mq.MQEncoder yields byte-identical segments (tests/test_mq_device.py);
composed with the decision kernel this reproduces ops/t1.encode_block's
bitstream exactly (reference behavior: internal/entropy/mqc.go:168-341,
re-architected for lockstep lanes).
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .mq import QE_TABLE, CTX_RL, CTX_UNI, CTX_ZC_BASE

M32 = jnp.uint32(0xFFFFFFFF)
M16 = jnp.uint32(0xFFFF)

_QE = np.asarray([r[0] for r in QE_TABLE], np.uint32)
_NMPS = np.asarray([r[1] for r in QE_TABLE], np.uint32)
_NLPS = np.asarray([r[2] for r in QE_TABLE], np.uint32)
_SW = np.asarray([r[3] for r in QE_TABLE], np.uint32)

# initial context states (Table D.7): all 0 except UNI=46, RL=3, ZC0=4
_I0 = np.zeros(19, np.uint32)
_I0[CTX_UNI] = 46
_I0[CTX_RL] = 3
_I0[CTX_ZC_BASE] = 4

UNROLL = 8                     # decisions per scan step


def _byteout(last, c, ct, pos, mask):
    """Masked BYTEOUT (C.3.2) on the register model: buf[-1] lives in
    `last`; each byteout commits the old last byte and loads a new one.
    Returns (last, c, ct, pos, committed_byte, committed_valid)."""
    stuffed = last == jnp.uint32(0xFF)
    carry = (~stuffed) & (c >= jnp.uint32(0x8000000))
    last1 = last + carry.astype(jnp.uint32)
    stuff2 = carry & (last1 == jnp.uint32(0xFF))
    commit = jnp.where(stuffed, last, last1)
    c2 = jnp.where(stuff2, c & jnp.uint32(0x7FFFFFF), c)
    use_stuff = stuffed | stuff2
    newlast = jnp.where(use_stuff, (c2 >> 20) & jnp.uint32(0xFF),
                        (c2 >> 19) & jnp.uint32(0xFF))
    newc = jnp.where(use_stuff, c2 & jnp.uint32(0xFFFFF),
                     c2 & jnp.uint32(0x7FFFF))
    newct = jnp.where(use_stuff, 7, 8)
    last = jnp.where(mask, newlast, last)
    c = jnp.where(mask, newc, c)
    ct = jnp.where(mask, newct, ct)
    pos = pos + mask.astype(jnp.int32)
    return last, c, ct, pos, commit.astype(jnp.uint8), mask


def _one_decision(st, x, active):
    """One ENCODE (C.3.1) across all lanes; x = ctx | bit<<5 (uint8).
    Returns (state, [(byte, valid)] * 3).

    Renormalization is closed-form: the shift count is s = clz16(A') (A'
    is the post-update interval width, never 0), applied in at most THREE
    chunks bounded by CT — a BYTEOUT fires exactly when CT hits 0, and
    since every byteout reloads CT with >= 7 while s <= 15, three rounds
    always drain s (1 + 7 + 7 = 15).  This replaces the r3 design's 15
    unrolled shift-by-1 iterations (VERDICT r3 weak #2): ~5x fewer ops
    per decision, same byte-exact semantics (tests/test_mq_device.py)."""
    a, c, ct, last, pos, I, MPS = st
    ctx = (x & 0x1F).astype(jnp.int32)
    d = (x >> 5).astype(jnp.uint32)
    oh = (ctx[:, None] == jnp.arange(19)[None, :])          # [B,19] bool
    ohu = oh.astype(jnp.uint32)
    idx = jnp.sum(I * ohu, axis=1).astype(jnp.int32)
    mps = jnp.sum(MPS * ohu, axis=1)
    oh47 = (idx[:, None] == jnp.arange(47)[None, :]).astype(jnp.uint32)
    qe = jnp.sum(oh47 * jnp.asarray(_QE)[None, :], axis=1)
    nmps = jnp.sum(oh47 * jnp.asarray(_NMPS)[None, :], axis=1)
    nlps = jnp.sum(oh47 * jnp.asarray(_NLPS)[None, :], axis=1)
    sw = jnp.sum(oh47 * jnp.asarray(_SW)[None, :], axis=1)

    is_mps = d == mps
    a1 = a - qe
    renorm_mps = is_mps & ((a1 & jnp.uint32(0x8000)) == 0)
    a_lt = a1 < qe
    new_a = jnp.where(is_mps, jnp.where(renorm_mps & a_lt, qe, a1),
                      jnp.where(a_lt, a1, qe))
    add_c = jnp.where((is_mps & ~(renorm_mps & a_lt)) | (~is_mps & a_lt),
                      qe, jnp.uint32(0))
    new_idx = jnp.where(renorm_mps, nmps, jnp.where(~is_mps, nlps,
                                                    idx.astype(jnp.uint32)))
    new_mps = jnp.where(~is_mps & (sw > 0), 1 - mps, mps)

    a = jnp.where(active, new_a, a)
    c = jnp.where(active, c + add_c, c)
    upd = oh & active[:, None]
    I = jnp.where(upd, new_idx[:, None], I)
    MPS = jnp.where(upd, new_mps[:, None], MPS)

    # shift count: renorm shifts A until bit 15 sets; post-update A is in
    # [1, 0xFFFF] so s = clz32(A) - 16 in [0, 15] (s >= 1 whenever a
    # renorm is actually needed)
    need = (renorm_mps | ~is_mps) & active
    s = jnp.where(need, jax.lax.clz(a.astype(jnp.uint32)).astype(jnp.int32)
                  - 16, 0)
    a = jnp.where(need, (a << s.astype(jnp.uint32)) & M16, a)

    outs = []
    for _ in range(3):
        act_r = s > 0
        s1 = jnp.minimum(s, ct)
        c = jnp.where(act_r, (c << s1.astype(jnp.uint32)) & M32, c)
        ct = jnp.where(act_r, ct - s1, ct)
        s = jnp.where(act_r, s - s1, s)
        do_bo = act_r & (ct == 0)
        last, c, ct, pos, by, vd = _byteout(last, c, ct, pos, do_bo)
        outs.append((by, vd))
    (b0, v0), (b1, v1), (b2, v2) = outs
    return (a, c, ct, last, pos, I, MPS), (b0, v0, b1, v1, b2, v2)


def _flush(st, has_any):
    """FLUSH (C.3.4): SETBITS + two byteouts + the final last byte.
    Masked by has_any (lanes with no decisions emit nothing).
    Returns (committed bytes+valids list, lens) — lens excludes the
    sentinel commit; trailing-0xFF strip happens on host."""
    a, c, ct, last, pos, I, MPS = st
    tempc = c + a - 1
    c1 = c | jnp.uint32(0xFFFF)
    c1 = jnp.where(c1 >= tempc, c1 - jnp.uint32(0x8000), c1)
    c = jnp.where(has_any, c1, c)
    outs = []
    for _ in range(2):
        c = jnp.where(has_any, (c << ct.astype(jnp.uint32)) & M32, c)
        last, c, ct, pos, by, vd = _byteout(last, c, ct, pos, has_any)
        outs.append((by, vd))
    # final register byte becomes the segment's last byte
    outs.append((last.astype(jnp.uint8), has_any))
    pos = pos + has_any.astype(jnp.int32)
    lens = jnp.maximum(pos - 1, 0)          # drop the sentinel commit
    return outs, lens


def mq_encode_scan(xs_tm, n_dec):
    """xs_tm: [steps, UNROLL, B] uint8 decision stream (ctx | bit<<5,
    time-major, padded); n_dec: [B] int32 true decision counts.

    Returns (stage_bytes [B, S], stage_valid [B, S], lens [B]) with
    S = steps*UNROLL*3 + 3; commits appear in stage column order, the
    first valid commit per lane being the discarded sentinel."""
    steps, U, B = xs_tm.shape
    assert U == UNROLL
    a0 = jnp.full((B,), 0x8000, jnp.uint32)
    c0 = jnp.zeros((B,), jnp.uint32)
    ct0 = jnp.full((B,), 12, jnp.int32)
    last0 = jnp.zeros((B,), jnp.uint32)     # sentinel byte 0
    pos0 = jnp.zeros((B,), jnp.int32)
    I = jnp.tile(jnp.asarray(_I0)[None, :], (B, 1))
    MPS = jnp.zeros((B, 19), jnp.uint32)
    S = steps * U * 3 + 3
    sb = jnp.zeros((B, S), jnp.uint8)
    sv = jnp.zeros((B, S), bool)

    def body(carry, x):
        st, sb, sv, t = carry
        bys, vds = [], []
        g0 = t * U
        for u in range(U):
            active = (g0 + u) < n_dec
            st, (b0, v0, b1, v1, b2, v2) = _one_decision(st, x[u], active)
            bys += [b0, b1, b2]
            vds += [v0, v1, v2]
        sb = jax.lax.dynamic_update_slice(sb, jnp.stack(bys, 1), (0, 3 * U * t))
        sv = jax.lax.dynamic_update_slice(sv, jnp.stack(vds, 1), (0, 3 * U * t))
        return (st, sb, sv, t + 1), None

    st0 = (a0, c0, ct0, last0, pos0, I, MPS)
    (st, sb, sv, _), _ = jax.lax.scan(body, (st0, sb, sv, 0), xs_tm)
    fl, lens = _flush(st, n_dec > 0)
    for k, (by, vd) in enumerate(fl):
        sb = sb.at[:, steps * U * 3 + k].set(by)
        sv = sv.at[:, steps * U * 3 + k].set(vd)
    return sb, sv, lens


def compact_rows(vals, valid, cap: int, drop_first: bool = False):
    """Per-lane stable compaction of valid entries via one key sort.
    Returns [B, cap] left-justified rows (drop_first skips each lane's
    first valid entry — the MQ sentinel commit)."""
    B, S = vals.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    key = jnp.where(valid, col, jnp.int32(2 ** 30))
    _, sv = jax.lax.sort_key_val(key, vals, dimension=1)
    if drop_first:
        return sv[:, 1:cap + 1]
    return sv[:, :cap]


def pool_rows(rows, lens, cap_pool: int):
    """Global concatenation of per-lane rows into one pool (exact-size
    fetch).  Returns pool [cap_pool] uint8; offsets recomputed on host via
    the same cumsum of lens."""
    B, W = rows.shape
    ends = jnp.cumsum(lens)
    off = ends - lens
    local = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    key = jnp.where(local < lens[:, None], off[:, None] + local,
                    jnp.int32(2 ** 30))
    _, sv = jax.lax.sort_key_val(key.reshape(-1), rows.reshape(-1))
    take = min(cap_pool, B * W)
    pool = sv[:take]
    if take < cap_pool:
        pool = jnp.pad(pool, (0, cap_pool - take))
    return pool
