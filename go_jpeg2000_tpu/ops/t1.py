"""EBCOT Tier-1 code-block coder (ISO/IEC 15444-1 Annex D) — Python oracle.

Behavior parity with the reference's T1 coder
(/root/reference/internal/entropy/t1.go:93-1410): three passes per bitplane
(significance propagation, magnitude refinement, cleanup with 4-row
run-length), ZC/SC/MR context modeling, stripe-oriented scan — plus the mode
switches the full standard defines (BYPASS, RESET, TERMALL, VSC, SEGSYM)
and per-pass rate/distortion tracking for PCRD-opt (absent in the reference).

This is the correctness oracle ("EncodeSafe" analog, t1.go:923); the
production path is the vectorized native coder in native/, differentially
tested against this one.

Coordinates: code-block local (x right, y down); data is sign-magnitude.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..utils import markers as mk

# internal style bit (mirrors j2k_native.cpp STY_LOSSY_BIAS): reconstruct
# truncated lossy blocks at the midpoint of each sample's last-updated
# bitplane (OpenJPEG's oneplushalf).  Not a codestream cb_style bit.
STY_LOSSY_BIAS = 0x200

from .mq import (CTX_RL, CTX_UNI, MQDecoder, MQEncoder, RawDecoder,
                 RawEncoder)

# --- context lookup tables (Tables D-1..D-4), built at import ---------------

def _build_zc_lut() -> np.ndarray:
    """lut[band_class, h, v, d] -> ZC context 0..8.
    band_class: 0 = LL/LH (H primary), 1 = HL (V primary), 2 = HH."""
    lut = np.zeros((3, 3, 3, 5), dtype=np.int32)
    for h in range(3):
        for v in range(3):
            for d in range(5):
                # class A: H primary
                if h == 2:
                    c = 8
                elif h == 1:
                    c = 7 if v >= 1 else (6 if d >= 1 else 5)
                elif v == 2:
                    c = 4
                elif v == 1:
                    c = 3
                elif d >= 2:
                    c = 2
                elif d == 1:
                    c = 1
                else:
                    c = 0
                lut[0, h, v, d] = c
                lut[1, v, h, d] = c  # HL: swap roles of H and V
                # class HH: D primary
                hv = h + v
                if d >= 3:
                    c = 8
                elif d == 2:
                    c = 7 if hv >= 1 else 6
                elif d == 1:
                    c = 5 if hv >= 2 else (4 if hv == 1 else 3)
                else:
                    c = 2 if hv >= 2 else (1 if hv == 1 else 0)
                lut[2, h, v, d] = c
    return lut


ZC_LUT = _build_zc_lut()

# SC table D-3: keyed by (Hc+1, Vc+1) -> (context, xor_bit)
SC_TABLE = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}

BAND_CLASS = {"LL": 0, "LH": 0, "HL": 1, "HH": 2}


@dataclasses.dataclass
class PassInfo:
    """Per-coding-pass record for Tier-2 and PCRD."""
    pass_type: int          # 0 = SPP, 1 = MRP, 2 = CP
    bitplane: int
    rate: int               # cumulative codeword bytes usable to truncate here
    distortion: float       # cumulative distortion *reduction* (integer^2 units)
    terminated: bool        # codeword segment ends after this pass


@dataclasses.dataclass
class T1EncodeResult:
    data: bytes                     # concatenated codeword segments
    num_bitplanes: int              # magnitude bitplanes coded (numbps)
    passes: List[PassInfo]
    segment_lengths: List[int]      # byte length of each terminated segment


def _num_segments(num_passes: int, cb_style: int) -> List[int]:
    """Pass counts per codeword segment for the given mode flags."""
    if num_passes == 0:
        return []
    if cb_style & mk.CBSTYLE_TERMALL:
        return [1] * num_passes
    if cb_style & mk.CBSTYLE_LAZY:
        # Segment boundaries at every MQ<->raw switch: passes 0..9 MQ, then
        # [SPP+MRP raw] / [CP MQ] alternating.
        out = []
        p = 0
        first = min(10, num_passes)
        out.append(first)
        p = first
        while p < num_passes:
            n = min(2, num_passes - p)   # raw SPP+MRP
            out.append(n)
            p += n
            if p < num_passes:
                out.append(1)            # MQ cleanup
                p += 1
        return out
    return [num_passes]


class _CoderState:
    """Shared per-block state for encode/decode."""

    def __init__(self, w: int, h: int, band: str, cb_style: int):
        self.w = w
        self.h = h
        self.stride = w + 2
        n = (h + 2) * (w + 2)
        self.sigma = [0] * n       # significant
        self.eta = [0] * n         # refined at least once
        self.pi = [0] * n          # coded in current bitplane's SPP
        self.sign = [0] * n        # 1 = negative (valid when sigma)
        self.band_class = BAND_CLASS[band]
        self.vsc = bool(cb_style & mk.CBSTYLE_VSC)

    def idx(self, x: int, y: int) -> int:
        return (y + 1) * self.stride + (x + 1)

    def neighbor_counts(self, pos: int, y: int) -> Tuple[int, int, int]:
        s = self.sigma
        st = self.stride
        hsum = s[pos - 1] + s[pos + 1]
        if self.vsc and (y & 3) == 3:
            vsum = s[pos - st]
            dsum = s[pos - st - 1] + s[pos - st + 1]
        else:
            vsum = s[pos - st] + s[pos + st]
            dsum = (s[pos - st - 1] + s[pos - st + 1]
                    + s[pos + st - 1] + s[pos + st + 1])
        return hsum, vsum, dsum

    def zc_context(self, pos: int, y: int) -> int:
        hsum, vsum, dsum = self.neighbor_counts(pos, y)
        return int(ZC_LUT[self.band_class, hsum, vsum, dsum])

    def sc_context(self, pos: int, y: int) -> Tuple[int, int]:
        s, sg, st = self.sigma, self.sign, self.stride
        def contrib(p):
            if not s[p]:
                return 0
            return -1 if sg[p] else 1
        hc = contrib(pos - 1) + contrib(pos + 1)
        hc = max(-1, min(1, hc))
        if self.vsc and (y & 3) == 3:
            vc = contrib(pos - st)   # S neighbor outside causal stripe
        else:
            vc = contrib(pos - st) + contrib(pos + st)
        vc = max(-1, min(1, vc))
        return SC_TABLE[(hc, vc)]

    def mr_context(self, pos: int, y: int) -> int:
        if self.eta[pos]:
            return 16
        hsum, vsum, dsum = self.neighbor_counts(pos, y)
        return 15 if (hsum + vsum + dsum) else 14


class _SegmentedWriter:
    """Manages MQ/raw codeword segments and pass-boundary termination.

    Non-terminated pass boundaries record exact-rate marks (mq.mark());
    terminate() resolves them to spec-exact minimal truncation lengths via
    mq.exact_rates (D.4.1 semantics: the 1-padded prefix must stay inside
    the boundary's code interval)."""

    def __init__(self, cb_style: int, trace: Optional[list] = None):
        self.cb_style = cb_style
        self._pterm = bool(cb_style & mk.CBSTYLE_PTERM)
        self.mq = MQEncoder()
        self.raw: Optional[RawEncoder] = None
        self.segments: List[bytes] = []
        self.out = bytearray()
        self._mode_raw = False
        self._marks: List[tuple] = []    # (pass_index, kind, payload)
        self.rates = {}                  # pass_index -> exact cumulative rate
        self.trace = trace               # optional (ctx, bit) decision log

    def mark_pass(self, pass_index: int) -> None:
        """Record a non-terminated pass boundary for exact-rate resolution."""
        if self._mode_raw:
            n = len(self.raw.buf) + (1 if self.raw._n else 0)
            self._marks.append((pass_index, "raw", n))
        else:
            self._marks.append((pass_index, "mq", self.mq.mark()))

    def set_mode(self, raw: bool) -> None:
        if raw and not self._mode_raw:
            self.raw = RawEncoder()
        self._mode_raw = raw

    def terminate(self) -> int:
        """Terminate the current segment; returns its length."""
        from .mq import exact_rates
        base = len(self.out)
        if self._mode_raw:
            seg = self.raw.erterm() if self._pterm else self.raw.flush()
            self.raw = RawEncoder()
            for (idx, kind, payload) in self._marks:
                self.rates[idx] = base + min(payload, len(seg))
        else:
            seg = self.mq.erterm() if self._pterm else self.mq.flush()
            mq_marks = [(i, p) for (i, k, p) in self._marks if k == "mq"]
            if mq_marks:
                rs = exact_rates(self.mq.final_buf, len(seg),
                                 [p for _, p in mq_marks])
                for (idx, _), n in zip(mq_marks, rs):
                    self.rates[idx] = base + n
            self.mq.reset_mq()
        self._marks = []
        self.segments.append(seg)
        self.out.extend(seg)
        return len(seg)

    def encode_bit_mq(self, d: int, cx: int) -> None:
        if self.trace is not None:
            self.trace.append((cx, d))
        self.mq.encode(d, cx)

    def encode_bit_raw(self, d: int) -> None:
        if self.trace is not None:
            self.trace.append((-1, d))
        self.raw.encode_bit(d)


def encode_block(coeffs: np.ndarray, band: str, cb_style: int = 0,
                 max_bitplanes: Optional[int] = None,
                 trace: Optional[list] = None) -> T1EncodeResult:
    """Encode one code-block of signed integer coefficients.

    Returns codeword segments + per-pass rate/distortion for PCRD-opt.
    `trace`, if a list, receives every (ctx, bit) MQ decision in emission
    order (ctx -1 for raw-mode bits) — the differential oracle for the
    device decision kernel (ops/ebcot_device.py).
    """
    coeffs = np.asarray(coeffs, dtype=np.int64)
    h, w = coeffs.shape
    mags = np.abs(coeffs)
    maxmag = int(mags.max()) if mags.size else 0
    numbps = int(maxmag).bit_length()
    if max_bitplanes is not None:
        numbps = min(numbps, max_bitplanes) if numbps else 0
    if numbps == 0:
        return T1EncodeResult(b"", 0, [], [])

    st = _CoderState(w, h, band, cb_style)
    # magnitude / sign into padded flat arrays
    v = [0] * ((h + 2) * (w + 2))
    for y in range(h):
        base = (y + 1) * st.stride + 1
        row_m = mags[y]
        row_c = coeffs[y]
        for x in range(w):
            v[base + x] = int(row_m[x])
            st.sign[base + x] = 1 if row_c[x] < 0 else 0

    wri = _SegmentedWriter(cb_style, trace)
    lazy = bool(cb_style & mk.CBSTYLE_LAZY)
    reset = bool(cb_style & mk.CBSTYLE_RESET)
    termall = bool(cb_style & mk.CBSTYLE_TERMALL)
    segsym = bool(cb_style & mk.CBSTYLE_SEGSYM)

    passes: List[PassInfo] = []
    dist_total = 0.0
    # current reconstruction magnitude per sample (decoder view)
    rec = [0] * len(v)

    def dist_delta(pos: int, plane: int, refine: bool) -> float:
        """Update rec[pos] for this event; return squared-error reduction."""
        true = v[pos]
        old = rec[pos]
        if refine:
            # decoder knows bits down to `plane`; midpoint of new interval
            base = (true >> plane) << plane
            new = base + ((1 << (plane - 1)) if plane > 0 else 0)
        else:
            # became significant at `plane`
            base = 1 << plane
            new = base + ((1 << (plane - 1)) if plane > 0 else 0)
        rec[pos] = new
        e_old = (true - old) ** 2
        e_new = (true - new) ** 2
        return float(e_old - e_new)

    pass_idx = 0

    def end_pass(ptype: int, plane: int) -> None:
        nonlocal pass_idx
        is_last_of_segment = False
        # decide termination
        if termall:
            is_last_of_segment = True
        elif lazy:
            # boundaries: after pass 9; after each raw MRP; after each MQ CP
            # (pass indices from 0)
            nxt = pass_idx + 1
            if nxt >= 10:
                cur_raw = _pass_is_raw(pass_idx, lazy)
                nxt_raw = _pass_is_raw(nxt, lazy)
                if cur_raw != nxt_raw:
                    is_last_of_segment = True
        passes.append(PassInfo(ptype, plane, 0, dist_total, is_last_of_segment))
        if is_last_of_segment:
            wri.terminate()
            # terminated pass: rate = segment end (the next segment's bytes
            # start here; T2 length signaling needs the full segment)
            passes[-1].rate = len(wri.out)
        else:
            wri.mark_pass(len(passes) - 1)
        if reset:
            wri.mq.reset_contexts()
        pass_idx += 1

    for plane in range(numbps - 1, -1, -1):
        bit_mask = 1 << plane
        first_plane = (plane == numbps - 1)
        use_raw = lazy and pass_idx >= 10

        # --- significance propagation pass -----------------------------
        if not first_plane:
            wri.set_mode(use_raw)
            for y0 in range(0, h, 4):
                for x in range(w):
                    for y in range(y0, min(y0 + 4, h)):
                        pos = st.idx(x, y)
                        if st.sigma[pos]:
                            continue
                        hsum, vsum, dsum = st.neighbor_counts(pos, y)
                        if hsum + vsum + dsum == 0:
                            continue
                        bit = 1 if v[pos] & bit_mask else 0
                        if use_raw:
                            wri.encode_bit_raw(bit)
                        else:
                            wri.encode_bit_mq(bit, st.zc_context(pos, y))
                        if bit:
                            if use_raw:
                                wri.encode_bit_raw(st.sign[pos])
                            else:
                                cx, xr = st.sc_context(pos, y)
                                wri.encode_bit_mq(st.sign[pos] ^ xr, cx)
                            st.sigma[pos] = 1
                            dist_total += dist_delta(pos, plane, False)
                        st.pi[pos] = 1
            end_pass(0, plane)

        # --- magnitude refinement pass ----------------------------------
        if not first_plane:
            use_raw = lazy and pass_idx >= 10
            wri.set_mode(use_raw)
            for y0 in range(0, h, 4):
                for x in range(w):
                    for y in range(y0, min(y0 + 4, h)):
                        pos = st.idx(x, y)
                        if not st.sigma[pos] or st.pi[pos]:
                            continue
                        bit = 1 if v[pos] & bit_mask else 0
                        if use_raw:
                            wri.encode_bit_raw(bit)
                        else:
                            wri.encode_bit_mq(bit, st.mr_context(pos, y))
                        st.eta[pos] = 1
                        dist_total += dist_delta(pos, plane, True)
            end_pass(1, plane)

        # --- cleanup pass ----------------------------------------------
        wri.set_mode(False)
        for y0 in range(0, h, 4):
            for x in range(w):
                y = y0
                stripe_h = min(4, h - y0)
                # run-length mode: full stripe, all four insignificant with
                # no significant neighbors and not coded in SPP
                use_rl = False
                if stripe_h == 4:
                    use_rl = True
                    for yy in range(y0, y0 + 4):
                        p = st.idx(x, yy)
                        if st.sigma[p] or st.pi[p]:
                            use_rl = False
                            break
                        hs, vs, ds = st.neighbor_counts(p, yy)
                        if hs + vs + ds:
                            use_rl = False
                            break
                if use_rl:
                    first_sig = -1
                    for r, yy in enumerate(range(y0, y0 + 4)):
                        if v[st.idx(x, yy)] & bit_mask:
                            first_sig = r
                            break
                    if first_sig < 0:
                        wri.encode_bit_mq(0, CTX_RL)
                        for yy in range(y0, y0 + 4):
                            st.pi[st.idx(x, yy)] = 0
                        continue
                    wri.encode_bit_mq(1, CTX_RL)
                    wri.encode_bit_mq((first_sig >> 1) & 1, CTX_UNI)
                    wri.encode_bit_mq(first_sig & 1, CTX_UNI)
                    yy = y0 + first_sig
                    pos = st.idx(x, yy)
                    cx, xr = st.sc_context(pos, yy)
                    wri.encode_bit_mq(st.sign[pos] ^ xr, cx)
                    st.sigma[pos] = 1
                    dist_total += dist_delta(pos, plane, False)
                    y = yy + 1
                # remaining samples in stripe: normal cleanup coding
                for yy in range(y, y0 + stripe_h):
                    pos = st.idx(x, yy)
                    if st.pi[pos]:
                        st.pi[pos] = 0
                        continue
                    if st.sigma[pos]:
                        continue
                    bit = 1 if v[pos] & bit_mask else 0
                    wri.encode_bit_mq(bit, st.zc_context(pos, yy))
                    if bit:
                        cx, xr = st.sc_context(pos, yy)
                        wri.encode_bit_mq(st.sign[pos] ^ xr, cx)
                        st.sigma[pos] = 1
                        dist_total += dist_delta(pos, plane, False)
                # clear pi for samples before y (rl-skipped ones)
                for yy in range(y0, y):
                    st.pi[st.idx(x, yy)] = 0
        if segsym:
            for b in (1, 0, 1, 0):
                wri.encode_bit_mq(b, CTX_UNI)
        end_pass(2, plane)

    # final termination
    if not passes[-1].terminated:
        passes[-1].terminated = True
        wri._marks.pop()        # the last pass's mark is superseded
        wri.terminate()
        passes[-1].rate = len(wri.out)
    # apply exact rates resolved at segment terminations (spec D.4.1:
    # minimal prefix lengths that still decode each pass — replaces the
    # old monotone-clamped upper-bound estimates)
    for idx, r in wri.rates.items():
        passes[idx].rate = r
    for i in range(len(passes) - 1):
        assert passes[i].rate <= passes[i + 1].rate, "rates must be monotone"
    seg_lens = [len(s) for s in wri.segments]
    return T1EncodeResult(bytes(wri.out), numbps, passes, seg_lens)


def _pass_is_raw(pass_idx: int, lazy: bool) -> bool:
    """Pass index -> uses raw coding?  (Pass 0 = first CP; then SPP,MRP,CP
    triplets.)  With lazy mode, SPP/MRP from index >= 10 are raw."""
    if not lazy or pass_idx < 10:
        return False
    # indices: 0=CP, then (1,2,3)=(SPP,MRP,CP), (4,5,6), ...
    phase = (pass_idx - 1) % 3   # 0=SPP, 1=MRP, 2=CP
    return phase in (0, 1)


def decode_block(data: bytes, w: int, h: int, numbps: int, num_passes: int,
                 band: str, cb_style: int = 0,
                 segment_lengths: Optional[Sequence[int]] = None) -> np.ndarray:
    """Decode one code-block; returns signed integer coefficients [h, w].

    `data` is the concatenation of codeword segments; `segment_lengths`
    gives their byte lengths (required for multi-segment modes; defaults to
    one segment).
    """
    if numbps == 0 or num_passes == 0:
        return np.zeros((h, w), dtype=np.int32)
    st = _CoderState(w, h, band, cb_style)
    lazy = bool(cb_style & mk.CBSTYLE_LAZY)
    reset = bool(cb_style & mk.CBSTYLE_RESET)
    segsym = bool(cb_style & mk.CBSTYLE_SEGSYM)

    seg_pass_counts = _num_segments(num_passes, cb_style)
    if segment_lengths is None:
        segment_lengths = [len(data)]
    if len(segment_lengths) != len(seg_pass_counts):
        # tolerate: single segment fallback
        seg_pass_counts = [num_passes]
        segment_lengths = [len(data)]

    # segment byte ranges
    seg_ranges = []
    off = 0
    for ln in segment_lengths:
        seg_ranges.append((off, off + ln))
        off += ln

    v = [0] * ((h + 2) * (w + 2))   # decoded magnitudes
    lossy_bias = bool(cb_style & STY_LOSSY_BIAS)
    lp = [0] * ((h + 2) * (w + 2))  # last-updated plane (lossy bias)
    mq: Optional[MQDecoder] = None
    raw: Optional[RawDecoder] = None
    seg_i = -1
    passes_left_in_seg = 0
    cur_raw = False

    def open_segment(pass_idx: int) -> None:
        nonlocal mq, raw, seg_i, passes_left_in_seg, cur_raw
        seg_i += 1
        s, e = seg_ranges[seg_i] if seg_i < len(seg_ranges) else (0, 0)
        seg = data[s:e]
        cur_raw = _pass_is_raw(pass_idx, lazy)
        if cur_raw:
            raw = RawDecoder(seg)
        else:
            ctx_backup = mq.ctx if mq is not None else None
            mq = MQDecoder(seg)
            if ctx_backup is not None:
                mq.ctx = ctx_backup   # contexts persist across segments
        passes_left_in_seg = seg_pass_counts[seg_i] if seg_i < len(seg_pass_counts) else 1

    pass_idx = 0

    def begin_pass() -> None:
        nonlocal passes_left_in_seg
        if passes_left_in_seg == 0:
            open_segment(pass_idx)

    def finish_pass() -> None:
        nonlocal pass_idx, passes_left_in_seg
        passes_left_in_seg -= 1
        if reset and mq is not None:
            mq.reset_contexts()
        pass_idx += 1

    total = 0
    for plane in range(numbps - 1, -1, -1):
        first_plane = (plane == numbps - 1)
        bit_val = 1 << plane

        if not first_plane:
            if total >= num_passes:
                break
            begin_pass()
            use_raw = cur_raw
            for y0 in range(0, h, 4):
                for x in range(w):
                    for y in range(y0, min(y0 + 4, h)):
                        pos = st.idx(x, y)
                        if st.sigma[pos]:
                            continue
                        hs, vs, ds = st.neighbor_counts(pos, y)
                        if hs + vs + ds == 0:
                            continue
                        if use_raw:
                            bit = raw.decode_bit()
                        else:
                            bit = mq.decode(st.zc_context(pos, y))
                        if bit:
                            if use_raw:
                                st.sign[pos] = raw.decode_bit()
                            else:
                                cx, xr = st.sc_context(pos, y)
                                st.sign[pos] = mq.decode(cx) ^ xr
                            st.sigma[pos] = 1
                            v[pos] |= bit_val
                            lp[pos] = plane
                        st.pi[pos] = 1
            finish_pass()
            total += 1

        if not first_plane:
            if total >= num_passes:
                break
            begin_pass()
            use_raw = cur_raw
            for y0 in range(0, h, 4):
                for x in range(w):
                    for y in range(y0, min(y0 + 4, h)):
                        pos = st.idx(x, y)
                        if not st.sigma[pos] or st.pi[pos]:
                            continue
                        if use_raw:
                            bit = raw.decode_bit()
                        else:
                            bit = mq.decode(st.mr_context(pos, y))
                        st.eta[pos] = 1
                        if bit:
                            v[pos] |= bit_val
                        lp[pos] = plane
            finish_pass()
            total += 1

        if total >= num_passes:
            break
        begin_pass()
        for y0 in range(0, h, 4):
            for x in range(w):
                y = y0
                stripe_h = min(4, h - y0)
                use_rl = False
                if stripe_h == 4:
                    use_rl = True
                    for yy in range(y0, y0 + 4):
                        p = st.idx(x, yy)
                        if st.sigma[p] or st.pi[p]:
                            use_rl = False
                            break
                        hs, vs, ds = st.neighbor_counts(p, yy)
                        if hs + vs + ds:
                            use_rl = False
                            break
                if use_rl:
                    if mq.decode(CTX_RL) == 0:
                        for yy in range(y0, y0 + 4):
                            st.pi[st.idx(x, yy)] = 0
                        continue
                    r = (mq.decode(CTX_UNI) << 1) | mq.decode(CTX_UNI)
                    yy = y0 + r
                    pos = st.idx(x, yy)
                    cx, xr = st.sc_context(pos, yy)
                    st.sign[pos] = mq.decode(cx) ^ xr
                    st.sigma[pos] = 1
                    v[pos] |= bit_val
                    lp[pos] = plane
                    y = yy + 1
                for yy in range(y, y0 + stripe_h):
                    pos = st.idx(x, yy)
                    if st.pi[pos]:
                        st.pi[pos] = 0
                        continue
                    if st.sigma[pos]:
                        continue
                    bit = mq.decode(st.zc_context(pos, yy))
                    if bit:
                        cx, xr = st.sc_context(pos, yy)
                        st.sign[pos] = mq.decode(cx) ^ xr
                        st.sigma[pos] = 1
                        v[pos] |= bit_val
                        lp[pos] = plane
                for yy in range(y0, y):
                    st.pi[st.idx(x, yy)] = 0
        if segsym:
            for _ in range(4):
                mq.decode(CTX_UNI)
        finish_pass()
        total += 1

    out = np.zeros((h, w), dtype=np.int32)
    for y in range(h):
        base = (y + 1) * st.stride + 1
        for x in range(w):
            m = v[base + x]
            if lossy_bias and st.sigma[base + x]:
                # x2 fixed-point midpoint of the undecoded interval
                # (OpenJPEG's oneplushalf convention — the half survives
                # even at plane 0; dequantizer multiplies by delta/2)
                m = (m << 1) + (1 << lp[base + x])
            out[y, x] = -m if st.sign[base + x] else m
    return out
