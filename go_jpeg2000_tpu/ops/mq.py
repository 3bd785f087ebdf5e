"""MQ arithmetic coder (ISO/IEC 15444-1 Annex C) and raw (bypass) coder.

State-machine parity with the reference's MQ coder
(/root/reference/internal/entropy/mqc.go:21-600): identical 47-state Qe
table (the ISO Table C.2 constants), BYTEOUT carry/stuffing, FLUSH/SETBITS,
BYTEIN with >0x8F marker detection, and conditional MPS/LPS exchange.

This is the host-side scalar coder used by the Python Tier-1 oracle; the
production path vectorizes across code-blocks in native code (native/).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

# (Qe, NMPS, NLPS, SWITCH) — ISO/IEC 15444-1 Table C.2.
QE_TABLE: Tuple[Tuple[int, int, int, int], ...] = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0), (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0), (0x0221, 38, 33, 0), (0x5601, 7, 6, 1), (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0), (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1), (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0), (0x4801, 18, 16, 0), (0x3801, 19, 17, 0), (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0), (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0), (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0), (0x1101, 30, 27, 0), (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0), (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0), (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0), (0x0025, 42, 39, 0), (0x0015, 43, 40, 0), (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0), (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)

NUM_CONTEXTS = 19
# EBCOT context ids
CTX_ZC_BASE = 0      # 0..8 zero coding
CTX_SC_BASE = 9      # 9..13 sign coding
CTX_MR_BASE = 14     # 14..16 magnitude refinement
CTX_RL = 17          # run-length
CTX_UNI = 18         # uniform

# Initial (index, mps) per context — Table D.7: all (0,0) except
# UNI=46, RL=3, ZC ctx 0 = 4.
def initial_states() -> List[List[int]]:
    st = [[0, 0] for _ in range(NUM_CONTEXTS)]
    st[CTX_UNI][0] = 46
    st[CTX_RL][0] = 3
    st[CTX_ZC_BASE][0] = 4
    return st


class MQEncoder:
    """MQ encoder (C.3 flowcharts, OpenJPEG-compatible FLUSH)."""

    def __init__(self):
        self.ctx = initial_states()
        self.reset_mq()

    def reset_mq(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        # Sentinel byte plays the role of the byte at BP = BPST-1 (OpenJPEG
        # writes a 0 there); it absorbs a first-byte carry and is stripped
        # from the codeword by flush().
        self.buf = bytearray([0])

    def reset_contexts(self) -> None:
        self.ctx = initial_states()

    # --- C.3.2 BYTEOUT ---
    def _byteout(self) -> None:
        if self.buf[-1] == 0xFF:
            self._stuff()
        else:
            if self.c < 0x8000000:
                self._nostuff()
            else:
                self.buf[-1] += 1  # propagate carry into B
                if self.buf[-1] == 0xFF:
                    self.c &= 0x7FFFFFF
                    self._stuff()
                else:
                    self._nostuff()

    def _stuff(self) -> None:
        # Full byte including a possible carry in bit 27: the byte after an
        # 0xFF may legally reach 0x8F (not 0x7F — the carry bit rides along).
        self.buf.append((self.c >> 20) & 0xFF)
        self.c &= 0xFFFFF
        self.ct = 7

    def _nostuff(self) -> None:
        self.buf.append((self.c >> 19) & 0xFF)
        self.c &= 0x7FFFF
        self.ct = 8

    def _renorm(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, d: int, cx: int) -> None:
        idx, mps = self.ctx[cx]
        qe, nmps, nlps, switch = QE_TABLE[idx]
        if d == mps:
            # CODEMPS
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                self.ctx[cx][0] = nmps
                self._renorm()
            else:
                self.c += qe
        else:
            # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                self.ctx[cx][1] = 1 - mps
            self.ctx[cx][0] = nlps
            self._renorm()

    def flush(self) -> bytes:
        """FLUSH (C.3.4) returning the codeword segment.  Trailing 0xFF is
        dropped (OpenJPEG-compatible; any terminator >0x8F follows)."""
        # SETBITS
        tempc = self.c + self.a - 1
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.final_buf = bytes(self.buf)   # unstripped, for exact_rates
        out = bytes(self.buf[1:])  # strip the BP-1 sentinel
        if out and out[-1] == 0xFF:
            out = out[:-1]
        return out

    def erterm(self) -> bytes:
        """Predictable termination (C.3.5 / D.4.2, OpenJPEG erterm): flush
        the register with enough byteouts that a decoder can detect errors;
        no trailing-0xFF strip."""
        k = 12 - self.ct
        while k > 0:
            self.c = (self.c << self.ct) & 0xFFFFFFFF
            self.ct = 0
            self._byteout()
            k -= self.ct
        if self.buf[-1] != 0xFF:
            self.c = (self.c << self.ct) & 0xFFFFFFFF
            self._byteout()
        self.final_buf = bytes(self.buf)   # unstripped, for exact_rates
        return bytes(self.buf[1:])

    def segment_bytes(self) -> int:
        """Upper bound on bytes needed to terminate now (for pass-length
        accounting): current buffer + worst-case flush spill."""
        return len(self.buf) - 1 + 2

    def mark(self) -> tuple:
        """Snapshot the coder state at a pass boundary for exact D.4.1
        truncation-length computation (`exact_rates`).  The (buf, C, CT)
        triple is a lazy big-integer representation of the code interval's
        lower bound L; A is its width."""
        return (bytes(self.buf), self.c, self.ct, self.a)


def _fold_value(buf: bytes):
    """Abstract code value of a (stuffing-encoded) byte sequence, as the MQ
    decoder perceives it: each byte contributes 8 bit positions, except a
    byte following 0xFF which contributes 7 (C.4 BYTEIN).  Returns
    (value, scale) with value = sum b_j * 2^(scale - pos_j)."""
    v = 0
    scale = 0
    prev_ff = False
    for b in buf:
        w = 7 if prev_ff else 8
        v = (v << w) + b          # big-int add: carries ripple exactly
        scale += w
        prev_ff = b == 0xFF
    return v, scale


def exact_rates(final_buf: bytes, out_len: int, marks) -> list:
    """Sufficient truncation lengths (spec D.4.1 semantics) for a list of
    pass-boundary `mark()` snapshots of one MQ codeword segment.  Every
    returned length is guaranteed VALID (the truncated prefix decodes the
    boundary's passes correctly); it is minimal except in one rare corner:
    the scan's lower bound assumes a short prefix cannot pin its 1-padded
    value inside the code interval, but a padded value congruent to 2^k-1
    can land inside when L+A aligns on a 2^k boundary, so the result may
    occasionally exceed the true minimum by a byte (ADVICE r3).

    final_buf: the unstripped buffer after termination (MQEncoder.final_buf,
    sentinel byte included); out_len: length of the emitted segment (after
    sentinel strip + trailing-0xFF drop).  A truncated segment is correct
    for the passes up to a boundary iff the decoder's perceived value —
    the prefix followed by all 1-bits, which is what BYTEIN feeds past the
    end of data — still lies inside the boundary's code interval
    [L, L+A).  Both bounds must be checked: 1-padding does NOT dominate the
    real continuation, because a byte following 0xFF may carry (its value
    can reach 0x8F, exceeding the 7 one-bits the padding assumes), so the
    padded value can fall below L as well as reach L + A.
    """
    rates = []
    prev_n = 0
    # incremental fold of the final stream (with sentinel)
    pref_v, pref_scale = _fold_value(final_buf[:1])
    folded = 1
    prev_ff = final_buf[0] == 0xFF
    for (mbuf, c, ct, a) in marks:
        top_v, top_scale = _fold_value(mbuf)
        pend = 27 - ct            # pending code-bit positions held in C
        top_v = (top_v << pend) + c + a
        top_scale += pend
        # Sound lower bound on the answer: the code interval's width is
        # a*2^-top_scale with a >= 2^15, so a prefix that leaves more than
        # ~16 low bits undetermined cannot pin the padded value inside it.
        # Starting the scan at (top_scale-32)//8 - 1 (16 bits of slack)
        # keeps the scan O(1) bytes instead of O(segment) per boundary.
        n = max(prev_n, (top_scale - 32) // 8 - 1, 0)
        while True:
            while folded < 1 + n:
                b = final_buf[folded]
                w = 7 if prev_ff else 8
                pref_v = (pref_v << w) + b
                pref_scale += w
                prev_ff = b == 0xFF
                folded += 1
            if n >= out_len:
                break             # full segment always decodes
            m = max(pref_scale, top_scale)
            p_pad = (pref_v << (m - pref_scale)) + ((1 << (m - pref_scale)) - 1)
            top_s = top_v << (m - top_scale)
            low_s = (top_v - a) << (m - top_scale)
            if low_s <= p_pad < top_s:
                break
            n += 1
        rates.append(n)
        prev_n = n
    return rates


class MQDecoder:
    """MQ decoder (C.4 flowcharts)."""

    def __init__(self, data: bytes):
        self.ctx = initial_states()
        self.data = data
        self.init_dec(data)

    def init_dec(self, data: bytes) -> None:
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def reset_contexts(self) -> None:
        self.ctx = initial_states()

    def _bytein(self) -> None:
        data, bp = self.data, self.bp
        cur = data[bp] if bp < len(data) else 0xFF
        if cur == 0xFF:
            nxt = data[bp + 1] if bp + 1 < len(data) else 0xFF
            if nxt > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += nxt << 9
                self.ct = 7
        else:
            self.bp += 1
            nxt = data[self.bp] if self.bp < len(data) else 0xFF
            self.c += nxt << 8
            self.ct = 8

    def _renorm(self) -> None:
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def decode(self, cx: int) -> int:
        idx, mps = self.ctx[cx]
        qe, nmps, nlps, switch = QE_TABLE[idx]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = mps
                self.ctx[cx][0] = nmps
            else:
                d = 1 - mps
                if switch:
                    self.ctx[cx][1] = 1 - mps
                self.ctx[cx][0] = nlps
            self.a = qe
            self._renorm()
        else:
            self.c -= qe << 16
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    d = 1 - mps
                    if switch:
                        self.ctx[cx][1] = 1 - mps
                    self.ctx[cx][0] = nlps
                else:
                    d = mps
                    self.ctx[cx][0] = nmps
                self._renorm()
            else:
                d = mps
        return d


class RawEncoder:
    """Raw (bypass) coder, Annex D.5: plain bits MSB-first with a stuffed 0
    bit after any 0xFF byte."""

    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def _cap(self) -> int:
        return 7 if (self.buf and self.buf[-1] == 0xFF) else 8

    def encode_bit(self, bit: int) -> None:
        self._acc = (self._acc << 1) | (bit & 1)
        self._n += 1
        if self._n == self._cap():
            self.buf.append(self._acc)
            self._acc = 0
            self._n = 0

    def flush(self) -> bytes:
        if self._n:
            cap = self._cap()
            self._acc <<= cap - self._n
            self.buf.append(self._acc)
            self._acc = 0
            self._n = 0
        out = bytes(self.buf)
        if out and out[-1] == 0xFF:
            out = out[:-1]
        return out

    def erterm(self) -> bytes:
        """Predictable termination for raw segments (D.4.2): pad the final
        byte with the alternating sequence 0,1,0,1,…"""
        bitv = 0
        while self._n:
            self.encode_bit(bitv)   # respects the 7-bit-after-0xFF rule
            bitv = 1 - bitv
        out = bytes(self.buf)
        if out and out[-1] == 0xFF:
            out = out[:-1]
        return out


class RawDecoder:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0
        self._prev = 0

    def decode_bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos] if self.pos < len(self.data) else 0xFF
            self.pos += 1
            cap = 7 if self._prev == 0xFF else 8
            self._acc = b & ((1 << cap) - 1)
            self._n = cap
            self._prev = b
        self._n -= 1
        return (self._acc >> self._n) & 1
