"""Bit-level I/O for packet headers and marker payloads.

Implements the JPEG 2000 packet-header bit packing of ISO/IEC 15444-1 B.10.1:
MSB-first bits with 0xFF bit-stuffing — after an 0xFF byte only seven bits are
packed into the following byte (its MSB is a stuffed 0).  Capability parity
with the reference's bio package (/root/reference/internal/bio/bio.go:8-279),
re-designed around bytearray buffers.
"""
from __future__ import annotations


class BitWriter:
    """MSB-first bit writer with optional JPEG 2000 0xFF bit stuffing."""

    __slots__ = ("buf", "_acc", "_n", "stuffing")

    def __init__(self, stuffing: bool = True):
        self.buf = bytearray()
        self._acc = 0      # bit accumulator for the current byte
        self._n = 0        # bits currently in the accumulator
        self.stuffing = stuffing

    def _byte_capacity(self) -> int:
        # After an 0xFF byte the next byte holds only 7 bits.
        if self.stuffing and self.buf and self.buf[-1] == 0xFF:
            return 7
        return 8

    def write_bit(self, bit: int) -> None:
        self._acc = (self._acc << 1) | (bit & 1)
        self._n += 1
        if self._n == self._byte_capacity():
            self.buf.append(self._acc)
            self._acc = 0
            self._n = 0

    def write_bits(self, value: int, count: int) -> None:
        for i in range(count - 1, -1, -1):
            self.write_bit((value >> i) & 1)

    def flush(self) -> None:
        """Pad the final byte with 0 bits; if it lands on 0xFF, emit the
        stuffed empty byte (OpenJPEG bio_flush semantics)."""
        if self._n > 0:
            cap = self._byte_capacity()
            self._acc <<= (cap - self._n)
            self.buf.append(self._acc)
            self._acc = 0
            self._n = 0
        if self.stuffing and self.buf and self.buf[-1] == 0xFF:
            self.buf.append(0x00)

    def getvalue(self) -> bytes:
        return bytes(self.buf)


class BitReader:
    """MSB-first bit reader mirroring :class:`BitWriter`."""

    __slots__ = ("data", "pos", "_acc", "_n", "stuffing", "_prev_byte")

    def __init__(self, data: bytes, stuffing: bool = True):
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0
        self.stuffing = stuffing
        self._prev_byte = 0

    def _load_byte(self) -> None:
        if self.pos >= len(self.data):
            # Spec allows reading past the end of a truncated header: the
            # missing bits read as 1s would break tag trees — OpenJPEG feeds
            # 0xFF bytes at EOF for the MQ coder but 0 bits terminate packet
            # headers safely.  Feed zero bits.
            b = 0
        else:
            b = self.data[self.pos]
            self.pos += 1
        cap = 7 if (self.stuffing and self._prev_byte == 0xFF) else 8
        self._acc = b & ((1 << cap) - 1)
        self._n = cap
        self._prev_byte = b

    def read_bit(self) -> int:
        if self._n == 0:
            self._load_byte()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        """Byte-align after a packet header; if the last consumed byte was
        0xFF, skip the stuffed byte (OpenJPEG bio_inalign semantics)."""
        self._acc = 0
        self._n = 0
        if self.stuffing and self._prev_byte == 0xFF:
            if self.pos < len(self.data):
                self._prev_byte = self.data[self.pos]
                self.pos += 1
            else:
                self._prev_byte = 0

    def bytes_consumed(self) -> int:
        return self.pos
