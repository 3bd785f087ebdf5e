#!/usr/bin/env python
"""One-shot generator: extract the ISO/IEC 15444-15 CxtVLC table DATA from the
reference's ht_luts.go (which itself carries the OpenJPEG BSD-2 t1_ht_luts.h
constants) and re-emit as a numpy archive in our own layout.

The tables are public standard constants (codeword assignments from T.814),
not implementation code.  Layout per entry (uint16):
  bits[2:0] codeword length, bit[3] u_off, bits[7:4] rho,
  bits[11:8] e_1 pattern, bits[15:12] e_k pattern.
Run once; output committed as go_jpeg2000_tpu/ops/ht_tables.npz.
"""
import re
import sys

import numpy as np

SRC = "/root/reference/internal/entropy/ht_luts.go"


def extract(name: str, text: str, count: int) -> np.ndarray:
    m = re.search(rf"var {name} = \[{count}\]uint16\{{(.*?)\n\}}", text, re.S)
    if not m:
        raise SystemExit(f"table {name} not found")
    vals = [int(v, 16) for v in re.findall(r"0x([0-9a-fA-F]{4})", m.group(1))]
    if len(vals) != count:
        raise SystemExit(f"{name}: expected {count} entries, got {len(vals)}")
    return np.array(vals, dtype=np.uint16)


def invert(tbl: np.ndarray):
    """Build the encoder table: (ctx, rho, u_off, e_1, e_k) -> (cwd, len).

    Verifies the decode table is a consistent prefix code per context."""
    enc = {}
    for ctx in range(8):
        for w in range(128):
            e = int(tbl[(ctx << 7) | w])
            if e == 0:
                continue
            ln = e & 0x7
            if ln == 0:
                continue
            cwd = w & ((1 << ln) - 1)
            key = (ctx, (e >> 4) & 0xF, (e >> 3) & 1, (e >> 8) & 0xF, (e >> 12) & 0xF)
            prev = enc.get(key)
            if prev is not None and prev != (cwd, ln):
                # same semantics can have multiple codewords; keep shortest
                if ln < prev[1]:
                    enc[key] = (cwd, ln)
            else:
                enc[key] = (cwd, ln)
    return enc


def main():
    text = open(SRC).read()
    t0 = extract("vlcTbl0", text, 1024)
    t1 = extract("vlcTbl1", text, 1024)
    enc0 = invert(t0)
    enc1 = invert(t1)
    # encoder tables as flat arrays: key -> packed; store as 2 arrays of
    # (key_packed, cwd | len<<8) pairs
    def pack(enc):
        keys = []
        vals = []
        for (ctx, rho, uoff, e1, ek), (cwd, ln) in sorted(enc.items()):
            keys.append((ctx << 13) | (rho << 9) | (uoff << 8) | (e1 << 4) | ek)
            vals.append(cwd | (ln << 8))
        return np.array(keys, dtype=np.uint32), np.array(vals, dtype=np.uint16)

    k0, v0 = pack(enc0)
    k1, v1 = pack(enc1)
    np.savez_compressed("go_jpeg2000_tpu/ops/ht_tables.npz",
                        dec0=t0, dec1=t1,
                        enc0_keys=k0, enc0_vals=v0,
                        enc1_keys=k1, enc1_vals=v1)
    print(f"dec tables: {len(t0)}+{len(t1)}; enc entries: {len(k0)}+{len(k1)}")
    # sanity: ctx0 has no rho=0 entries (AZC significance comes from MEL)
    rho0 = [(k >> 9) & 0xF for k in k0 if (k >> 13) == 0]
    print("ctx0 rho values (tbl0):", sorted(set(rho0))[:5], "... min:", min(rho0))


if __name__ == "__main__":
    main()
