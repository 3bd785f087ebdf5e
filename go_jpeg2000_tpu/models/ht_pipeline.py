"""HTJ2K (ISO/IEC 15444-15) encode/decode pipeline — placeholder wiring.

The HT block coder (MEL/VLC/MagSgn cleanup + SigProp + MagRef) lands in
ops/ht.py; until then the pipeline raises cleanly.
"""
from __future__ import annotations


def encode_ht(image, opts):
    raise NotImplementedError("HTJ2K encode: ops/ht.py block coder pending")


def decode_ht(codestream, header, parser, config, jp2):
    raise NotImplementedError("HTJ2K decode: ops/ht.py block coder pending")
