"""JPEG 2000 codestream marker constants (ISO/IEC 15444-1 Annex A).

Marker grammar parity with the reference's marker table
(/root/reference/internal/codestream/markers.go:6-45) — the constants are
ISO-defined, not implementation-specific.
"""
from __future__ import annotations

# --- Delimiting markers ---
SOC = 0xFF4F  # Start of codestream
SOT = 0xFF90  # Start of tile-part
SOD = 0xFF93  # Start of data
EOC = 0xFFD9  # End of codestream

# --- Fixed information marker segments ---
SIZ = 0xFF51  # Image and tile size

# --- Functional marker segments ---
COD = 0xFF52  # Coding style default
COC = 0xFF53  # Coding style component
RGN = 0xFF5E  # Region of interest
QCD = 0xFF5C  # Quantization default
QCC = 0xFF5D  # Quantization component
POC = 0xFF5F  # Progression order change

# --- Pointer marker segments ---
TLM = 0xFF55  # Tile-part lengths
PLM = 0xFF57  # Packet length, main header
PLT = 0xFF58  # Packet length, tile-part header
PPM = 0xFF60  # Packed packet headers, main header
PPT = 0xFF61  # Packed packet headers, tile-part header

# --- In-bitstream markers ---
SOP = 0xFF91  # Start of packet
EPH = 0xFF92  # End of packet header

# --- Informational marker segments ---
CRG = 0xFF63  # Component registration
COM = 0xFF64  # Comment

# --- Part 2 / Part 15 extensions ---
CAP = 0xFF50  # Extended capabilities (Part 15 HTJ2K signalling)
PRF = 0xFF56  # Profile
CPF = 0xFF59  # Corresponding profile
CBD = 0xFF78  # Component bit depth definition (Part 2)
MCT = 0xFF74  # Multiple component transform (Part 2)
MCC = 0xFF75  # Multiple component collection (Part 2)
MCO = 0xFF77  # Multiple component ordering (Part 2)

# COM marker registration values
COMMENT_BINARY = 0
COMMENT_LATIN1 = 1

# --- Scod / coding style flags (A.6.1) ---
SCOD_PRECINCTS_DEFINED = 0x01
SCOD_SOP = 0x02
SCOD_EPH = 0x04

# --- Code-block style flags (SPcod, Table A.19) ---
CBSTYLE_LAZY = 0x01          # selective arithmetic coding bypass
CBSTYLE_RESET = 0x02         # reset context probabilities between passes
CBSTYLE_TERMALL = 0x04       # termination on each coding pass
CBSTYLE_VSC = 0x08           # vertically causal context
CBSTYLE_PTERM = 0x10         # predictable termination
CBSTYLE_SEGSYM = 0x20        # segmentation symbols
CBSTYLE_HT = 0x40            # HT code blocks (Part 15, Table 5 of 15444-15)
CBSTYLE_HT_MIXED = 0x80      # HT mixed mode (Part 15)

# --- Quantization style (Sqcd, Table A.28) ---
QUANT_NONE = 0               # no quantization (reversible)
QUANT_SCALAR_DERIVED = 1     # scalar, values signalled for LL only
QUANT_SCALAR_EXPOUNDED = 2   # scalar, values signalled for every subband

# --- CAP marker Pcap bits ---
CAP_PCAP_HTJ2K = 0x00020000  # Pcap bit 15 (counted from MSB: bit for Part 15)


def pcap_bit(part: int) -> int:
    """Pcap bit for ISO 15444-`part` — bit (32 - part) of the 32-bit Pcap."""
    return 1 << (32 - part)


# Markers that stand alone (no length field): SOC, SOD, EOC, and SOP/EPH
# have length but are in-bitstream.
_NO_LENGTH = {SOC, SOD, EOC}


def has_length(marker: int) -> bool:
    """True if the marker is followed by a 16-bit segment length."""
    return marker not in _NO_LENGTH


def is_delimiter(marker: int) -> bool:
    return marker in (SOC, SOT, SOD, EOC)


def marker_name(marker: int) -> str:
    names = {
        SOC: "SOC", SOT: "SOT", SOD: "SOD", EOC: "EOC", SIZ: "SIZ",
        COD: "COD", COC: "COC", RGN: "RGN", QCD: "QCD", QCC: "QCC",
        POC: "POC", TLM: "TLM", PLM: "PLM", PLT: "PLT", PPM: "PPM",
        PPT: "PPT", SOP: "SOP", EPH: "EPH", CRG: "CRG", COM: "COM",
        CAP: "CAP", PRF: "PRF", CPF: "CPF", CBD: "CBD", MCT: "MCT",
        MCC: "MCC", MCO: "MCO",
    }
    return names.get(marker, f"0x{marker:04X}")
