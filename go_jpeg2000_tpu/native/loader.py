"""Native (C++) entropy backend loader — builds and binds j2k_native.so.

The native library vectorizes T1/HT block coding across code-blocks with a
thread pool (the TPU-native analog of the reference's goroutine pool,
/root/reference/encoder.go:690-742, and its assembly kernels).
"""
from __future__ import annotations


def available() -> bool:
    return False  # C++ backend lands next


def encode_blocks(jobs):
    raise RuntimeError("native backend not built")


def decode_blocks(jobs):
    raise RuntimeError("native backend not built")
