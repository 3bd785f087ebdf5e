#!/usr/bin/env python
"""Minimal ctypes harness over libopenjp2 for conformance debugging:
decodes a .j2k/.jp2 file and surfaces OpenJPEG's info/warning/error messages
(PIL swallows them)."""
from __future__ import annotations

import ctypes
import ctypes.util
import sys

import numpy as np

_lib = None


def lib():
    global _lib
    if _lib is None:
        for cand in ["/usr/lib/x86_64-linux-gnu/libopenjp2.so.2.5.0",
                     ctypes.util.find_library("openjp2")]:
            if cand:
                try:
                    _lib = ctypes.CDLL(cand)
                    break
                except OSError:
                    continue
        if _lib is None:
            raise RuntimeError("libopenjp2 not found")
    return _lib


class ImageComp(ctypes.Structure):
    _fields_ = [("dx", ctypes.c_uint32), ("dy", ctypes.c_uint32),
                ("w", ctypes.c_uint32), ("h", ctypes.c_uint32),
                ("x0", ctypes.c_uint32), ("y0", ctypes.c_uint32),
                ("prec", ctypes.c_uint32), ("bpp", ctypes.c_uint32),
                ("sgnd", ctypes.c_uint32), ("resno_decoded", ctypes.c_uint32),
                ("factor", ctypes.c_uint32),
                ("data", ctypes.POINTER(ctypes.c_int32)),
                ("alpha", ctypes.c_uint16)]


class Image(ctypes.Structure):
    _fields_ = [("x0", ctypes.c_uint32), ("y0", ctypes.c_uint32),
                ("x1", ctypes.c_uint32), ("y1", ctypes.c_uint32),
                ("numcomps", ctypes.c_uint32), ("color_space", ctypes.c_int),
                ("comps", ctypes.POINTER(ImageComp)),
                ("icc_profile_buf", ctypes.c_void_p),
                ("icc_profile_len", ctypes.c_uint32)]


MSGFN = ctypes.CFUNCTYPE(None, ctypes.c_char_p, ctypes.c_void_p)

OPJ_CODEC_J2K = 0
OPJ_CODEC_JP2 = 2


def decode(path: str, verbose: bool = True):
    """Returns (image_array | None, messages list)."""
    L = lib()
    msgs = []

    def _cb(level):
        def cb(msg, _):
            msgs.append((level, msg.decode("utf-8", "replace").strip()))
        return MSGFN(cb)

    cbs = [_cb("err"), _cb("warn"), _cb("info")]

    codec_fmt = OPJ_CODEC_JP2 if open(path, "rb").read(4) == b"\x00\x00\x00\x0c" \
        else OPJ_CODEC_J2K
    L.opj_create_decompress.restype = ctypes.c_void_p
    codec = L.opj_create_decompress(codec_fmt)
    L.opj_set_error_handler(ctypes.c_void_p(codec), cbs[0], None)
    L.opj_set_warning_handler(ctypes.c_void_p(codec), cbs[1], None)
    if verbose:
        L.opj_set_info_handler(ctypes.c_void_p(codec), cbs[2], None)

    params = ctypes.create_string_buffer(16384)
    L.opj_set_default_decoder_parameters(params)
    L.opj_setup_decoder(ctypes.c_void_p(codec), params)

    L.opj_stream_create_default_file_stream.restype = ctypes.c_void_p
    stream = L.opj_stream_create_default_file_stream(path.encode(), 1)
    img_p = ctypes.POINTER(Image)()
    ok = L.opj_read_header(ctypes.c_void_p(stream), ctypes.c_void_p(codec),
                           ctypes.byref(img_p))
    arr = None
    if ok:
        ok = L.opj_decode(ctypes.c_void_p(codec), ctypes.c_void_p(stream), img_p)
        if ok:
            L.opj_end_decompress(ctypes.c_void_p(codec), ctypes.c_void_p(stream))
            img = img_p.contents
            comps = []
            for i in range(img.numcomps):
                c = img.comps[i]
                buf = np.ctypeslib.as_array(c.data, shape=(c.h, c.w)).copy()
                comps.append(buf)
            arr = comps[0] if len(comps) == 1 else np.stack(comps, axis=-1)
    L.opj_stream_destroy(ctypes.c_void_p(stream))
    L.opj_destroy_codec(ctypes.c_void_p(codec))
    if img_p:
        L.opj_image_destroy(img_p)
    return arr, msgs


if __name__ == "__main__":
    arr, msgs = decode(sys.argv[1])
    for level, m in msgs:
        print(f"[{level}] {m}")
    if arr is not None:
        print("decoded:", arr.shape, arr.dtype, "sample:", arr.flat[:8])
    else:
        print("DECODE FAILED")
