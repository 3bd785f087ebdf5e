"""Shared setup for HT conformance probing: CPU jax + helpers."""
import os

os.environ.setdefault("XLA_FLAGS", "")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import go_jpeg2000_tpu as jp2k
from go_jpeg2000_tpu.options import Options, Format
import tools.opj_harness as opj

OPTS = Options(format=Format.J2K, lossless=True, num_resolutions=1,
               high_throughput=True)


def roundtrip(img, opts=None):
    """Returns (self_ok, opj_arr_or_None, err_msgs)."""
    data = jp2k.encode(img, opts or OPTS)
    open("/tmp/p.j2k", "wb").write(data)
    ours = jp2k.decode(data)
    arr, msgs = opj.decode("/tmp/p.j2k", verbose=False)
    errs = [m for l, m in msgs if l == "err"]
    return np.array_equal(ours, img), arr, errs
