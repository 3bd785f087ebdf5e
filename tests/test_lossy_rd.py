"""Lossy (9/7 + PCRD) rate-distortion quality vs OpenJPEG at matched rates
(BASELINE config 2).  The reference has NO rate control at all ("quality"
maps to a global quantizer step, encoder.go:265-277), so the actual bar is
OpenJPEG — the strongest open implementation.

Also pins the r4 R-D fixes: synthesis-norm PCRD weights (+1.6 dB at 20:1),
midpoint-bias truncated reconstruction (+0.9 dB), and the budget-fit loop.
"""
import io

import numpy as np
import pytest

import go_jpeg2000_tpu as jp2k
from go_jpeg2000_tpu.options import Config, Format, Options


def _opj_encode(img, ratio, nres=6, mct=None):
    try:
        from PIL import Image
    except Exception:
        pytest.skip("PIL unavailable")
    b = io.BytesIO()
    kw = {} if mct is None else {"mct": mct}
    Image.fromarray(img).save(b, format="JPEG2000", irreversible=True,
                              quality_mode="rates", quality_layers=[ratio],
                              num_resolutions=nres, **kw)
    return b.getvalue()


def _opj_decode_psnr(data, ref):
    from PIL import Image
    arr = np.asarray(Image.open(io.BytesIO(data)))
    return _psnr(arr, ref)


def _psnr(a, b, peak=255.0):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(peak * peak / mse) if mse else float("inf")


def _img(shape, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=shape).astype(np.float32)
    for ax in (0, 1):
        for _ in range(2):
            a = (a + np.roll(a, 1, axis=ax) + np.roll(a, -1, axis=ax)) / 3
    return a.astype(np.uint8)


@pytest.mark.parametrize("ratio", [10.0, 20.0, 40.0])
def test_matched_rate_psnr_vs_openjpeg_gray(ratio):
    img = _img((512, 512), 0)
    ours = jp2k.encode(img, Options(
        format=Format.J2K, lossless=False, quality=98, num_resolutions=6,
        num_layers=1, compression_ratio=ratio, backend="native"))
    budget = int(img.size / ratio)
    assert len(ours) <= budget + 256, (len(ours), budget)
    p_ours = _psnr(jp2k.decode(ours), img)
    opj = _opj_encode(img, ratio)
    p_opj = _opj_decode_psnr(opj, img)
    # our bytes must not exceed OpenJPEG's by more than the budget slack
    assert len(ours) <= len(opj) * 1.05
    # r5: the true-norm PCRD weights + delta-corrected budget fit put us
    # at parity-or-better with OpenJPEG; the residual tolerance is
    # measurement noise (staircase granularity), not an indulgence.
    assert p_ours >= p_opj - 0.05, \
        f"ratio {ratio}: ours {p_ours:.2f} dB vs opj {p_opj:.2f} dB"


def test_matched_rate_psnr_vs_openjpeg_rgb_ict():
    img = _img((256, 256, 3), 1)
    ratio = 20.0
    ours = jp2k.encode(img, Options(
        format=Format.JP2, lossless=False, quality=98, num_resolutions=5,
        num_layers=3, compression_ratio=ratio, backend="native"))
    p_ours = _psnr(jp2k.decode(ours), img)
    # matched comparison: PIL/OpenJPEG defaults to NO MCT; this config is
    # 9/7 + ICT, so tell OpenJPEG to use the MCT too
    opj = _opj_encode(img, ratio, nres=5, mct=1)
    p_opj = _opj_decode_psnr(opj, img)
    assert p_ours >= p_opj - 0.1, \
        f"rgb: ours {p_ours:.2f} dB vs opj {p_opj:.2f} dB"


def test_openjpeg_cross_decodes_our_lossy():
    """Conformance: libopenjp2 must decode our lossy stream at the same
    PSNR our decoder achieves (bit-identical dequant conventions)."""
    try:
        import tools.opj_harness as opj_h
    except Exception:
        pytest.skip("opj harness unavailable")
    img = _img((256, 256), 2)
    ours = jp2k.encode(img, Options(
        format=Format.J2K, lossless=False, quality=98, num_resolutions=5,
        num_layers=1, compression_ratio=20.0, backend="native"))
    with open("/tmp/_rd_test.j2k", "wb") as f:
        f.write(ours)
    arr, _ = opj_h.decode("/tmp/_rd_test.j2k", verbose=False)
    p_opj = _psnr(arr.reshape(img.shape), img)
    p_ours = _psnr(jp2k.decode(ours), img)
    assert abs(p_opj - p_ours) < 0.6, (p_opj, p_ours)


def test_budget_fit_uses_budget():
    """The assembled codestream must land close under the byte budget
    (within pass-granularity), not 3-5% short (r3 behavior)."""
    img = _img((512, 512), 3)
    ratio = 16.0
    ours = jp2k.encode(img, Options(
        format=Format.J2K, lossless=False, quality=98, num_resolutions=6,
        num_layers=1, compression_ratio=ratio, backend="native"))
    budget = int(img.size / ratio)
    assert len(ours) <= budget
    assert len(ours) >= budget * 0.93


def test_python_native_lossy_decode_identical():
    """Python and C++ decoders must produce identical biased
    reconstructions for truncated lossy blocks (STY_LOSSY_BIAS twin)."""
    from go_jpeg2000_tpu.ops import t1
    rng = np.random.RandomState(4)
    c = np.round(rng.laplace(0, 300, size=(32, 32))).astype(np.int32)
    r = t1.encode_block(c, "HL")
    from go_jpeg2000_tpu.native import loader
    if not loader.available():
        pytest.skip("native unavailable")
    for n_passes in (1, 3, 5, len(r.passes)):
        n_passes = min(n_passes, len(r.passes))
        rate = r.passes[n_passes - 1].rate
        sty = t1.STY_LOSSY_BIAS
        py = t1.decode_block(r.data[:rate], 32, 32, r.num_bitplanes,
                             n_passes, "HL", sty, [rate])
        nat = loader.decode_blocks(
            [(r.data[:rate], 32, 32, r.num_bitplanes, n_passes, "HL",
              sty, [rate])])[0]
        np.testing.assert_array_equal(py, nat, err_msg=f"passes {n_passes}")


def test_exact_rates_option_still_valid():
    """Options.exact_rates=True (the D.4.1 minimal-length path) must stay
    decodable and within a hair of the fast default at the same budget."""
    img = _img((256, 256), 5)
    common = dict(format=Format.J2K, lossless=False, quality=98,
                  num_resolutions=5, num_layers=2, compression_ratio=12.0,
                  backend="native")
    fast = jp2k.encode(img, Options(**common))
    exact = jp2k.encode(img, Options(exact_rates=True, **common))
    p_fast = _psnr(jp2k.decode(fast), img)
    p_exact = _psnr(jp2k.decode(exact), img)
    # exact rates may only HELP; the fast default stays within 0.5 dB
    assert p_exact >= p_fast - 0.1, (p_fast, p_exact)
    assert p_fast >= p_exact - 0.5, (p_fast, p_exact)
    budget = img.size // 12
    assert len(fast) <= budget and len(exact) <= budget
