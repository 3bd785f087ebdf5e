"""Differential tests: device EBCOT decision kernel vs the traced oracle.

ops/ebcot_device.py computes every MQ decision (ctx, bit) of the EBCOT
Tier-1 coder with data-parallel vector ops; the serial coder in ops/t1.py
records its decisions via the trace hook.  Bit-for-bit equality of the
ordered decision streams implies the device kernel + any MQ back-end
reproduces the exact bitstream of the serial coder.
"""
import numpy as np
import pytest

from go_jpeg2000_tpu.ops import ebcot_device, t1


def _oracle_stream(coeffs, band):
    tr = []
    t1.encode_block(coeffs, band, cb_style=0, trace=tr)
    return tr


def _device_stream(blocks, bands, H, W, max_planes):
    B = len(blocks)
    mags = np.zeros((B, H, W), np.int32)
    signs = np.zeros((B, H, W), np.int32)
    valid = np.zeros((B, H, W), bool)
    bc = np.asarray([t1.BAND_CLASS[b] for b in bands], np.int32)
    for i, c in enumerate(blocks):
        h, w = c.shape
        mags[i, :h, :w] = np.abs(c)
        signs[i, :h, :w] = (c < 0).astype(np.int32)
        valid[i, :h, :w] = True
    slots = ebcot_device.decision_slots(mags, signs, bc, valid, max_planes)
    return ebcot_device.compact_host(np.asarray(slots))


class TestDecisionKernel:
    @pytest.mark.parametrize("band", ["LL", "HL", "HH"])
    @pytest.mark.parametrize("shape,mag,density", [
        ((8, 8), 200, 0.6), ((16, 16), 2000, 0.4), ((4, 4), 3, 0.9),
        ((12, 16), 50, 0.2), ((32, 32), 500, 0.5),
    ])
    def test_matches_oracle(self, band, shape, mag, density):
        rng = np.random.RandomState(hash((band, shape, mag)) % 2**31)
        h, w = shape
        c = rng.randint(-mag, mag + 1, size=shape).astype(np.int32)
        c[rng.rand(h, w) < density] = 0
        want = _oracle_stream(c, band)
        H = -(-h // 4) * 4
        got = _device_stream([c], [band], H, max(w, 4), 18)[0]
        assert got == want

    def test_batch_mixed_shapes_and_planes(self):
        """Blocks with different true dims and bit-depths share one padded
        batch; each stream must still match its own oracle."""
        rng = np.random.RandomState(7)
        specs = [((64, 64), 4000, "LL"), ((64, 64), 10, "HH"),
                 ((33, 64), 900, "HL"), ((64, 17), 2, "LL"),
                 ((5, 6), 100000, "HH"), ((64, 64), 0, "LL")]
        blocks, bands = [], []
        for (h, w), mag, band in specs:
            c = rng.randint(-mag, mag + 1, size=(h, w)).astype(np.int32) \
                if mag else np.zeros((h, w), np.int32)
            c[rng.rand(h, w) < 0.55] = 0
            blocks.append(c)
            bands.append(band)
        got = _device_stream(blocks, bands, 64, 64, 18)
        for i, (c, band) in enumerate(zip(blocks, bands)):
            assert got[i] == _oracle_stream(c, band), f"block {i}"

    def test_sparse_propagation_chain(self):
        """A diagonal line forces long SPP propagation chains — exercises
        the fixpoint loop depth."""
        c = np.zeros((16, 16), np.int32)
        for i in range(16):
            c[i, i] = 3
        c[0, 0] = 7
        got = _device_stream([c], ["LL"], 16, 16, 8)[0]
        assert got == _oracle_stream(c, "LL")

    def test_all_rl_block(self):
        """All-zero planes followed by sparse content: run-length heavy."""
        c = np.zeros((16, 16), np.int32)
        c[9, 3] = -1
        c[2, 12] = 1
        got = _device_stream([c], ["HH"], 16, 16, 4)[0]
        assert got == _oracle_stream(c, "HH")


class TestStreamToBitstream:
    def test_mq_over_stream_equals_encode_block(self):
        """Feeding the device decision stream through a plain MQ coder
        yields byte-identical codewords to the serial block coder."""
        from go_jpeg2000_tpu.ops.mq import MQEncoder
        rng = np.random.RandomState(3)
        c = rng.randint(-700, 700, size=(32, 32)).astype(np.int32)
        c[rng.rand(32, 32) < 0.5] = 0
        ref = t1.encode_block(c, "HL")
        stream = _device_stream([c], ["HL"], 32, 32, 16)[0]
        enc = MQEncoder()
        for cx, d in stream:
            enc.encode(d, cx)
        assert enc.flush() == ref.data
