"""Progressive JPEG (SOF2) codec: spectral selection + successive
approximation, T.81 Annex G (pure numpy/struct — no Spark needed).

The exactness contract: encode_jpeg_progressive shares the baseline
encoder's lossy front end, so progressive decode must be PIXEL-
IDENTICAL to baseline decode of the same image at the same settings.
Every scan type in the script (DC first/refine, AC first at two Al
levels, AC refine) participates in that equality.

The decoder is more general than our encoder (EOBn run lengths > 1,
which standard Annex-K tables cannot express), so those paths get
hand-built streams with a custom Huffman table.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from elt_gluepipeline_spark.operators.multimodal import (
    _DC_BITS, _DC_VALS, _BitWriter, _huff_codes, _magnitude, decode_jpeg,
    encode_jpeg, encode_jpeg_progressive)


@pytest.mark.parametrize("dims,sub,q", [
    ((16, 16, 3), "444", 90),
    ((24, 40, 3), "420", 60),
    ((17, 19, 1), "444", 85),
    ((33, 47, 3), "422", 50),
    ((8, 8, 3), "444", 95),
    ((15, 9, 1), "444", 40),
    ((128, 96, 3), "420", 30),
])
def test_progressive_equals_baseline(dims, sub, q):
    rng = np.random.default_rng(sum(dims) + q)
    shape = dims if dims[-1] == 3 else dims[:2]
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=q,
                                               subsampling=sub))
    assert base[:3] == prog[:3]
    assert np.array_equal(base[3], prog[3])


def test_progressive_block_constant_exact():
    # the q198 oracle contract: block-constant macroblocks survive the
    # whole progressive pipeline exactly (DC-exactness per 16x16 cell)
    vals = np.array([[128, 150], [106, 128], [170, 96]])
    gray = np.kron(vals, np.ones((16, 16))).astype(np.uint8)
    img = np.stack([gray] * 3, axis=2)
    w, h, c, arr = decode_jpeg(
        encode_jpeg_progressive(img, quality=50, subsampling="420"))
    assert (w, h, c) == (32, 48, 3)
    assert np.array_equal(arr, img.astype(np.float64))


# ---- hand-built streams: EOBn (run > 1), beyond our encoder ----------

# custom AC table: (0,1) newly-significant, EOB1 (0x10), ZRL (0xF0) —
# canonical 1/2/3-bit codes
_ACP_BITS = [0, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ACP_VALS = [0x01, 0x10, 0xF0]


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _progressive_file(scans, sos_params, w: int, h: int) -> bytes:
    # grayscale SOF2, flat all-ones quant table so coefficients ARE
    # unscaled DCT values
    out = bytearray(b"\xFF\xD8")
    out += _seg(0xFFDB, bytes([0]) + bytes([1] * 64))
    out += _seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 1)
                + bytes([1, 0x11, 0]))
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_ACP_BITS)
                + bytes(_ACP_VALS))
    for sos, scan in zip(sos_params, scans):
        out += _seg(0xFFDA, sos)
        out += scan
    out += b"\xFF\xD9"
    return bytes(out)


def _dc_scan(dcs) -> bytes:
    dc_code = _huff_codes(_DC_BITS, _DC_VALS)
    w_ = _BitWriter()
    pred = 0
    for dc in dcs:
        s, extra = _magnitude(dc - pred)
        pred = dc
        code, ln = dc_code[s]
        w_.put(code, ln)
        if s:
            w_.put(extra, s)
    return w_.flush()


_SOS_DC = bytes([1, 1, 0x00, 0, 0, 0x00])


def test_decoder_handles_eobn_runs():
    """EOB1 in an AC-first scan ends the current block and skips the
    next: one symbol covers both blocks' empty bands."""
    ac_code = _huff_codes(_ACP_BITS, _ACP_VALS)
    w_ = _BitWriter()
    code, ln = ac_code[0x10]
    w_.put(code, ln)
    w_.put(0, 1)                       # extra bit 0 -> run covers 2
    f = _progressive_file([_dc_scan([16, 16]), w_.flush()],
                          [_SOS_DC, bytes([1, 1, 0x00, 1, 63, 0x00])],
                          16, 8)
    ww, hh, cc, arr = decode_jpeg(f)
    assert (ww, hh, cc) == (16, 8, 1)
    # flat q=1 and DC=16 -> every pixel 128 + 16/8 = 130
    assert np.array_equal(arr, np.full((8, 16, 1), 130.0))


def test_decoder_handles_refinement_eobn_runs():
    """An AC-refine EOB1 spans two blocks and carries block 1's
    correction bit: its coefficient gains the low bit (2 -> 3) while
    block 2 stays untouched."""
    ac_code = _huff_codes(_ACP_BITS, _ACP_VALS)

    # AC first at Al=1: block1 coef[1] = +1 (stored as 2), then EOB1
    # (extra 0) ends block1 and skips block2 entirely
    wf = _BitWriter()
    code, ln = ac_code[0x01]
    wf.put(code, ln)
    wf.put(1, 1)                       # magnitude bits for +1
    code, ln = ac_code[0x10]
    wf.put(code, ln)
    wf.put(0, 1)
    ac_first = wf.flush()

    # AC refine Ah=1 Al=0: EOB1 (extra 0) spans both blocks; block1's
    # correction bit (1) follows the run's extra bits
    wr = _BitWriter()
    code, ln = ac_code[0x10]
    wr.put(code, ln)
    wr.put(0, 1)
    wr.put(1, 1)
    ac_refine = wr.flush()

    f = _progressive_file(
        [_dc_scan([0, 0]), ac_first, ac_refine],
        [_SOS_DC,
         bytes([1, 1, 0x00, 1, 63, 0x01]),    # Ss=1 Se=63 Ah=0 Al=1
         bytes([1, 1, 0x00, 1, 63, 0x10])],   # Ss=1 Se=63 Ah=1 Al=0
        16, 8)
    ww, hh, cc, arr = decode_jpeg(f)
    assert (ww, hh, cc) == (16, 8, 1)
    # block2: all zero -> flat 128
    assert np.array_equal(arr[:, 8:, 0], np.full((8, 8), 128.0))
    # block1: refined coefficient natural (0,1) = 3, flat q=1
    coef = np.zeros((8, 8))
    coef[0, 1] = 3.0
    x = np.arange(8, dtype=np.float64)
    dm = 0.5 * np.cos((2.0 * x[None, :] + 1.0) * x[:, None] * np.pi / 16.0)
    dm[0] *= 1.0 / np.sqrt(2.0)
    blk = np.clip(np.rint(dm.T @ coef @ dm + 128.0), 0, 255)
    assert np.array_equal(arr[:, :8, 0], blk)


def test_progressive_without_scans_rejected():
    # SOF2 header but the stream ends before any SOS
    f = (b"\xFF\xD8"
         + _seg(0xFFC2, struct.pack(">BHHB", 8, 8, 8, 1)
                + bytes([1, 0x11, 0])))
    with pytest.raises(ValueError):
        decode_jpeg(f)


def test_refine_scan_folds_trailing_zrl_into_eob():
    """jcphuff's `k <= EOB` gate: a >15-zero run that ends at a
    history-only coefficient (no newly-significant coefficient after
    it) must NOT spend ZRL symbols — the correction bit rides the
    block's closing EOB instead."""
    from elt_gluepipeline_spark.operators.multimodal import (
        _AC_BITS, _AC_VALS, _encode_ac_refine_scan)

    ac_code = _huff_codes(_AC_BITS, _AC_VALS)
    zz = [0] * 64
    zz[1] = 1      # newly significant (run/1 + sign)
    zz[40] = 5     # history coefficient after a 38-zero run
    got = _encode_ac_refine_scan([zz], 1, 63, 0, ac_code)

    w = _BitWriter()
    code, ln = ac_code[0x01]   # run0 / newly-significant at k=1
    w.put(code, ln)
    w.put(1, 1)                # positive sign
    code, ln = ac_code[0x00]   # EOB folds the 38-zero run + history
    w.put(code, ln)
    w.put(5 & 1, 1)            # k=40's correction bit rides the EOB
    assert got == w.flush()
