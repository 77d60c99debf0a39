"""Baseline JPEG codec (operators.multimodal): the lossy
compressed-format decode path made real with numpy + struct only.

Test pyramid mirroring the codec's structure:
- entropy layer: EXACT roundtrip of random quantized coefficient
  blocks through the Huffman scan codec (covers DC categories,
  AC (run,size) symbols, ZRL, EOB, negative magnitudes, stuffing);
- pixel layer: block-constant images round-trip EXACTLY through the
  full lossy pipeline (the DC-exactness contract the q137 oracle
  leans on), textured images within quantization error;
- container layer: restart markers, edge padding, malformed input.
"""
from __future__ import annotations

import numpy as np
import pytest

from elt_gluepipeline_spark.operators.multimodal import (
    _AC_BITS, _AC_VALS, _DC_BITS, _DC_VALS, _BitReader, _decode_block,
    _encode_scan, _huff_codes, _huff_decoder, decode_jpeg, encode_jpeg)


def _const_blocks(rng, bh, bw):
    vals = 128 + 2 * rng.integers(-24, 25, size=(bh, bw))
    return np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


def test_entropy_layer_exact_roundtrip():
    rng = np.random.default_rng(11)
    dc_code = _huff_codes(_DC_BITS, _DC_VALS)
    ac_code = _huff_codes(_AC_BITS, _AC_VALS)
    dc_tab = _huff_decoder(_DC_BITS, _DC_VALS)
    ac_tab = _huff_decoder(_AC_BITS, _AC_VALS)
    blocks = []
    for i in range(100):
        zz = np.zeros(64, dtype=np.int64)
        nz = rng.integers(0, 25)
        pos = rng.choice(64, size=nz, replace=False)
        zz[pos] = rng.integers(-255, 256, size=nz)
        if i == 0:                       # all-zero block: pure EOB
            zz[:] = 0
        if i == 1:                       # long zero run: ZRL + tail
            zz[:] = 0
            zz[63] = -1
        blocks.append((i % 3, zz))       # 3 components: per-comp DC pred
    scan = _encode_scan(blocks, dc_code, ac_code)
    r = _BitReader(scan, 0)
    pred = {}
    for comp, zz in blocks:
        got, pred[comp] = _decode_block(r, dc_tab, ac_tab,
                                        pred.get(comp, 0))
        assert list(got) == list(zz)


def test_block_constant_gray_exact():
    rng = np.random.default_rng(7)
    for _ in range(5):
        img = _const_blocks(rng, int(rng.integers(1, 4)),
                            int(rng.integers(1, 5)))
        w, h, ch, arr = decode_jpeg(encode_jpeg(img, quality=50))
        assert (w, h, ch) == (img.shape[1], img.shape[0], 1)
        assert np.array_equal(arr[:, :, 0], img)


def test_block_constant_color_exact():
    rng = np.random.default_rng(9)
    g = _const_blocks(rng, 2, 3)
    img = np.stack([g, g, g], axis=2)
    w, h, ch, arr = decode_jpeg(encode_jpeg(img, quality=50))
    assert ch == 3
    assert np.array_equal(arr, img.astype(np.float64))


def test_restart_markers_reset_predictors():
    rng = np.random.default_rng(13)
    img = _const_blocks(rng, 3, 4)
    data = encode_jpeg(img, quality=50, restart_interval=3)
    assert b"\xff\xdd" in data.lower() or b"\xFF\xDD" in data
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    w, h, ch, arr = decode_jpeg(data)
    assert np.array_equal(arr[:, :, 0], img)


def test_edge_padding_non_multiple_dims():
    # 17x23: replicated-edge padding must not leak into the cropped
    # output; block-constant content keeps the roundtrip exact because
    # replication extends each border block with its own value
    rng = np.random.default_rng(5)
    img = _const_blocks(rng, 3, 3)[:17, :23]
    w, h, ch, arr = decode_jpeg(encode_jpeg(img, quality=50))
    assert (w, h) == (23, 17)
    assert np.array_equal(arr[:, :, 0], img)


def test_textured_roundtrip_bounded_error():
    rng = np.random.default_rng(3)
    y, x = np.mgrid[0:24, 0:40]
    smooth = ((np.sin(x / 10) + np.cos(y / 8)) * 40 + 128).astype(np.uint8)
    noise = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    for img, bound in ((smooth, 4.0), (noise, 16.0)):
        w, h, ch, arr = decode_jpeg(encode_jpeg(img, quality=100))
        assert np.abs(arr[:, :, 0] - img).max() <= bound


def test_color_textured_roundtrip():
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(16, 24, 3)).astype(np.uint8)
    w, h, ch, arr = decode_jpeg(encode_jpeg(img, quality=95))
    assert (w, h, ch) == (24, 16, 3)
    # chroma quantization is coarser; bound is loose but finite
    assert np.abs(arr - img).mean() < 20.0


def test_malformed_inputs_raise_valueerror():
    rng = np.random.default_rng(1)
    img = _const_blocks(rng, 2, 2)
    data = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8garbage")
    for cut in (4, 20, 40, 100, len(data) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(data[:cut])
    progressive = bytearray(data)
    i = progressive.find(b"\xff\xc0")
    progressive[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(progressive))


def _const_macroblocks(rng, mh, mw):
    vals = 128 + 2 * rng.integers(-24, 25, size=(mh, mw))
    return np.kron(vals, np.ones((16, 16), dtype=np.int64)).astype(np.uint8)


@pytest.mark.parametrize("sub", ["420", "422"])
def test_subsampled_macroblock_exact(sub):
    # constant 16x16 macroblocks survive box-average chroma downsample,
    # DC quantization, and replication upsample pixel-exactly — the
    # q193 oracle contract (covers MCU interleave + per-comp predictors)
    rng = np.random.default_rng(23)
    g = _const_macroblocks(rng, 2, 3)
    img = np.stack([g, g, g], axis=2)
    for ri in (0, 2):
        w, h, c, arr = decode_jpeg(encode_jpeg(
            img, quality=50, subsampling=sub, restart_interval=ri))
        assert (w, h, c) == (48, 32, 3)
        assert np.array_equal(arr, img.astype(np.float64)), (sub, ri)


@pytest.mark.parametrize("dims", [(19, 37), (17, 23), (9, 31), (24, 40)])
def test_subsampled_non_mcu_aligned_exact(dims):
    # partial-MCU edge handling: encoder edge-pads, decoder crops; odd
    # dims also hit the ceil() chroma plane size + upsample-crop path
    rng = np.random.default_rng(29)
    hh, ww = dims
    cells = 128 + 2 * rng.integers(-24, 25,
                                   size=(-(-hh // 16), -(-ww // 16)))
    g = np.kron(cells, np.ones((16, 16), dtype=np.int64))[:hh, :ww] \
          .astype(np.uint8)
    img = np.stack([g, g, g], axis=2)
    for sub in ("420", "422", "444"):
        w, h, c, arr = decode_jpeg(encode_jpeg(img, quality=50,
                                               subsampling=sub))
        assert (w, h, c) == (ww, hh, 3)
        assert np.array_equal(arr, img.astype(np.float64)), sub


def test_subsampled_textured_bounded_error():
    # real (non-constant) content: 4:2:0 loses chroma detail but gray
    # content keeps Cb=Cr=128, so error is bounded by luma quantization
    rng = np.random.default_rng(31)
    g = rng.integers(60, 200, size=(24, 24)).astype(np.uint8)
    img = np.stack([g, g, g], axis=2)
    w, h, c, arr = decode_jpeg(encode_jpeg(img, quality=90,
                                           subsampling="420"))
    assert (w, h, c) == (24, 24, 3)
    assert np.abs(arr[:, :, 0] - g).mean() < 8.0


def test_bad_subsampling_rejected():
    rng = np.random.default_rng(37)
    img = np.stack([_const_blocks(rng, 2, 2)] * 3, axis=2)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img, subsampling="411")
    # decoder rejects non-integer sampling ratios (e.g. 3 vs max 2)
    data = bytearray(encode_jpeg(img, subsampling="420"))
    i = data.find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1) then per-comp
    # [cid hv tq]; comp0 hv is at offset 2+2+1+2+2+1+1 = 11 from 0xFFC0
    assert data[i + 11] == 0x22
    data[i + 11] = 0x32                 # h=3 vs chroma h=1, max 3: 3%1==0
    data[i + 11 + 3 + 1] = 0x21         # chroma h=2 -> 3 % 2 != 0
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_media_probe_routes_jpeg(spark):
    import pandas as pd

    from elt_gluepipeline_spark.operators.multimodal import (ASSET_SCHEMA,
                                                             media_probe)

    rng = np.random.default_rng(17)
    g = _const_blocks(rng, 1, 2)
    assets = spark.createDataFrame(
        pd.DataFrame({
            "asset_id": pd.Series([1, 2], dtype="int64"),
            "modality": ["image", "image"],
            "payload": [encode_jpeg(g), b"\xff\xd8bogus"],
            "media_format": ["jpeg", "jpeg"],
        }), schema=ASSET_SCHEMA)
    rows = {r.asset_id: r for r in media_probe(assets).collect()}
    assert rows[1].decoded and rows[1].width == 16 and rows[1].height == 8
    assert rows[1].mean_signal == f"{g.mean():.4f}"
    assert not rows[2].decoded            # honest stub path
