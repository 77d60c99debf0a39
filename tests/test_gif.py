"""GIF/LZW codec (operators.multimodal): real variable-width
dictionary coding — roundtrip under forced dictionary growth, the
KwKwK corner, interlacing, palette mapping, malformed input."""
from __future__ import annotations

import numpy as np
import pytest

from elt_gluepipeline_spark.operators.multimodal import (
    _lzw_decode, _lzw_encode, decode_gif, encode_gif)


def test_lzw_roundtrip_forces_dictionary_growth():
    rng = np.random.default_rng(3)
    for min_size in (2, 3, 5, 8):
        for n in (10, 1000, 30_000, 120_000):
            # small alphabets + long streams walk the width all the
            # way to 12 bits and through CLEAR-driven table resets
            stream = rng.integers(0, 1 << min_size, size=n).tolist()
            assert _lzw_decode(_lzw_encode(stream, min_size),
                               min_size) == stream


def test_lzw_kwkwk_case():
    s = [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 0, 0, 0]
    assert _lzw_decode(_lzw_encode(s, 2), 2) == s


def test_gif_roundtrip_sequential_and_interlaced():
    rng = np.random.default_rng(7)
    pal = [(i, i, i) for i in range(256)]
    for interlace in (False, True):
        img = rng.integers(0, 256, size=(23, 31))
        w, h, rgb = decode_gif(encode_gif(img, pal, interlace=interlace))
        assert (w, h) == (31, 23)
        for c in range(3):
            assert np.array_equal(rgb[:, :, c], img.astype(np.float64))


def test_gif_color_palette_mapping():
    rng = np.random.default_rng(9)
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    img = rng.integers(0, 4, size=(8, 8))
    w, h, rgb = decode_gif(encode_gif(img, pal))
    expect = np.array(pal, dtype=np.float64)[img]
    assert np.array_equal(rgb, expect)


def test_gif_malformed_inputs_raise():
    rng = np.random.default_rng(1)
    pal = [(i, i, i) for i in range(16)]
    good = encode_gif(rng.integers(0, 16, size=(6, 9)), pal, min_size=4)
    with pytest.raises(ValueError):
        decode_gif(b"not a gif")
    for cut in (3, 12, 20, len(good) - 3):
        with pytest.raises(ValueError):
            decode_gif(good[:cut])
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 20)


def test_media_probe_routes_gif(spark):
    import pandas as pd

    from elt_gluepipeline_spark.operators.multimodal import (ASSET_SCHEMA,
                                                             media_probe)

    pal = [(i, i, i) for i in range(256)]
    img = np.full((4, 6), 40)
    assets = spark.createDataFrame(
        pd.DataFrame({
            "asset_id": pd.Series([1, 2], dtype="int64"),
            "modality": ["image", "image"],
            "payload": [encode_gif(img, pal), b"GIF89a\x00bogus"],
            "media_format": ["gif", "gif"],
        }), schema=ASSET_SCHEMA)
    rows = {r.asset_id: r for r in media_probe(assets).collect()}
    assert rows[1].decoded and (rows[1].width, rows[1].height) == (6, 4)
    assert rows[1].n_channels == 3
    assert rows[1].mean_signal == "40.0000"
    assert not rows[2].decoded
