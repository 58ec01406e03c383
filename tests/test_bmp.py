"""BMP codec (operators/bmp_codec.py, G9): roundtrips, layout edge
cases, and cross-container equality with the PNG codec — BMP is the
UNCOMPRESSED container, so agreeing with it pins the compressed
codecs' pixel output end to end."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from timescaledb_event_streamer_spark.operators.bmp_codec import (
    bmp_decode,
    bmp_encode,
)
from timescaledb_event_streamer_spark.operators.png_codec import (
    png_decode,
    png_encode,
)


def _rng(seed=11):
    return np.random.default_rng(seed)


def test_gray_roundtrip_all_pad_widths():
    # widths 5..8 exercise every 4-byte row-padding remainder
    for w in (5, 6, 7, 8):
        img = _rng(w).integers(0, 256, size=(9, w), dtype=np.uint8)
        out = bmp_decode(bmp_encode(img))
        assert out.shape == (9, w, 1)
        np.testing.assert_array_equal(out[:, :, 0], img)


def test_rgb_roundtrip_all_pad_widths():
    for w in (5, 6, 7, 8):
        img = _rng(100 + w).integers(0, 256, size=(7, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(bmp_decode(bmp_encode(img)), img)


def test_rgba_roundtrip():
    img = _rng(3).integers(0, 256, size=(6, 5, 4), dtype=np.uint8)
    np.testing.assert_array_equal(bmp_decode(bmp_encode(img)), img)


def test_top_down_orientation_decodes():
    """Negative height = top-down row order; same pixels either way."""
    img = _rng(4).integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    data = bytearray(bmp_encode(img))
    # flip height sign and the stored row order: rows were bottom-up
    offset = struct.unpack_from("<I", data, 10)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    struct.pack_into("<i", data, 22, -h)
    stride = (img.shape[1] * 3 + 3) & ~3
    rows = [
        bytes(data[offset + y * stride : offset + (y + 1) * stride])
        for y in range(h)
    ]
    data[offset:] = b"".join(reversed(rows))
    np.testing.assert_array_equal(bmp_decode(bytes(data)), img)


def test_colored_palette_expands_to_rgb():
    """A non-gray palette must expand to 3 channels in RGB order."""
    img = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    data = bytearray(bmp_encode(img))
    # palette starts after the two headers; entry = B, G, R, 0
    pal_off = 14 + 40
    data[pal_off : pal_off + 16] = bytes(
        [255, 0, 0, 0,  0, 255, 0, 0,  0, 0, 255, 0,  10, 20, 30, 0]
    )
    out = bmp_decode(bytes(data))
    assert out.shape == (2, 2, 3)
    np.testing.assert_array_equal(out[0, 0], [0, 0, 255])  # BGR -> RGB
    np.testing.assert_array_equal(out[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(out[1, 0], [255, 0, 0])
    np.testing.assert_array_equal(out[1, 1], [30, 20, 10])


def test_rejects_compressed_and_truncated():
    img = _rng(5).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    data = bytearray(bmp_encode(img))
    bad = bytearray(data)
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        bmp_decode(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        bmp_decode(bytes(data[:-8]))
    with pytest.raises(ValueError, match="not a BMP"):
        bmp_decode(b"XX" + bytes(data[2:]))


def test_cross_container_pixels_match_png():
    """Same pixels through PNG (compressed) and BMP (uncompressed)
    decode identically — the codec-chain pin."""
    img = _rng(6).integers(0, 256, size=(12, 11, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        png_decode(png_encode(img)), bmp_decode(bmp_encode(img))
    )
    gray = _rng(7).integers(0, 256, size=(10, 9), dtype=np.uint8)
    np.testing.assert_array_equal(
        png_decode(png_encode(gray)), bmp_decode(bmp_encode(gray))
    )


def test_image_hashes_route_bmp_and_match_png(spark):
    """The G1 seam routes BMP payloads, and perceptual hashes are
    container-invariant: the same image as PNG and BMP hashes
    identically."""
    import pandas as pd

    from timescaledb_event_streamer_spark.operators.multimodal import (
        image_hashes,
        sniff_format,
    )
    from pyspark.sql import functions as F

    img = _rng(8).integers(0, 256, size=(24, 24), dtype=np.uint8)
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "payload": [png_encode(img), bmp_encode(img)],
            }
        )
    )
    sniffed = dict(
        media.select(
            "media_id", sniff_format(F.col("payload")).alias("fmt")
        ).collect()
    )
    assert sniffed == {1: "png", 2: "bmp"}
    rows = {r["media_id"]: r for r in image_hashes(media).collect()}
    assert rows[1]["dhash"] == rows[2]["dhash"]
    assert rows[1]["ahash"] == rows[2]["ahash"]


# -- TIFF (G11): the fifth container -----------------------------------------


def test_tiff_roundtrip_both_endians_and_strips():
    from timescaledb_event_streamer_spark.operators.tiff_codec import (
        tiff_decode,
        tiff_encode,
    )

    for le in (True, False):
        for ch in (1, 3):
            shape = (9, 7) if ch == 1 else (9, 7, 3)
            img = _rng(ch + (2 if le else 5)).integers(
                0, 256, size=shape, dtype=np.uint8
            )
            for rps in (None, 2, 4):
                out = tiff_decode(
                    tiff_encode(img, little_endian=le, rows_per_strip=rps)
                )
                want = img if ch == 3 else img[:, :, None]
                np.testing.assert_array_equal(out, want)


def test_tiff_cross_container_pixels_match_png_and_bmp():
    from timescaledb_event_streamer_spark.operators.tiff_codec import (
        tiff_decode,
        tiff_encode,
    )

    img = _rng(42).integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        tiff_decode(tiff_encode(img)), png_decode(png_encode(img))
    )
    np.testing.assert_array_equal(
        tiff_decode(tiff_encode(img)), bmp_decode(bmp_encode(img))
    )


def test_tiff_rejects_hostile_inputs():
    from timescaledb_event_streamer_spark.operators.tiff_codec import (
        tiff_decode,
        tiff_encode,
    )

    img = _rng(1).integers(0, 256, size=(4, 4), dtype=np.uint8)
    data = bytearray(tiff_encode(img))
    with pytest.raises(ValueError, match="not a TIFF"):
        tiff_decode(b"XX" + bytes(data[2:]))
    with pytest.raises(ValueError, match="truncated"):
        tiff_decode(bytes(data[:-3]))
    # flip compression to LZW (5)
    bad = bytearray(data)
    # find the compression entry (tag 259) and patch its value
    import struct as _s

    (ifd_off,) = _s.unpack_from("<I", bad, 4)
    (count,) = _s.unpack_from("<H", bad, ifd_off)
    for i in range(count):
        off = ifd_off + 2 + 12 * i
        tag, = _s.unpack_from("<H", bad, off)
        if tag == 259:
            _s.pack_into("<H", bad, off + 8, 5)
    with pytest.raises(ValueError, match="compressed"):
        tiff_decode(bytes(bad))


def test_image_hashes_route_tiff_and_match_png(spark):
    import pandas as pd

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.operators.multimodal import (
        image_hashes,
        sniff_format,
    )
    from timescaledb_event_streamer_spark.operators.tiff_codec import (
        tiff_encode,
    )

    img = _rng(9).integers(0, 256, size=(24, 24), dtype=np.uint8)
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2, 3],
                "payload": [
                    png_encode(img),
                    tiff_encode(img, little_endian=True),
                    tiff_encode(img, little_endian=False),
                ],
            }
        )
    )
    sniffed = dict(
        media.select(
            "media_id", sniff_format(F.col("payload")).alias("fmt")
        ).collect()
    )
    assert sniffed == {1: "png", 2: "tiff", 3: "tiff"}
    rows = {r["media_id"]: r for r in image_hashes(media).collect()}
    assert rows[1]["dhash"] == rows[2]["dhash"] == rows[3]["dhash"]
    assert rows[1]["ahash"] == rows[2]["ahash"] == rows[3]["ahash"]


def test_real_resize_path_is_container_invariant(spark):
    """resize_images(decoder='real') decodes BMP and TIFF payloads
    through the same seam as PNG and re-encodes losslessly: the
    resized pixels are identical across source containers (GIF is
    decode-only in-repo, covered by its golden-stream tests)."""
    import pandas as pd

    from timescaledb_event_streamer_spark.operators.multimodal import (
        resize_images,
    )
    from timescaledb_event_streamer_spark.operators.tiff_codec import (
        tiff_encode,
    )

    img = _rng(21).integers(0, 256, size=(64, 48), dtype=np.uint8)
    payloads = {
        1: png_encode(img),
        2: bmp_encode(img),
        3: tiff_encode(img),
    }
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": list(payloads),
                "kind": ["image"] * 3,
                "payload": list(payloads.values()),
                "width": [48] * 3,
                "height": [64] * 3,
            }
        )
    )
    rows = {
        r["media_id"]: r
        for r in resize_images(media, max_side=32, decoder="real").collect()
    }
    assert len(rows) == 3
    ref = png_decode(bytes(rows[1]["payload"]))
    assert (rows[1]["target_w"], rows[1]["target_h"]) == (24, 32)
    for mid in (2, 3):
        out = png_decode(bytes(rows[mid]["payload"]))
        np.testing.assert_array_equal(out[:, :, 0], ref[:, :, 0]), mid
