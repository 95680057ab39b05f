"""The stdlib PNG codec behind the multimodal decode seam.

The r13 verdict's top north-star gap: `decode_media` had only the
deterministic fake codec, so the multimodal story had never decoded a
real image payload.  These tests pin the REAL decoder — chunk walk
with CRC verification, zlib IDAT inflate, all five scanline unfilters,
palette expansion — against a checked-in PNG file, synthesized
round-trips across every color type and filter, malformed-input
rejection, and the `decode_media` dispatch (with and without Pillow
present).  The AUX query `multimodal_png_decode` adds the DuckDB hash
over the same codec (closed-form gradient stats).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

from mapreduce_grpc_spark.operators.pngcodec import (
    PngError,
    _SIGNATURE,
    _chunk,
    decode_png,
    encode_png,
    is_png,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


def _gradient(w, h, c, seed=3):
    grid = (
        seed
        + np.arange(w, dtype=np.int64)[None, :, None] * 7
        + np.arange(h, dtype=np.int64)[:, None, None] * 11
        + np.arange(c, dtype=np.int64)[None, None, :] * 13
    )
    return (grid % 256).astype(np.uint8).tobytes()


def test_checked_in_file_decodes_to_known_stats():
    with open(os.path.join(DATA, "tiny_rgb.png"), "rb") as f:
        blob = f.read()
    assert is_png(blob)
    d = decode_png(blob)
    assert (d["width"], d["height"], d["channels"], d["bit_depth"]) == (
        5, 4, 3, 8,
    )
    assert (d["pixel_sum"], d["pixel_min"], d["pixel_max"]) == (2790, 3, 90)
    assert d["pixels"] == _gradient(5, 4, 3)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "color_type,channels", [(0, 1), (2, 3), (4, 2), (6, 4)]
)
def test_roundtrip_every_filter_and_color_type(
    filter_type, color_type, channels
):
    w, h = 9, 7
    raw = _gradient(w, h, channels, seed=filter_type + color_type)
    blob = encode_png(
        w, h, raw, color_type=color_type, filter_type=filter_type
    )
    d = decode_png(blob)
    assert d["width"] == w and d["height"] == h
    assert d["channels"] == channels
    assert d["pixels"] == raw


def test_palette_expansion():
    # 4x2 image over a 3-entry palette
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = bytes([0, 1, 2, 1, 2, 0, 1, 0])
    blob = encode_png(4, 2, idx, color_type=3, palette=palette)
    d = decode_png(blob)
    assert d["channels"] == 3
    exp = b"".join(palette[3 * i : 3 * i + 3] for i in idx)
    assert d["pixels"] == exp
    # palette index out of range is corruption, not silence
    blob_bad = encode_png(4, 2, bytes([0, 1, 2, 1, 2, 0, 1, 9]),
                          color_type=3, palette=palette)
    with pytest.raises(PngError, match="palette index"):
        decode_png(blob_bad)


def test_single_row_and_single_column():
    for w, h in [(1, 6), (6, 1), (1, 1)]:
        raw = _gradient(w, h, 3)
        for ft in range(5):
            d = decode_png(encode_png(w, h, raw, filter_type=ft))
            assert d["pixels"] == raw, (w, h, ft)


def test_crc_corruption_detected():
    blob = bytearray(encode_png(3, 3, _gradient(3, 3, 3)))
    # flip one byte inside the IDAT payload
    pos = blob.index(b"IDAT") + 6
    blob[pos] ^= 0xFF
    with pytest.raises(PngError, match="CRC"):
        decode_png(bytes(blob))


def test_truncation_and_missing_chunks():
    blob = encode_png(3, 3, _gradient(3, 3, 3))
    with pytest.raises(PngError):
        decode_png(blob[: len(blob) // 2])
    with pytest.raises(PngError, match="signature"):
        decode_png(b"JFIF" + blob)
    # IHDR-only stream: no IDAT, no IEND
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0)
    with pytest.raises(PngError):
        decode_png(_SIGNATURE + _chunk(b"IHDR", ihdr))


def test_unsupported_shapes_raise_not_implemented():
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 1)  # Adam7
    blob = (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 30))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(blob)
    ihdr16 = struct.pack(">IIBBBBB", 3, 3, 16, 2, 0, 0, 0)
    blob16 = (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr16)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 57))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(blob16)


def test_bad_filter_byte_rejected():
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    raw = bytes([7]) + b"\x01\x02\x03\x04\x05\x06"  # filter type 7
    blob = (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="filter type"):
        decode_png(blob)


def test_ancillary_chunks_skipped_but_crc_checked():
    blob = encode_png(3, 3, _gradient(3, 3, 3))
    # splice a tEXt chunk between IHDR and IDAT
    head_end = 8 + 12 + 13  # signature + IHDR chunk
    text = _chunk(b"tEXt", b"Comment\x00hello")
    spliced = blob[:head_end] + text + blob[head_end:]
    assert decode_png(spliced)["pixels"] == decode_png(blob)["pixels"]
    bad = bytearray(spliced)
    bad[head_end + 9] ^= 0xFF  # corrupt the ancillary payload
    with pytest.raises(PngError, match="CRC"):
        decode_png(bytes(bad))


def test_decode_media_png_and_auto_dispatch(monkeypatch):
    from mapreduce_grpc_spark.operators import multimodal as mm

    raw = _gradient(5, 4, 3)
    blob = encode_png(5, 4, raw, filter_type=2)

    # explicit stdlib codec
    out = mm.decode_media(blob, "image", codec="png")
    assert (out["width"], out["height"], out["channels"]) == (5, 4, 3)
    assert out["pixel_sum"] == sum(raw)

    # WITHOUT Pillow: auto on a PNG image payload uses the stdlib
    # decoder — real dimensions, not the fake codec's hash arithmetic
    monkeypatch.setattr(mm, "_load_pil", lambda: None)
    auto = mm.decode_media(blob, "image", codec="auto")
    assert (auto["width"], auto["height"]) == (5, 4)
    # bytes no stdlib image codec claims (not PNG, and since r15 a
    # JPEG signature would route to jpegcodec) fall back to the fake
    fake = mm.decode_media(b"GIF89a not decodable", "image", codec="auto")
    assert set(fake) == {"n_bytes", "checksum", "width", "height"}
    # audio/video payloads never hit the image decoders
    assert "pixel_sum" not in mm.decode_media(blob, "video", codec="auto")
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.decode_media(blob, "image", codec="pil")

    # WITH Pillow present (stubbed: the container has none), auto
    # prefers it for images and the seam passes the payload through
    class _FakeImage:
        def __init__(self, data):
            d = decode_png(data)
            self.size = (d["width"], d["height"])

        def load(self):
            pass

    class _FakePIL:
        @staticmethod
        def open(fp):
            return _FakeImage(fp.read())

    monkeypatch.setattr(mm, "_load_pil", lambda: _FakePIL)
    via_pil = mm.decode_media(blob, "image", codec="auto")
    assert (via_pil["width"], via_pil["height"]) == (5, 4)


def test_multimodal_png_decode_oracle_parity(spark, sf_dir):
    """The AUX query's DuckDB hash: encoder + inflate + all five
    unfilters + stats, value-exact against the closed form."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["multimodal_png_decode"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["multimodal_png_decode"],
        sf_dir,
        "multimodal_png_decode",
    )
    # every row round-tripped byte-exactly
    assert df.filter(~df.pixels_ok).count() == 0
