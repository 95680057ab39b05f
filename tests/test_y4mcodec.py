"""The stdlib YUV4MPEG2 codec behind the multimodal decode seam — the
video twin of tests/test_pngcodec.py / test_wavcodec.py.

Pins: header parsing across field orders/comments, frame indexing and
offset-only sampling, every supported colorspace's plane arithmetic,
a checked-in clip with known stats, malformed-input rejection,
interlace/colorspace refusals, the `decode_media` dispatch, and the
DuckDB-hash AUX query (`multimodal_y4m_frames`).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from mapreduce_grpc_spark.operators.y4mcodec import (
    Y4mError,
    decode_y4m,
    encode_y4m,
    frame_luma,
    is_y4m,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


def _frames(d, w, h, nf):
    i = np.arange(w * h, dtype=np.int64) * 3
    return [((d + 5 * f + i) % 256).astype(np.uint8) for f in range(nf)]


def test_checked_in_clip_decodes_to_known_stats():
    with open(os.path.join(DATA, "tiny.y4m"), "rb") as f:
        blob = f.read()
    assert is_y4m(blob)
    m = decode_y4m(blob)
    assert (m["width"], m["height"], m["n_frames"]) == (6, 4, 4)
    assert (m["fps_num"], m["fps_den"], m["colorspace"]) == (25, 1, "420")
    assert int(frame_luma(blob, m, 0).sum()) == 900
    assert int(frame_luma(blob, m, 2).sum()) == 1140


@pytest.mark.parametrize(
    "cs,chroma_per_frame",
    [("mono", 0), ("420", 12), ("422", 24), ("444", 48)],
)
def test_colorspace_plane_arithmetic(cs, chroma_per_frame):
    w, h, nf = 6, 4, 3
    frames = _frames(1, w, h, nf)
    blob = encode_y4m(frames, w, h, colorspace=cs)
    m = decode_y4m(blob)
    assert m["colorspace"] == cs and m["n_frames"] == nf
    assert m["frame_size"] == w * h + chroma_per_frame
    for f in range(nf):
        assert np.array_equal(
            frame_luma(blob, m, f).reshape(-1), frames[f]
        ), (cs, f)


def test_header_field_order_and_comments():
    frames = _frames(2, 4, 2, 2)
    body = encode_y4m(frames, 4, 2)
    _, rest = body.split(b"\n", 1)
    scrambled = b"YUV4MPEG2 C420 XCOMMENT F30000:1001 H2 W4 Ip\n" + rest
    m = decode_y4m(scrambled)
    assert (m["width"], m["height"]) == (4, 2)
    assert (m["fps_num"], m["fps_den"]) == (30000, 1001)
    assert np.array_equal(frame_luma(scrambled, m, 1).reshape(-1), frames[1])


def test_refusals_and_malformed():
    frames = _frames(1, 4, 2, 1)
    blob = encode_y4m(frames, 4, 2)
    _, rest = blob.split(b"\n", 1)
    with pytest.raises(NotImplementedError, match="interlacing"):
        decode_y4m(b"YUV4MPEG2 W4 H2 F25:1 It C420\n" + rest)
    with pytest.raises(NotImplementedError, match="colorspace"):
        decode_y4m(b"YUV4MPEG2 W4 H2 F25:1 C410\n" + rest)
    with pytest.raises(Y4mError, match="magic"):
        decode_y4m(b"AVI LIST" + blob)
    with pytest.raises(Y4mError, match="dimensions"):
        decode_y4m(b"YUV4MPEG2 F25:1 C420\n" + rest)
    with pytest.raises(Y4mError, match="divisible"):
        decode_y4m(b"YUV4MPEG2 W5 H3 F25:1 C420\n" + rest)
    with pytest.raises(Y4mError, match="truncated frame"):
        decode_y4m(blob[: len(blob) - 3])
    # garbage where a FRAME header should be
    bad = blob.replace(b"FRAME\n", b"FRAMS\n", 1)
    with pytest.raises(Y4mError, match="FRAME header"):
        decode_y4m(bad)


def test_decode_media_y4m_and_auto_dispatch(monkeypatch):
    from mapreduce_grpc_spark.operators import multimodal as mm

    blob = encode_y4m(_frames(7, 6, 4, 5), 6, 4)
    out = mm.decode_media(blob, "video", codec="y4m")
    assert (out["width"], out["height"], out["n_frames"]) == (6, 4, 5)
    assert out["colorspace"] == "420"

    monkeypatch.setattr(mm, "_load_pil", lambda: None)
    auto = mm.decode_media(blob, "video", codec="auto")
    assert auto["n_frames"] == 5
    # non-Y4M video bytes fall back to the fake codec; audio payloads
    # never route here
    fake = mm.decode_media(b"\x00\x00\x00 ftypmp42", "video", codec="auto")
    assert set(fake) == {"n_bytes", "checksum", "width", "height"}
    assert "n_frames" not in mm.decode_media(blob, "audio", codec="auto")


def test_multimodal_y4m_frames_oracle_parity(spark, sf_dir):
    """The AUX query's DuckDB hash: header/frame indexing + sampled
    luma stats vs the closed form, exact."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["multimodal_y4m_frames"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["multimodal_y4m_frames"],
        sf_dir,
        "multimodal_y4m_frames",
    )
    # only even frames are sampled
    assert df.filter(df.frame_no % 2 == 1).count() == 0
