"""The stdlib baseline-JPEG codec behind the multimodal decode seam.

The r14 verdict's remaining codec gap: PNG/WAV/Y4M were real but the
dominant web image format still needed Pillow.  These tests pin the
REAL decoder — marker walk, canonical Huffman entropy decode with
byte unstuffing and restart markers, dequant + dezigzag, IDCT, chroma
upsampling, JFIF YCbCr->RGB — against a checked-in JPEG file with
hand-computable stats (constant 8x8 tiles decode BIT-EXACTLY under
quant=1), synthesized round-trips across grayscale/color/subsampling/
AC paths, an independent-IDCT cross-check, loud scope guards naming
the exact unsupported feature, and the `decode_media` dispatch with
and without Pillow.  The AUX query `multimodal_jpeg_decode` adds the
DuckDB hash over the same codec (closed-form tile stats).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

from mapreduce_grpc_spark.operators.jpegcodec import (
    _A,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_const_gray,
    is_jpeg,
)

DATA = os.path.join(os.path.dirname(__file__), "data")

# tiles of the checked-in fixture (tests/data/tiny.jpg): 32x16 gray,
# constant 8x8 tiles, restart interval 2 — regenerate with
# encode_jpeg_const_gray(32, 16, TINY_TILES, restart_interval=2)
TINY_TILES = np.array([[16, 240, 130, 64], [200, 0, 255, 90]])
TINY_MD5 = "3458f5485ddfe3cf127df26e2e0e20b6"


def test_checked_in_file_decodes_to_known_stats():
    with open(os.path.join(DATA, "tiny.jpg"), "rb") as f:
        blob = f.read()
    assert hashlib.md5(blob).hexdigest() == TINY_MD5, (
        "fixture bytes changed — stats below are for the original"
    )
    assert is_jpeg(blob)
    d = decode_jpeg(blob)
    assert (d["width"], d["height"], d["channels"], d["bit_depth"]) == (
        32, 16, 1, 8,
    )
    # constant tiles under quant=1 are lossless: stats are hand-
    # computable from the tile values (64 pixels per tile)
    assert d["pixel_sum"] == 64 * int(TINY_TILES.sum()) == 63680
    assert d["pixel_min"] == 0
    assert d["pixel_max"] == 255
    assert d["n_pixels"] == 512
    exp = np.repeat(np.repeat(TINY_TILES, 8, 0), 8, 1).astype(np.uint8)
    assert d["pixels"] == exp.tobytes()


def test_checked_in_file_matches_pillow_when_available():
    from mapreduce_grpc_spark.operators.multimodal import _load_pil

    Image = _load_pil()
    if Image is None:
        pytest.skip("Pillow not installed in this environment")
    import io

    with open(os.path.join(DATA, "tiny.jpg"), "rb") as f:
        blob = f.read()
    img = Image.open(io.BytesIO(blob))
    img.load()
    assert img.size == (32, 16)
    ours = np.frombuffer(
        decode_jpeg(blob)["pixels"], dtype=np.uint8
    ).reshape(16, 32)
    theirs = np.asarray(img.convert("L"))
    # both decoders see the same DC-only blocks; IDCT rounding may
    # differ by at most one code value on exact halves
    assert int(np.abs(ours.astype(int) - theirs.astype(int)).max()) <= 1


def test_const_gray_roundtrip_is_bit_exact_any_dims():
    rng = np.random.RandomState(11)
    for w, h in [(8, 8), (20, 13), (64, 24), (7, 5)]:
        by, bx = -(-h // 8), -(-w // 8)
        bv = rng.randint(0, 256, size=(by, bx))
        d = decode_jpeg(encode_jpeg_const_gray(w, h, bv))
        exp = np.repeat(np.repeat(bv, 8, 0), 8, 1)[:h, :w]
        got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w)
        assert np.array_equal(got, exp), (w, h)
        assert d["pixel_sum"] == int(exp.sum())


def test_restart_markers_resync_and_reset_predictors():
    bv = (np.arange(12).reshape(3, 4) * 23) % 256
    plain = decode_jpeg(encode_jpeg_const_gray(32, 24, bv))
    for ri in (1, 2, 3, 5):
        with_rst = decode_jpeg(
            encode_jpeg_const_gray(32, 24, bv, restart_interval=ri)
        )
        assert with_rst["pixels"] == plain["pixels"], ri


def test_color_444_identity_transform():
    # Cb = Cr = 128 -> R = G = B = Y exactly (no rounding hazard)
    yv = np.array([[40, 90], [140, 250]])
    Y = np.zeros((2, 2, 8, 8))
    Y[:, :, 0, 0] = 8 * (yv - 128)
    C = np.zeros((2, 2, 8, 8))
    d = decode_jpeg(encode_jpeg(16, 16, [Y, C.copy(), C.copy()]))
    assert d["channels"] == 3
    px = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(16, 16, 3)
    exp = np.repeat(np.repeat(yv, 8, 0), 8, 1)
    for c in range(3):
        assert np.array_equal(px[:, :, c], exp)


def test_color_420_subsampling_upsamples_chroma():
    # constant planes: Y=200, Cb=160, Cr=128 ->
    # R=200, G=floor(200-0.344136*32+.5)=189, B=min(255, 200+1.772*32)
    Y = np.zeros((2, 2, 8, 8))
    Y[:, :, 0, 0] = 8 * (200 - 128)
    Cb = np.zeros((1, 1, 8, 8))
    Cb[0, 0, 0, 0] = 8 * (160 - 128)
    Cr = np.zeros((1, 1, 8, 8))
    d = decode_jpeg(
        encode_jpeg(
            16, 16, [Y, Cb, Cr], sampling=[(2, 2), (1, 1), (1, 1)]
        )
    )
    px = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(16, 16, 3)
    assert (px[:, :, 0] == 200).all()
    assert (px[:, :, 1] == 189).all()
    assert (px[:, :, 2] == 255).all()


def test_ac_coefficients_match_independent_idct():
    rng = np.random.RandomState(7)
    for _ in range(5):
        blk = rng.randint(-60, 60, size=(1, 1, 8, 8)).astype(np.int64)
        d = decode_jpeg(encode_jpeg(8, 8, [blk]))
        got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(8, 8)
        ref = np.clip(
            np.floor(_A.T @ blk[0, 0].astype(float) @ _A + 128.5),
            0, 255,
        ).astype(np.uint8)
        assert np.array_equal(got, ref)


def test_zrl_long_zero_runs():
    # a lone high-frequency coefficient forces ZRL (16-zero-run) codes
    blk = np.zeros((1, 1, 8, 8), dtype=np.int64)
    blk[0, 0, 7, 7] = 30
    blk[0, 0, 0, 0] = 8 * (100 - 128)
    d = decode_jpeg(encode_jpeg(8, 8, [blk]))
    ref = np.clip(
        np.floor(_A.T @ blk[0, 0].astype(float) @ _A + 128.5), 0, 255
    ).astype(np.uint8)
    assert d["pixels"] == ref.tobytes()


def test_scope_guards_name_the_exact_feature():
    blob = encode_jpeg_const_gray(16, 8, np.array([[50, 150]]))
    prog = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(prog)
    arith = blob.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(arith)
    lossless = blob.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(lossless)
    # 12-bit precision: SOF payload's first byte
    i = blob.index(b"\xff\xc0")
    twelve = blob[: i + 4] + bytes([12]) + blob[i + 5 :]
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(twelve)
    # 16-bit quant table: DQT Pq nibble
    j = blob.index(b"\xff\xdb")
    hq = blob[: j + 4] + bytes([0x10]) + blob[j + 5 :]
    with pytest.raises(NotImplementedError, match="16-bit quant"):
        decode_jpeg(hq)
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(blob[:40])
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"definitely not an image")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(blob[:-30])  # scan cut mid-entropy data


def test_decode_media_dispatch_with_and_without_pillow(monkeypatch):
    import mapreduce_grpc_spark.operators.multimodal as mm

    blob = encode_jpeg_const_gray(16, 8, np.array([[50, 150]]))
    # explicit codec
    d = mm.decode_media(blob, "image", codec="jpeg")
    assert (d["width"], d["height"]) == (16, 8)
    assert d["pixel_sum"] == 64 * 200
    # auto WITHOUT pillow: signature routes to the stdlib codec
    monkeypatch.setattr(mm, "_load_pil", lambda: None)
    d2 = mm.decode_media(blob, "image", codec="auto")
    assert d2["width"] == 16 and "pixel_sum" in d2
    # auto with a (fake) pillow present prefers the pil path
    class _FakeImg:
        size = (16, 8)

        def load(self):
            pass

    class _FakePIL:
        @staticmethod
        def open(_fh):
            return _FakeImg()

    monkeypatch.setattr(mm, "_load_pil", lambda: _FakePIL)
    d3 = mm.decode_media(blob, "image", codec="auto")
    assert (d3["width"], d3["height"]) == (16, 8)
    assert "pixel_sum" not in d3  # pil surface is dims-only


def test_multimodal_jpeg_decode_oracle_parity(spark, sf_dir):
    """The AUX query's DuckDB hash: synthesized constant-tile JPEGs
    (restart interval cycling 0-3) round-tripped through the codec
    must match the closed-form tile statistics exactly."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["multimodal_jpeg_decode"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["multimodal_jpeg_decode"],
        sf_dir,
        "multimodal_jpeg_decode",
    )
