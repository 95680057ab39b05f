"""The stdlib WAV (RIFF/PCM) codec behind the multimodal decode seam —
the audio twin of tests/test_pngcodec.py.

Pins: round-trips across bit depths and channel counts, a checked-in
file with known stats, cross-validation against the independent stdlib
``wave`` parser, ancillary-chunk tolerance, malformed-input rejection,
the `decode_media` dispatch, and the DuckDB-hash AUX query
(`multimodal_wav_decode`, closed-form sample stats).
"""

from __future__ import annotations

import io
import os
import struct
import wave

import numpy as np
import pytest

from mapreduce_grpc_spark.operators.wavcodec import (
    WavError,
    decode_wav,
    encode_wav,
    is_wav,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


def _signal(nf, nch, seed=3):
    i = np.arange(nf, dtype=np.int64)[:, None] * 7
    ch = np.arange(nch, dtype=np.int64)[None, :] * 13
    return (((seed * 31 + i + ch) % 65536) - 32768).reshape(-1)


def test_checked_in_file_decodes_to_known_stats():
    with open(os.path.join(DATA, "tiny.wav"), "rb") as f:
        blob = f.read()
    assert is_wav(blob)
    d = decode_wav(blob)
    assert (d["sample_rate"], d["channels"], d["bit_depth"]) == (
        8000, 2, 16,
    )
    assert (d["n_frames"], d["duration_ms"]) == (20, 2)
    assert (d["peak_abs"], d["sumsq"]) == (32675, 42515683020)
    assert np.array_equal(d["samples"], _signal(20, 2))


@pytest.mark.parametrize("bits", [8, 16, 32])
@pytest.mark.parametrize("nch", [1, 2, 4])
def test_roundtrip_depths_and_channels(bits, nch):
    lo, hi = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    rng = np.arange(-60, 60, dtype=np.int64).clip(lo, hi)
    flat = np.resize(rng, 30 * nch)
    blob = encode_wav(flat, 44100, nch, bits=bits)
    d = decode_wav(blob)
    assert d["bit_depth"] == bits and d["channels"] == nch
    assert d["n_frames"] == 30
    assert np.array_equal(d["samples"], flat)
    assert d["sumsq"] == int(np.dot(flat, flat))
    assert d["peak_abs"] == int(np.max(np.abs(flat)))


def test_agrees_with_stdlib_wave_module():
    """Independent parser cross-check: the stdlib wave module reads
    our container byte-for-byte (channels/rate/width/frames + raw
    PCM)."""
    flat = _signal(25, 2, seed=9)
    blob = encode_wav(flat, 16000, 2, bits=16)
    w = wave.open(io.BytesIO(blob))
    assert (
        w.getnchannels(), w.getframerate(), w.getsampwidth(),
        w.getnframes(),
    ) == (2, 16000, 2, 25)
    raw = np.frombuffer(w.readframes(25), dtype="<i2").astype(np.int64)
    assert np.array_equal(raw, flat)
    # and the reverse: a wave-module-authored file decodes here
    buf = io.BytesIO()
    ww = wave.open(buf, "wb")
    ww.setnchannels(1)
    ww.setsampwidth(2)
    ww.setframerate(8000)
    ww.writeframes(flat[:20].astype("<i2").tobytes())
    ww.close()
    d = decode_wav(buf.getvalue())
    assert d["n_frames"] == 20 and d["channels"] == 1
    assert np.array_equal(d["samples"], flat[:20])


def test_ancillary_chunks_skipped_and_odd_padding():
    blob = encode_wav(_signal(5, 1), 8000, 1, bits=16)
    # splice a LIST chunk with an ODD payload size (pad byte follows)
    body = b"INFOIART" + struct.pack("<I", 5) + b"someb" + b"\x00"
    lst = b"LIST" + struct.pack("<I", len(body)) + body
    spliced = (
        blob[:12]
        + lst
        + blob[12:]
    )
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    d = decode_wav(spliced)
    assert np.array_equal(d["samples"], _signal(5, 1))


def test_malformed_rejected():
    good = encode_wav(_signal(5, 1), 8000, 1, bits=16)
    with pytest.raises(WavError, match="magic"):
        decode_wav(b"JUNK" + good[4:])
    with pytest.raises(WavError, match="truncated RIFF"):
        decode_wav(good[: len(good) // 2])
    # data size not a whole frame count (stereo, odd sample count)
    bad = bytearray(encode_wav(_signal(4, 2), 8000, 2, bits=16))
    pos = bytes(bad).index(b"data") + 4
    (size,) = struct.unpack_from("<I", bad, pos)
    struct.pack_into("<I", bad, pos, size - 2)
    struct.pack_into("<I", bad, 4, len(bad) - 8 - 2)
    del bad[len(bad) - 2 :]
    with pytest.raises(WavError, match="whole number"):
        decode_wav(bytes(bad))
    # missing fmt / data
    empty = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
    with pytest.raises(WavError, match="missing fmt"):
        decode_wav(empty)
    # compressed / float formats refuse loudly
    bad_tag = bytearray(good)
    pos = bytes(bad_tag).index(b"fmt ") + 8
    struct.pack_into("<H", bad_tag, pos, 3)  # IEEE float
    with pytest.raises(NotImplementedError, match="format tag 3"):
        decode_wav(bytes(bad_tag))
    # unsupported depth
    with pytest.raises(ValueError, match="bit depth"):
        encode_wav(_signal(5, 1), 8000, 1, bits=24)


def test_eight_bit_recentering():
    """8-bit WAV stores unsigned; the decoder re-centers so stats are
    depth-comparable."""
    flat = np.array([-128, -1, 0, 1, 127], dtype=np.int64)
    d = decode_wav(encode_wav(flat, 8000, 1, bits=8))
    assert np.array_equal(d["samples"], flat)
    assert d["peak_abs"] == 128


def test_decode_media_wav_and_auto_dispatch(monkeypatch):
    from mapreduce_grpc_spark.operators import multimodal as mm

    flat = _signal(30, 1)
    blob = encode_wav(flat, 8000, 1, bits=16)
    out = mm.decode_media(blob, "audio", codec="wav")
    assert out["sample_rate"] == 8000 and out["n_frames"] == 30
    assert out["sumsq"] == int(np.dot(flat, flat))

    monkeypatch.setattr(mm, "_load_pil", lambda: None)
    auto = mm.decode_media(blob, "audio", codec="auto")
    assert auto["n_frames"] == 30
    # non-WAV audio bytes fall back to the fake codec
    fake = mm.decode_media(b"OggS not a wav", "audio", codec="auto")
    assert set(fake) == {"n_bytes", "checksum", "width", "height"}
    # an image payload never routes to the audio decoder
    img = mm.decode_media(blob, "image", codec="auto")
    assert "sample_rate" not in img


def test_multimodal_wav_decode_oracle_parity(spark, sf_dir):
    """The AUX query's DuckDB hash: encoder layout + chunk walk +
    int16 interleave + exact integer stats vs the closed form."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["multimodal_wav_decode"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["multimodal_wav_decode"],
        sf_dir,
        "multimodal_wav_decode",
    )
    assert df.filter(~df.samples_ok).count() == 0
