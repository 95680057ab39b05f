"""Pure-stdlib WAV (RIFF/PCM) codec for the multimodal decode seam.

The audio twin of ``pngcodec``: WAV needs no external library — the
container is RIFF chunks and the payload is raw PCM samples.  The
decoder walks the chunk list (tolerating ancillary chunks like LIST /
INFO / fact), validates the ``fmt `` block, and decodes integer PCM at
8 / 16 / 32 bits into exact integer statistics; the minimal encoder
exists for tests and the deterministic AUX query.

Scope (validated loudly, never silently wrong): format tag 1 (integer
PCM) only — compressed formats (ADPCM, mu-law, MP3-in-WAV) and IEEE
float raise ``NotImplementedError`` naming the tag.  8-bit samples are
unsigned per the spec and are re-centered to signed (-128..127) so
statistics are comparable across depths.

All emitted statistics are exact integers (frame/channel counts, peak
magnitude, sum of squares, integer-milliseconds duration) — the
module-wide determinism rule: nothing on a hashed surface depends on
float rounding.  At 100 TB the pipeline shape is the PNG seam's: the
per-payload decoder is row-local inside ``mapInPandas``; swap in a
native codec at ``decode_media`` without touching the plan.

The reference engine has no media path at all (its records are text
lines, /root/reference/src/mr_tasks.h:60-120).
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Malformed WAV (bad magic/chunk structure/sizes)."""


def is_wav(data: bytes) -> bool:
    return (
        len(data) >= 12
        and data[:4] == b"RIFF"
        and data[8:12] == b"WAVE"
    )


def _chunks(data: bytes):
    """Yield (id, payload) from the RIFF body; enforces the size
    header and word alignment (chunks pad to even offsets)."""
    if not is_wav(data):
        raise WavError("not a WAV: missing RIFF/WAVE magic")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    if 8 + riff_size > len(data):
        raise WavError(
            f"truncated RIFF: header declares {riff_size} body bytes, "
            f"file has {len(data) - 8}"
        )
    off = 12
    while off + 8 <= end:
        cid = data[off : off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        payload_end = off + 8 + size
        if payload_end > end:
            raise WavError(f"truncated {cid!r} chunk")
        yield cid, data[off + 8 : payload_end]
        off = payload_end + (size & 1)  # pad byte on odd sizes


_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def decode_wav(data: bytes) -> dict:
    """Decode integer-PCM WAV bytes to exact integer statistics.

    Returns ``{"sample_rate", "channels", "bit_depth", "n_frames",
    "duration_ms" (floor(frames*1000/rate)), "peak_abs", "sumsq",
    "samples" (np.int64 array, frame-major interleaved, 8-bit
    re-centered)}``.
    """
    fmt = None
    pcm = None
    for cid, payload in _chunks(data):
        if cid == b"fmt ":
            if len(payload) < 16:
                raise WavError("fmt chunk shorter than 16 bytes")
            fmt = struct.unpack_from("<HHIIHH", payload, 0)
        elif cid == b"data":
            pcm = payload
        # LIST / fact / cue / id3 etc.: ancillary, skipped
    if fmt is None:
        raise WavError("missing fmt chunk")
    if pcm is None:
        raise WavError("missing data chunk")
    tag, channels, rate, _byte_rate, block_align, bits = fmt
    if tag != 1:
        raise NotImplementedError(
            f"WAV format tag {tag}: the stdlib seam decodes integer "
            "PCM (tag 1) only — compressed/float formats need a full "
            "codec"
        )
    if channels < 1:
        raise WavError("channel count must be >= 1")
    if rate <= 0:
        raise WavError(f"bad sample rate {rate}")
    if bits not in _DTYPES:
        raise NotImplementedError(
            f"bit depth {bits}: the stdlib seam decodes 8/16/32-bit "
            "integer PCM only"
        )
    frame_bytes = channels * (bits // 8)
    if block_align != frame_bytes:
        raise WavError(
            f"block align {block_align} != channels*depth "
            f"{frame_bytes}"
        )
    if len(pcm) % frame_bytes:
        raise WavError(
            f"data size {len(pcm)} is not a whole number of "
            f"{frame_bytes}-byte frames"
        )
    raw = np.frombuffer(pcm, dtype=_DTYPES[bits]).astype(np.int64)
    if bits == 8:
        raw = raw - 128  # spec: 8-bit WAV is unsigned, center it
    n_frames = len(pcm) // frame_bytes
    peak = int(np.max(np.abs(raw))) if raw.size else 0
    sumsq = int(np.dot(raw, raw)) if raw.size else 0
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "bit_depth": int(bits),
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // rate,
        "peak_abs": peak,
        "sumsq": sumsq,
        "samples": raw,
    }


def encode_wav(
    samples, sample_rate: int, channels: int, bits: int = 16
) -> bytes:
    """Minimal integer-PCM WAV encoder (tests + the AUX query).
    ``samples`` is frame-major interleaved signed values (8-bit input
    is signed -128..127 here; stored unsigned per spec)."""
    if bits not in _DTYPES:
        raise ValueError(f"bit depth {bits}: use 8, 16, or 32")
    arr = np.asarray(samples, dtype=np.int64)
    if arr.size % channels:
        raise ValueError(
            f"{arr.size} samples is not a whole number of "
            f"{channels}-channel frames"
        )
    lo = -(2 ** (bits - 1))
    hi = 2 ** (bits - 1) - 1
    if arr.size and (arr.min() < lo or arr.max() > hi):
        raise ValueError(f"samples out of {bits}-bit range [{lo},{hi}]")
    store = arr + 128 if bits == 8 else arr
    pcm = store.astype(_DTYPES[bits]).tobytes()
    frame_bytes = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * frame_bytes, frame_bytes, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
