"""Pure-stdlib PNG codec for the multimodal decode seam.

The container ships no image libraries, but PNG needs none: the format
is zlib (stdlib) over per-scanline filtered samples (RFC 2083).  This
module implements a real decoder — signature + chunk walk with CRC
verification, IHDR validation, IDAT concatenation + zlib inflate, all
five scanline unfilters (None/Sub/Up/Average/Paeth), palette
expansion — plus the minimal encoder the tests and the AUX query use
to synthesize deterministic images.

Scope (validated loudly, never silently wrong): bit depth 8, color
types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
no interlacing.  That covers the overwhelming share of real-world
PNGs; Adam7 / 16-bit / sub-byte depths raise ``NotImplementedError``
with the exact reason.

Scale note: this is the DECODE SEAM's reference implementation — the
Spark-side plumbing (`multimodal.decode_media`, ``mapInPandas`` batch
shape, schema) is identical whether the per-payload decoder is this
function, Pillow, or a native codec; at 100 TB you swap the codec,
not the pipeline.  Unfiltering is O(bytes) per image and row-local.

The reference engine has no media path at all (its records are text
lines, /root/reference/src/mr_tasks.h:60-120); this is a north-star
capability beyond it.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel (pre palette expansion)
_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: color type -> channels in the DECODED output
_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed PNG (bad signature/CRC/structure/length)."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunks(data: bytes):
    """Yield (type, payload) verifying each chunk's CRC."""
    if data[:8] != _SIGNATURE:
        raise PngError("not a PNG: bad 8-byte signature")
    off = 8
    n = len(data)
    while off < n:
        if off + 8 > n:
            raise PngError("truncated chunk header")
        (length,) = struct.unpack(">I", data[off : off + 4])
        ctype = data[off + 4 : off + 8]
        end = off + 8 + length
        if end + 4 > n:
            raise PngError(f"truncated {ctype!r} chunk")
        payload = data[off + 8 : end]
        (crc,) = struct.unpack(">I", data[end : end + 4])
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, payload
        off = end + 4
        if ctype == b"IEND":
            return
    raise PngError("missing IEND chunk")


def _unfilter(raw: bytes, width: int, height: int, spp: int) -> bytearray:
    """Reverse the per-scanline filters; returns packed samples."""
    stride = width * spp
    if len(raw) != (stride + 1) * height:
        raise PngError(
            f"decompressed length {len(raw)} != expected "
            f"{(stride + 1) * height} for {width}x{height}x{spp}"
        )
    out = bytearray(stride * height)
    prev_start = -1
    for y in range(height):
        fpos = y * (stride + 1)
        ftype = raw[fpos]
        line = raw[fpos + 1 : fpos + 1 + stride]
        o = y * stride
        if ftype == 0:  # None
            out[o : o + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                a = out[o + x - spp] if x >= spp else 0
                out[o + x] = (line[x] + a) & 0xFF
        elif ftype == 2:  # Up
            if prev_start < 0:
                out[o : o + stride] = line
            else:
                for x in range(stride):
                    out[o + x] = (line[x] + out[prev_start + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = out[o + x - spp] if x >= spp else 0
                b = out[prev_start + x] if prev_start >= 0 else 0
                out[o + x] = (line[x] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = out[o + x - spp] if x >= spp else 0
                b = out[prev_start + x] if prev_start >= 0 else 0
                c = (
                    out[prev_start + x - spp]
                    if prev_start >= 0 and x >= spp
                    else 0
                )
                out[o + x] = (line[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise PngError(f"unknown scanline filter type {ftype}")
        prev_start = o
    return out


def decode_png(data: bytes) -> dict:
    """Decode a PNG to pixels + stats.

    Returns ``{"width", "height", "channels", "bit_depth", "pixels"
    (bytes, row-major channel-interleaved, palette expanded),
    "pixel_sum", "pixel_min", "pixel_max", "n_pixels"}``.
    """
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            if ihdr is not None:
                raise PngError("duplicate IHDR")
            if len(payload) != 13:
                raise PngError("IHDR must be 13 bytes")
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"PLTE":
            plte = payload
        elif ctype == b"IDAT":
            idat.extend(payload)
        # ancillary chunks are CRC-checked by _chunks and skipped
    if ihdr is None:
        raise PngError("missing IHDR")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if width <= 0 or height <= 0:
        raise PngError(f"bad dimensions {width}x{height}")
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if interlace == 1:
        raise NotImplementedError(
            "Adam7-interlaced PNG: the stdlib seam decodes sequential "
            "scanlines only; use a full codec for interlaced inputs"
        )
    if interlace != 0:
        raise PngError(f"unknown interlace method {interlace}")
    if color_type not in _SAMPLES:
        raise PngError(f"unknown color type {color_type}")
    if bit_depth != 8:
        raise NotImplementedError(
            f"bit depth {bit_depth}: the stdlib seam decodes 8-bit "
            "samples only"
        )
    if not idat:
        raise PngError("no IDAT data")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from e
    spp = _SAMPLES[color_type]
    samples = _unfilter(raw, width, height, spp)
    if color_type == 3:
        if plte is None or len(plte) % 3:
            raise PngError("palette image without a valid PLTE")
        n_entries = len(plte) // 3
        px = bytearray(width * height * 3)
        for i, idx in enumerate(samples):
            if idx >= n_entries:
                raise PngError(
                    f"palette index {idx} out of range ({n_entries})"
                )
            px[3 * i : 3 * i + 3] = plte[3 * idx : 3 * idx + 3]
        pixels = bytes(px)
    else:
        pixels = bytes(samples)
    return {
        "width": width,
        "height": height,
        "channels": _CHANNELS[color_type],
        "bit_depth": bit_depth,
        "pixels": pixels,
        "pixel_sum": sum(pixels),
        "pixel_min": min(pixels),
        "pixel_max": max(pixels),
        "n_pixels": width * height,
    }


def is_png(data: bytes) -> bool:
    return data[:8] == _SIGNATURE


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _filter_line(
    ftype: int, line: bytes, prev: bytes | None, spp: int
) -> bytes:
    """Apply filter ``ftype`` to one scanline (encoder side — the exact
    inverse of ``_unfilter``, so round-trip tests pin both)."""
    stride = len(line)
    out = bytearray(stride)
    for x in range(stride):
        a = line[x - spp] if x >= spp else 0
        b = prev[x] if prev is not None else 0
        c = prev[x - spp] if prev is not None and x >= spp else 0
        if ftype == 0:
            out[x] = line[x]
        elif ftype == 1:
            out[x] = (line[x] - a) & 0xFF
        elif ftype == 2:
            out[x] = (line[x] - b) & 0xFF
        elif ftype == 3:
            out[x] = (line[x] - ((a + b) >> 1)) & 0xFF
        elif ftype == 4:
            out[x] = (line[x] - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"filter type {ftype} out of range 0-4")
    return bytes(out)


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filter_type: int = 0,
    palette: bytes | None = None,
) -> bytes:
    """Minimal PNG encoder (8-bit, no interlace) for tests and the
    deterministic AUX query.  ``filter_type`` applies ONE filter to
    every scanline so each of the decoder's five unfilter paths can be
    exercised on demand (a production encoder picks per-line)."""
    if color_type not in _SAMPLES:
        raise ValueError(f"unknown color type {color_type}")
    spp = _SAMPLES[color_type]
    stride = width * spp
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixels length {len(pixels)} != {width}x{height}x{spp}"
        )
    raw = bytearray()
    prev: bytes | None = None
    for y in range(height):
        line = bytes(pixels[y * stride : (y + 1) * stride])
        raw.append(filter_type)
        raw.extend(_filter_line(filter_type, line, prev, spp))
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    parts = [_SIGNATURE, _chunk(b"IHDR", ihdr)]
    if color_type == 3:
        if palette is None or len(palette) % 3:
            raise ValueError("color type 3 needs a PLTE palette")
        parts.append(_chunk(b"PLTE", palette))
    parts.append(_chunk(b"IDAT", zlib.compress(bytes(raw), 6)))
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)
