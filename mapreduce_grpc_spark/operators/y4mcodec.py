"""Pure-stdlib Y4M (YUV4MPEG2) codec for the multimodal decode seam.

The video twin of ``pngcodec``/``wavcodec``: YUV4MPEG2 is the
uncompressed interchange format real video pipelines pass between
tools (ffmpeg/x264/VMAF all speak it) — a one-line ASCII header
(``YUV4MPEG2 W<w> H<h> F<num>:<den> ... C<colorspace>``) followed by
``FRAME\\n`` + raw planar YUV bytes per frame.  No entropy coding, so
a complete, honest decoder needs zero dependencies — which makes it
the right REAL format for the video leg of the seam (compressed
codecs slot in at ``decode_media`` exactly like Pillow does for
images).

Scope: progressive (``Ip`` or unspecified) only; colorspaces mono /
420 (+jpeg/mpeg2/paldv variants, identical plane layout) / 422 / 444.
Interlaced streams and unknown colorspaces raise
``NotImplementedError`` naming the field.

Frame access is offset-indexed: ``decode_y4m`` walks the frame
headers ONCE and records plane offsets, so sampling every k-th frame
(the pipeline shape) touches only the sampled frames' bytes — at
scale the same seam reads ranges of a blob column instead of decoding
the whole clip.

The reference engine has no media path at all
(/root/reference/src/mr_tasks.h:60-120).
"""

from __future__ import annotations

import numpy as np


class Y4mError(ValueError):
    """Malformed YUV4MPEG2 stream."""


_MAGIC = b"YUV4MPEG2"

#: colorspace -> (chroma width divisor, chroma height divisor); mono
#: has no chroma planes at all
_CHROMA_DIV = {
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
}


def is_y4m(data: bytes) -> bool:
    return data[: len(_MAGIC)] == _MAGIC


def _frame_bytes(w: int, h: int, cs: str) -> int:
    if cs == "mono":
        return w * h
    dw, dh = _CHROMA_DIV[cs]
    return w * h + 2 * ((w // dw) * (h // dh))


def decode_y4m(data: bytes) -> dict:
    """Parse header + frame index.

    Returns ``{"width", "height", "fps_num", "fps_den", "colorspace",
    "n_frames", "luma_offsets" (byte offset of each frame's Y plane),
    "frame_size"}``.  Use :func:`frame_luma` to read one frame's luma
    plane — sampling never touches unsampled frames' bytes.
    """
    nl = data.find(b"\n")
    if not is_y4m(data) or nl < 0:
        raise Y4mError("not a YUV4MPEG2 stream: bad magic/header line")
    try:
        fields = data[len(_MAGIC) : nl].decode("ascii").split()
    except UnicodeDecodeError as e:
        raise Y4mError(f"non-ASCII stream header: {e}") from e
    w = h = None
    fps_num, fps_den = 30, 1
    cs = "420"
    for tok in fields:
        tag, val = tok[:1], tok[1:]
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif tag == "I":
            if val not in ("p", "?"):
                raise NotImplementedError(
                    f"interlacing I{val}: the stdlib seam decodes "
                    "progressive streams only"
                )
        elif tag == "C":
            cs = val
            if cs != "mono" and cs not in _CHROMA_DIV:
                raise NotImplementedError(
                    f"colorspace C{cs}: supported are mono/420*/422/444"
                )
        # X (comment) and A (aspect) tokens carry no layout info
    if not w or not h or w <= 0 or h <= 0:
        raise Y4mError(f"missing/bad dimensions W{w} H{h}")
    if fps_den <= 0 or fps_num <= 0:
        raise Y4mError(f"bad frame rate {fps_num}:{fps_den}")
    if cs != "mono":
        dw, dh = _CHROMA_DIV[cs]
        if w % dw or h % dh:
            raise Y4mError(
                f"dimensions {w}x{h} not divisible for C{cs} chroma"
            )
    fsz = _frame_bytes(w, h, cs)
    offsets = []
    pos = nl + 1
    n = len(data)
    while pos < n:
        fh_end = data.find(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME" or fh_end < 0:
            raise Y4mError(f"bad FRAME header at byte {pos}")
        y_off = fh_end + 1
        if y_off + fsz > n:
            raise Y4mError(
                f"truncated frame {len(offsets)}: needs {fsz} bytes, "
                f"stream has {n - y_off}"
            )
        offsets.append(y_off)
        pos = y_off + fsz
    return {
        "width": w,
        "height": h,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": cs,
        "n_frames": len(offsets),
        "luma_offsets": offsets,
        "frame_size": fsz,
    }


def frame_luma(data: bytes, meta: dict, idx: int) -> np.ndarray:
    """One frame's luma plane as uint8 (height x width), reading only
    that frame's Y bytes."""
    off = meta["luma_offsets"][idx]
    w, h = meta["width"], meta["height"]
    return np.frombuffer(data[off : off + w * h], dtype=np.uint8).reshape(
        h, w
    )


def encode_y4m(
    frames_y,
    width: int,
    height: int,
    fps: tuple[int, int] = (25, 1),
    chroma_value: int = 128,
    colorspace: str = "420",
) -> bytes:
    """Minimal progressive encoder (tests + the AUX query): luma planes
    supplied per frame, chroma planes constant ``chroma_value``."""
    if colorspace != "mono" and colorspace not in _CHROMA_DIV:
        raise ValueError(f"colorspace {colorspace!r} unsupported")
    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 "
        f"C{colorspace}\n"
    ).encode("ascii")
    if colorspace == "mono":
        chroma = b""
    else:
        dw, dh = _CHROMA_DIV[colorspace]
        chroma = bytes([chroma_value]) * (
            2 * ((width // dw) * (height // dh))
        )
    parts = [header]
    for y in frames_y:
        arr = np.asarray(y, dtype=np.uint8)
        if arr.size != width * height:
            raise ValueError(
                f"luma plane has {arr.size} samples, needs "
                f"{width * height}"
            )
        parts.append(b"FRAME\n")
        parts.append(arr.tobytes())
        parts.append(chroma)
    return b"".join(parts)
