"""Stdlib(+numpy) baseline JPEG codec for the multimodal decode seam.

Decodes BASELINE SEQUENTIAL JFIF (ITU-T T.81 SOF0, the dominant web
image format): marker walk, 8-bit quantization tables, canonical
Huffman entropy decode with byte unstuffing and restart markers,
dequantize + dezigzag, 8x8 IDCT (numpy separable basis), integer
chroma upsampling, and the JFIF YCbCr->RGB transform — no Pillow, no
native libs.  Scope guards raise with the EXACT unsupported feature
(progressive SOF2, lossless/differential/arithmetic frames, 12-bit
precision, 16-bit quant tables, 4-component CMYK, non-integer
subsampling) instead of mis-decoding.

A minimal ENCODER (`encode_jpeg`) ships alongside for the oracle
round-trips, mirroring `pngcodec.encode_png` / `wavcodec.encode_wav`:
it writes a spec-conformant baseline stream from QUANTIZED coefficient
blocks using the public Annex-K luminance Huffman tables.  With
quant=1 and DC-only blocks (constant 8x8 tiles) the decode is
BIT-EXACT — the IDCT of a DC-only block is a constant D/8, so the
closed-form DuckDB oracle (`multimodal_jpeg_decode`) can reproduce
every pixel statistic without a JPEG library on the oracle side.

The reference engine has no media decode at all (its data model is
text lines, /root/reference/src/worker.cc) — this is north-star
capability for the 100 TB web-corpus story, where image payloads ride
as opaque binary columns and decode runs row-local under
``mapInPandas`` (see ``multimodal.decode_media``).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

#: zigzag index of each natural-order coefficient (T.81 Figure A.6):
#: ZIGZAG[k] = natural index of the k-th coefficient in zigzag order.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical LUMINANCE Huffman tables (public spec constants) —
# used by the encoder; the decoder always reads tables from the stream.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# IDCT basis A[u, x] = c(u)/2 * cos((2x+1) u pi / 16); pixels = A.T F A.
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = (_c / 2.0) * np.cos((2 * _x + 1) * _u * np.pi / 16)


def is_jpeg(b: bytes) -> bool:
    return len(b) >= 3 and b[:3] == b"\xff\xd8\xff"


# ---------------------------------------------------------------- huffman


def _build_codes(bits, vals):
    """Canonical Huffman (T.81 C.2): symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits, vals):
    """Canonical Huffman decode map: (length, code) -> symbol."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first reader over one UNSTUFFED entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError(
                    "truncated JPEG: entropy-coded scan ended "
                    "mid-block"
                )
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, t: int) -> int:
        v = 0
        for _ in range(t):
            v = (v << 1) | self.bit()
        return v


def _read_huff(r: _BitReader, table) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------- decoder


def _split_scan(data: bytes, pos: int):
    """Entropy data from ``pos``: unstuff FF00, split on RSTn.
    Returns (segments, pos_after) where pos_after sits on the next
    true marker's 0xFF."""
    segs = []
    cur = bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            break
        nb = data[pos + 1]
        if nb == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nb <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, pos


def decode_jpeg(b: bytes) -> dict:
    """Decode a baseline-sequential JFIF stream.

    Returns ``{"width", "height", "channels", "bit_depth", "pixels"
    (row-major bytes, RGB interleaved for 3 components), "n_pixels",
    "pixel_sum", "pixel_min", "pixel_max"}`` — the same surface as
    ``pngcodec.decode_png``.  Raises ``ValueError`` on malformed or
    truncated streams and ``NotImplementedError`` naming the exact
    unsupported feature."""
    if not is_jpeg(b):
        raise ValueError("not a JPEG stream (SOI/APP marker missing)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    n = len(b)
    while True:
        if pos + 4 > n:
            raise ValueError("truncated JPEG: marker segment expected")
        if b[pos] != 0xFF:
            raise ValueError(
                f"malformed JPEG: expected marker at offset {pos}"
            )
        while pos + 1 < n and b[pos + 1] == 0xFF:
            pos += 1  # fill bytes before a marker are legal
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("truncated JPEG: EOI before scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # TEM/RSTn: standalone, no length field
        seglen = struct.unpack(">H", b[pos : pos + 2])[0]
        seg = b[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG: segment overruns stream")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError(
                        "JPEG 16-bit quantization tables (DQT Pq=1) "
                        "not supported: baseline is 8-bit"
                    )
                qvals = np.zeros(64, dtype=np.int64)
                qvals[ZIGZAG] = np.frombuffer(
                    seg[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                qt[tq] = qvals.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(seg[i + 17 : i + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode(
                    bits, vals
                )
                i += 17 + cnt
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline+extended huff
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(
                    f"JPEG {prec}-bit sample precision not supported: "
                    "baseline is 8-bit"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"JPEG with {nc} components not supported "
                    "(CMYK/unknown): expected grayscale (1) or "
                    "YCbCr (3)"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) not supported: baseline "
                "sequential only"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type SOF{marker - 0xC0} "
                "(lossless/differential/hierarchical) not supported: "
                "baseline sequential only"
            )
        elif marker in (0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "arithmetic-coded JPEG (SOF9/10/11) not supported: "
                "Huffman baseline only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("malformed JPEG: SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for s in range(ns):
                cs, tt = seg[1 + 2 * s : 3 + 2 * s]
                scan_tables[cs] = (tt >> 4, tt & 0x0F)
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    "multi-scan (non-interleaved) baseline JPEG not "
                    "supported: one interleaved scan expected"
                )
            pos += seglen
            return _decode_scan(
                b, pos, frame, scan_tables, qt, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / others: skip
        pos += seglen


def _decode_scan(
    b, pos, frame, scan_tables, qt, huff_dc, huff_ac, restart_interval
):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4):
            raise NotImplementedError(
                f"JPEG sampling factors {c['h']}x{c['v']} not "
                "supported (1, 2 or 4 expected)"
            )
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                "non-integer JPEG chroma subsampling ratio not "
                "supported"
            )
        if c["tq"] not in qt:
            raise ValueError(
                f"malformed JPEG: quant table {c['tq']} undefined"
            )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    segs, _ = _split_scan(b, pos)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    pred = [0] * len(comps)
    seg_i = 0
    reader = _BitReader(segs[0])
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError(
                    "truncated JPEG: restart marker missing mid-scan"
                )
            reader = _BitReader(segs[seg_i])
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            tdc, tac = scan_tables[c["id"]]
            if tdc not in huff_dc or tac not in huff_ac:
                raise ValueError(
                    "malformed JPEG: scan references undefined "
                    f"Huffman table (DC {tdc} / AC {tac})"
                )
            for bv in range(c["v"]):
                for bh in range(c["h"]):
                    coeff = _decode_block(
                        reader, huff_dc[tdc], huff_ac[tac], pred, ci
                    )
                    px = _A.T @ (coeff * qt[c["tq"]]) @ _A
                    y0 = (my * c["v"] + bv) * 8
                    x0 = (mx * c["h"] + bh) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w] + 128.0)
    if len(comps) == 3:
        y, cb, cr = out_planes
        # JFIF YCbCr -> RGB; round half-up (floor(x+0.5)) so the
        # closed-form oracle can reproduce boundary pixels exactly
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, bl], axis=-1)
    else:
        rgb = out_planes[0][:, :, None]
    pix = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    flat = pix.reshape(-1)
    return {
        "width": int(w),
        "height": int(h),
        "channels": pix.shape[-1],
        "bit_depth": 8,
        "pixels": pix.tobytes(),
        "n_pixels": int(w) * int(h),
        "pixel_sum": int(flat.astype(np.int64).sum()),
        "pixel_min": int(flat.min()),
        "pixel_max": int(flat.max()),
    }


def _decode_block(reader, dc_table, ac_table, pred, ci):
    coeff = np.zeros((8, 8))
    t = _read_huff(reader, dc_table)
    if t > 11:
        raise ValueError("malformed JPEG: DC category > 11")
    pred[ci] += _extend(reader.receive(t), t)
    coeff[0, 0] = pred[ci]
    k = 1
    while k < 64:
        rs = _read_huff(reader, ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("malformed JPEG: AC run past block end")
        nat = ZIGZAG[k]
        coeff[nat // 8, nat % 8] = _extend(reader.receive(s), s)
        k += 1
    return coeff


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in reversed(range(length)):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits (T.81 F.1.2.3)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _emit_coded(bw, codes, sym, v, t):
    code, ln = codes[sym]
    bw.write(code, ln)
    if t:
        if v < 0:
            v += (1 << t) - 1
        bw.write(v, t)


def encode_jpeg(
    w: int,
    h: int,
    comp_blocks: list[np.ndarray],
    sampling: list[tuple[int, int]] | None = None,
    quant: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline-JFIF encoder from QUANTIZED coefficients.

    ``comp_blocks[c]`` has shape ``(mcuy*Vc, mcux*Hc, 8, 8)`` in
    NATURAL (row, col) frequency order; ``sampling[c] = (Hc, Vc)``
    (default all 1x1); one uniform quant value for every coefficient
    of every table (quant=1 -> coefficients pass through verbatim, so
    DC-only blocks decode bit-exactly).  Standard Annex-K luminance
    Huffman tables for every component.  Purpose-built for oracle
    round-trips, not for compression."""
    nc = len(comp_blocks)
    sampling = sampling or [(1, 1)] * nc
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c, (blocks, (hc, vc)) in enumerate(zip(comp_blocks, sampling)):
        if blocks.shape[:2] != (mcuy * vc, mcux * hc):
            raise ValueError(
                f"component {c}: blocks {blocks.shape[:2]} != "
                f"({mcuy * vc}, {mcux * hc}) for {w}x{h} at {hc}x{vc}"
            )
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: one uniform 8-bit table
    qtab = bytes([quant]) * 64
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtab
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        hc, vc = sampling[c]
        sof += bytes([c + 1, (hc << 4) | vc, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: Annex-K luminance DC (class 0, id 0) and AC (class 1, id 0)
    dht = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht += bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    pred = [0] * nc
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.align()
            out += bw.buf
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            pred = [0] * nc
        my, mx = divmod(m, mcux)
        for c in range(nc):
            hc, vc = sampling[c]
            for bv in range(vc):
                for bh in range(hc):
                    blk = comp_blocks[c][my * vc + bv, mx * hc + bh]
                    zz = [
                        int(blk[ZIGZAG[k] // 8, ZIGZAG[k] % 8])
                        for k in range(64)
                    ]
                    diff = zz[0] - pred[c]
                    pred[c] = zz[0]
                    t = _category(diff)
                    _emit_coded(bw, dc_codes, t, diff, t)
                    run = 0
                    last = max(
                        (k for k in range(1, 64) if zz[k]), default=0
                    )
                    for k in range(1, last + 1):
                        if zz[k] == 0:
                            run += 1
                            continue
                        while run > 15:
                            _emit_coded(bw, ac_codes, 0xF0, 0, 0)
                            run -= 16
                        s = _category(zz[k])
                        _emit_coded(
                            bw, ac_codes, (run << 4) | s, zz[k], s
                        )
                        run = 0
                    if last < 63:
                        _emit_coded(bw, ac_codes, 0x00, 0, 0)  # EOB
    bw.align()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_const_gray(
    w: int,
    h: int,
    block_values: np.ndarray,
    restart_interval: int = 0,
) -> bytes:
    """Grayscale baseline JPEG from CONSTANT 8x8 tiles (one pixel value
    per tile, ``block_values`` shape ``(ceil(h/8), ceil(w/8))``).  With
    quant=1 each tile's only coefficient is DC ``8*(v-128)``, whose
    IDCT is exactly ``v`` — the bit-exact closed-form case the DuckDB
    oracle mirrors."""
    by, bx = -(-h // 8), -(-w // 8)
    bv = np.asarray(block_values, dtype=np.int64)
    if bv.shape != (by, bx):
        raise ValueError(f"block_values {bv.shape} != ({by}, {bx})")
    blocks = np.zeros((by, bx, 8, 8), dtype=np.int64)
    blocks[:, :, 0, 0] = 8 * (bv - 128)
    return encode_jpeg(
        w, h, [blocks], restart_interval=restart_interval
    )
