"""Multimodal (binary) column processing.

Pattern for 100 TB media pipelines: media lives as opaque ``binary``
columns with a typed metadata struct alongside; decode / feature-extract /
resize / frame-sample run as Arrow-batched Pandas functions via
``mapInPandas`` (one Python worker per partition, columnar transfer — never
row-at-a-time UDFs).

The decode seam (`decode_media`) carries REAL stdlib decoders for all
three modalities — PNG images (``pngcodec``: zlib IDAT + unfilter),
baseline JPEG (``jpegcodec``: Huffman + dequant + IDCT + YCbCr->RGB —
the dominant web image format), WAV/PCM audio (``wavcodec``: RIFF
chunk walk, exact integer sample stats), and YUV4MPEG2 video
(``y4mcodec``: offset-indexed frames, so sampling reads only sampled
frames) — plus a feature-detected Pillow hook; remaining compressed
formats (progressive JPEG, MP3-class audio, H.26x video) raise
NotImplementedError naming the gap (ffmpeg-class codecs slot in at
the same seam).  The deterministic fake codec (md5/length arithmetic)
remains the CONTRACT path: it is reproducible in pure SQL over the
same bytes, which keeps the driver's multimodal queries
value-hash-checkable; the real codecs get their own
closed-form-oracle AUX queries (`multimodal_png_decode`,
`multimodal_jpeg_decode`, `multimodal_wav_decode`,
`multimodal_y4m_frames`).

The fixture has no binary table; ``media_table`` manufactures one from
``documents`` (payload = utf8 bytes of text, media_type cycled by doc_id)
— the provenance every oracle can reproduce with ``encode(text)``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

MEDIA_TYPES = ("image", "audio", "video")
FRAME_BYTES = 256  # fake video codec: one "frame" per 256-byte chunk


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, media_type, payload binary, meta struct)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("n_bytes_declared"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def _load_pil():
    """The guarded real-codec import: Pillow's Image module, or None.

    Kept as a function (not a module-level try) so tests can monkeypatch
    availability and so executors re-resolve it in their own Python.
    """
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency

        return Image
    except Exception:
        return None


def decode_media(payload: bytes, media_type: str, codec: str = "fake"):
    """Decode one media payload.

    - ``fake``: deterministic bytes-only codec (md5/length arithmetic) —
      always available, and the path the DuckDB oracle can reproduce, so
      the contract queries pin it.
    - ``auto``: dispatch by availability — a REAL decoder when one can
      handle this payload (Pillow for any image when installed, the
      stdlib PNG codec when the bytes carry the PNG signature), else
      ``fake``.
    - ``png``: real stdlib image decode (zlib IDAT + unfilter,
      ``pngcodec``) — no dependencies, always available.
    - ``jpeg``: real baseline-sequential JFIF decode (Huffman +
      dequant + IDCT + YCbCr->RGB, ``jpegcodec``) — no dependencies;
      progressive/arithmetic/12-bit raise naming the gap.
    - ``wav``: real stdlib audio decode (RIFF/PCM, ``wavcodec``) —
      exact integer sample statistics, no dependencies.
    - ``y4m``: real stdlib video decode (YUV4MPEG2, ``y4mcodec``) —
      header + frame index; frame sampling reads only sampled frames.
    - ``pil``: real image decode via Pillow (guarded import; raises
      NotImplementedError when not installed).  ffmpeg plugs in the
      same way for compressed video/float-audio.
    """
    from .jpegcodec import decode_jpeg, is_jpeg
    from .pngcodec import decode_png, is_png
    from .wavcodec import decode_wav, is_wav
    from .y4mcodec import decode_y4m, is_y4m

    if codec == "auto":
        if media_type == "image" and _load_pil() is not None:
            codec = "pil"
        elif media_type == "image" and is_png(payload):
            codec = "png"
        elif media_type == "image" and is_jpeg(payload):
            codec = "jpeg"
        elif media_type == "audio" and is_wav(payload):
            codec = "wav"
        elif media_type == "video" and is_y4m(payload):
            codec = "y4m"
        else:
            codec = "fake"
    if codec == "y4m":
        d = decode_y4m(payload)
        return {
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
            "width": d["width"],
            "height": d["height"],
            "n_frames": d["n_frames"],
            "fps_num": d["fps_num"],
            "fps_den": d["fps_den"],
            "colorspace": d["colorspace"],
        }
    if codec == "wav":
        d = decode_wav(payload)
        return {
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
            "sample_rate": d["sample_rate"],
            "channels": d["channels"],
            "bit_depth": d["bit_depth"],
            "n_frames": d["n_frames"],
            "duration_ms": d["duration_ms"],
            "peak_abs": d["peak_abs"],
            "sumsq": d["sumsq"],
        }
    if codec in ("png", "jpeg"):
        d = decode_png(payload) if codec == "png" else decode_jpeg(payload)
        return {
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
            "width": d["width"],
            "height": d["height"],
            "channels": d["channels"],
            "bit_depth": d["bit_depth"],
            "pixel_sum": d["pixel_sum"],
            "pixel_min": d["pixel_min"],
            "pixel_max": d["pixel_max"],
        }
    if codec == "fake":
        digest = hashlib.md5(payload).hexdigest()
        return {
            "n_bytes": len(payload),
            "checksum": digest,
            # fake "decoded dimensions": stable functions of the bytes
            "width": int(digest[:4], 16) % 1024,
            "height": int(digest[4:8], 16) % 1024,
        }
    if codec == "pil":
        Image = _load_pil()
        if Image is None:
            raise NotImplementedError(
                "codec 'pil': Pillow is not installed in this environment; "
                "use codec='fake' or install Pillow"
            )
        import io

        img = Image.open(io.BytesIO(payload))
        img.load()
        w, h = img.size
        return {
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
            "width": int(w),
            "height": int(h),
        }
    raise NotImplementedError(
        f"codec {codec!r}: real decoders (ffmpeg/soundfile) plug in here"
    )


FEATURES_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, checksum string, "
    "width int, height int"
)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Each batch arrives as a pandas DataFrame (Arrow transfer, no per-row
    pickling); output schema is declared up front.  At scale this is the
    shape for any Python-only codec work — repartition first so batches
    are uniform, keep the UDF stateless.
    """
    media = media_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_media(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out[["doc_id", "media_type", "n_bytes", "checksum", "width", "height"]]

    return media.mapInPandas(extract, FEATURES_SCHEMA)


# Byte semantics: the Spark path operates on the UTF-8 payload, so the
# oracle must too — octet_length(encode(text)) counts bytes (length(text)
# counts characters and diverges on non-ASCII), and DuckDB's md5(VARCHAR)
# already hashes the string's UTF-8 bytes (verified equal to Python
# hashlib.md5(text.encode())).
MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum,
       CAST(CAST(concat('0x', substr(md5(text), 1, 4)) AS INTEGER) % 1024 AS INTEGER) AS width,
       CAST(CAST(concat('0x', substr(md5(text), 5, 4)) AS INTEGER) % 1024 AS INTEGER) AS height
FROM documents
"""


FRAMES_SCHEMA = "doc_id long, frame_no int, frame_bytes long, frame_md5 string"


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' payloads: explode fixed-size byte chunks.

    mapInPandas with a 1->N row explosion (the frame axis) — the streaming-
    friendly shape for video: no frame list is ever materialized per file,
    batches flow through Arrow.
    """
    media = media_table(spark, sf_dir).filter(F.col("media_type") == "video")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(0, len(payload), FRAME_BYTES):
                    chunk = payload[i : i + FRAME_BYTES]
                    rows.append(
                        (doc_id, i // FRAME_BYTES, len(chunk),
                         hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_bytes", "frame_md5"]
            )

    return media.mapInPandas(frames, FRAMES_SCHEMA)


# ASCII-ONLY ORACLE: the Spark path chunks the payload into 256-BYTE
# frames; this DuckDB build has no BLOB substring/md5, so the oracle
# chunks 256 CHARACTERS via substr(text, ...).  The two agree iff the
# text is ASCII (true for the driver fixtures — asserted by
# tests/test_oracle_parity.py::test_frame_sample_ascii_assumption).  With
# non-ASCII corpora the frame boundaries and per-frame md5 genuinely
# differ; byte-exactness there needs a blob-capable oracle engine.
FRAME_SAMPLE_SQL = f"""
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_no,
       CAST(length(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS BIGINT)
         AS frame_bytes,
       md5(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
FROM documents,
     LATERAL (SELECT unnest(generate_series(0,
                CAST(ceil(length(text) / {FRAME_BYTES}.0) AS INTEGER) - 1)) AS i) u
WHERE doc_id % 3 = 2
"""


PNG_DECODE_SCHEMA = (
    "doc_id long, width int, height int, channels int, bit_depth int, "
    "pixel_sum long, pixel_min int, pixel_max int, n_pixels long, "
    "pixels_ok boolean"
)


def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the hash comparator: synthesize a
    deterministic RGB PNG per document (gradient pixels, closed-form
    in doc_id; scanline filter = doc_id % 5, so every one of the five
    PNG unfilter paths is under the hash), round-trip it through the
    stdlib codec (`pngcodec`: chunk walk + CRC + zlib inflate +
    unfilter), and emit the decoded dimensions and pixel statistics.
    The DuckDB oracle recomputes the same stats from the closed form —
    if the encoder, the inflate, any unfilter, or the stats drift by
    one byte, the hash mismatches.  ``pixels_ok`` additionally pins
    byte-exact pixel recovery (sum/min/max alone could alias).

    Scale shape: pure ``mapInPandas`` over a projected one-column
    scan — decode work is row-local, no shuffle; at 100 TB the same
    plan holds with a native codec swapped in at the seam
    (``decode_media``).  The reference engine has no media decode at
    all — north-star capability."""
    import numpy as np

    from .pngcodec import decode_png, encode_png

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                xs = np.arange(w, dtype=np.int64)[None, :, None] * 7
                ys = np.arange(h, dtype=np.int64)[:, None, None] * 11
                cs = np.arange(3, dtype=np.int64)[None, None, :] * 13
                px = ((d + xs + ys + cs) % 256).astype(np.uint8)
                raw = px.tobytes()  # row-major (y, x, c) — PNG order
                blob = encode_png(w, h, raw, color_type=2,
                                  filter_type=d % 5)
                dec = decode_png(blob)
                rows.append((
                    d, dec["width"], dec["height"], dec["channels"],
                    dec["bit_depth"], dec["pixel_sum"],
                    dec["pixel_min"], dec["pixel_max"],
                    dec["n_pixels"], dec["pixels"] == raw,
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "bit_depth", "pixel_sum", "pixel_min",
                    "pixel_max", "n_pixels", "pixels_ok",
                ],
            )

    return docs.mapInPandas(work, PNG_DECODE_SCHEMA)


# Closed-form mirror of the synthesized gradient: every pixel value is
# (doc_id + 7x + 11y + 13c) % 256, so the stats are pure SQL over the
# lateral pixel grid; HUGEINT sums cast back to BIGINT for the hash.
MULTIMODAL_PNG_DECODE_SQL = """
WITH dims AS (
  SELECT doc_id,
         CAST(4 + doc_id % 5 AS INTEGER) AS width,
         CAST(3 + doc_id % 4 AS INTEGER) AS height
  FROM documents
), px AS (
  SELECT d.doc_id, d.width, d.height,
         CAST(SUM((d.doc_id + 7 * x.i + 11 * y.j + 13 * c.k) % 256)
              AS BIGINT) AS pixel_sum,
         CAST(MIN((d.doc_id + 7 * x.i + 11 * y.j + 13 * c.k) % 256)
              AS INTEGER) AS pixel_min,
         CAST(MAX((d.doc_id + 7 * x.i + 11 * y.j + 13 * c.k) % 256)
              AS INTEGER) AS pixel_max
  FROM dims d,
       LATERAL (SELECT unnest(generate_series(0, d.width - 1)) AS i) x,
       LATERAL (SELECT unnest(generate_series(0, d.height - 1)) AS j) y,
       LATERAL (SELECT unnest(generate_series(0, 2)) AS k) c
  GROUP BY d.doc_id, d.width, d.height
)
SELECT doc_id, width, height,
       CAST(3 AS INTEGER) AS channels,
       CAST(8 AS INTEGER) AS bit_depth,
       pixel_sum, pixel_min, pixel_max,
       CAST(width AS BIGINT) * height AS n_pixels,
       TRUE AS pixels_ok
FROM px
"""


def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode under the hash comparator — the JPEG
    twin of ``multimodal_png_decode``: synthesize a deterministic
    grayscale JPEG per document from CONSTANT 8x8 tiles (tile value
    closed-form in doc_id; restart interval ``doc_id % 4``, so the
    RSTn resync + DC-predictor reset path is under the hash),
    round-trip it through the stdlib codec (``jpegcodec``: marker
    walk, Huffman entropy decode, dequant, IDCT, level shift), and
    emit the decoded dimensions and exact pixel statistics.  Constant
    tiles with quant=1 make baseline JPEG LOSSLESS here (the only
    coefficient is DC ``8*(v-128)``, whose IDCT is exactly ``v``), so
    the DuckDB oracle reproduces every stat in closed form with no
    image library; ``pixels_ok`` pins byte-exact recovery against the
    tile expansion.  Varying tile values exercise the DC difference
    categories and the Huffman paths; DC-only blocks keep the oracle
    exact (AC/color/subsampling are pinned in ``tests/
    test_jpegcodec.py`` against an independent IDCT).

    Scale shape: identical to the PNG path — ``mapInPandas`` over a
    one-column scan, row-local decode, no shuffle; libjpeg-turbo swaps
    in at the ``decode_media`` seam."""
    import numpy as np

    from .jpegcodec import decode_jpeg, encode_jpeg_const_gray

    docs = table(spark, sf_dir, "documents", spread=True).select("doc_id")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                bx, by = 2 + d % 3, 1 + d % 2
                i = np.arange(by, dtype=np.int64)[:, None] * 61
                j = np.arange(bx, dtype=np.int64)[None, :] * 17
                bv = (d * 37 + i + j) % 256
                blob = encode_jpeg_const_gray(
                    bx * 8, by * 8, bv, restart_interval=d % 4
                )
                dec = decode_jpeg(blob)
                exp = np.repeat(
                    np.repeat(bv, 8, axis=0), 8, axis=1
                ).astype(np.uint8)
                rows.append((
                    d, dec["width"], dec["height"], dec["channels"],
                    dec["bit_depth"], dec["pixel_sum"],
                    dec["pixel_min"], dec["pixel_max"],
                    dec["n_pixels"], dec["pixels"] == exp.tobytes(),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "bit_depth", "pixel_sum", "pixel_min",
                    "pixel_max", "n_pixels", "pixels_ok",
                ],
            )

    return docs.mapInPandas(work, PNG_DECODE_SCHEMA)


# Closed-form mirror of the constant tiles: tile (i, j) of doc d holds
# value (37d + 61i + 17j) % 256 across 64 pixels, so the stats are
# pure SQL over the lateral tile grid.
MULTIMODAL_JPEG_DECODE_SQL = """
WITH dims AS (
  SELECT doc_id,
         CAST(2 + doc_id % 3 AS INTEGER) AS bx,
         CAST(1 + doc_id % 2 AS INTEGER) AS by
  FROM documents
), tiles AS (
  SELECT d.doc_id, d.bx, d.by,
         CAST(64 * SUM((37 * d.doc_id + 61 * y.i + 17 * x.j) % 256)
              AS BIGINT) AS pixel_sum,
         CAST(MIN((37 * d.doc_id + 61 * y.i + 17 * x.j) % 256)
              AS INTEGER) AS pixel_min,
         CAST(MAX((37 * d.doc_id + 61 * y.i + 17 * x.j) % 256)
              AS INTEGER) AS pixel_max
  FROM dims d,
       LATERAL (SELECT unnest(generate_series(0, d.by - 1)) AS i) y,
       LATERAL (SELECT unnest(generate_series(0, d.bx - 1)) AS j) x
  GROUP BY d.doc_id, d.bx, d.by
)
SELECT doc_id,
       CAST(bx * 8 AS INTEGER) AS width,
       CAST(by * 8 AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS channels,
       CAST(8 AS INTEGER) AS bit_depth,
       pixel_sum, pixel_min, pixel_max,
       CAST(bx AS BIGINT) * by * 64 AS n_pixels,
       TRUE AS pixels_ok
FROM tiles
"""


WAV_DECODE_SCHEMA = (
    "doc_id long, sample_rate int, channels int, bit_depth int, "
    "n_frames long, duration_ms long, peak_abs int, sumsq long, "
    "samples_ok boolean"
)


def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode under the hash comparator — the WAV twin of
    ``multimodal_png_decode``: synthesize a deterministic PCM signal
    per document (sample values closed-form in doc_id; mono/stereo
    alternating by parity), round-trip it through the stdlib RIFF
    codec (``wavcodec``: chunk walk, fmt validation, int16 decode),
    and emit exact integer statistics.  The DuckDB oracle recomputes
    the same stats from the closed form over the lateral
    frame x channel grid — if the encoder layout, the chunk parsing,
    the interleave order, or a stat drifts by one sample, the hash
    mismatches.  ``samples_ok`` pins byte-exact sample recovery.

    Scale shape: identical to the PNG path — ``mapInPandas`` over a
    one-column scan, row-local decode, no shuffle; a native audio
    codec swaps in at the ``decode_media`` seam."""
    import numpy as np

    from .wavcodec import decode_wav, encode_wav

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                nch = 1 + d % 2
                nf = 50 + d % 50
                i = np.arange(nf, dtype=np.int64)[:, None] * 7
                ch = np.arange(nch, dtype=np.int64)[None, :] * 13
                v = ((d * 31 + i + ch) % 65536) - 32768
                flat = v.reshape(-1)  # frame-major interleaved
                blob = encode_wav(flat, 8000, nch, bits=16)
                dec = decode_wav(blob)
                rows.append((
                    d, dec["sample_rate"], dec["channels"],
                    dec["bit_depth"], dec["n_frames"],
                    dec["duration_ms"], dec["peak_abs"], dec["sumsq"],
                    bool(np.array_equal(dec["samples"], flat)),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "channels", "bit_depth",
                    "n_frames", "duration_ms", "peak_abs", "sumsq",
                    "samples_ok",
                ],
            )

    return docs.mapInPandas(work, WAV_DECODE_SCHEMA)


# Closed-form mirror of the synthesized PCM: sample value at
# (frame i, channel ch) is ((doc_id*31 + 7i + 13ch) % 65536) - 32768.
MULTIMODAL_WAV_DECODE_SQL = """
WITH dims AS (
  SELECT doc_id,
         CAST(1 + doc_id % 2 AS INTEGER) AS channels,
         CAST(50 + doc_id % 50 AS INTEGER) AS n_frames
  FROM documents
), sm AS (
  SELECT d.doc_id, d.channels, d.n_frames,
         CAST(SUM(s.v * s.v) AS BIGINT) AS sumsq,
         CAST(MAX(ABS(s.v)) AS INTEGER) AS peak_abs
  FROM dims d,
       LATERAL (SELECT unnest(generate_series(0, d.n_frames - 1)) AS i) fr,
       LATERAL (SELECT unnest(generate_series(0, d.channels - 1)) AS c) ch,
       LATERAL (SELECT ((d.doc_id * 31 + fr.i * 7 + ch.c * 13) % 65536)
                       - 32768 AS v) s
  GROUP BY d.doc_id, d.channels, d.n_frames
)
SELECT doc_id,
       CAST(8000 AS INTEGER) AS sample_rate,
       channels,
       CAST(16 AS INTEGER) AS bit_depth,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(n_frames AS BIGINT) * 1000 // 8000 AS duration_ms,
       peak_abs, sumsq, TRUE AS samples_ok
FROM sm
"""


QUERIES = {
    "multimodal_features": multimodal_features,
    "frame_sample": frame_sample,
}

ORACLES = {
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "frame_sample": FRAME_SAMPLE_SQL,
}

Y4M_FRAMES_SCHEMA = (
    "doc_id long, frame_no int, n_px int, y_sum long, y_min int, "
    "y_max int"
)


def multimodal_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling under the hash comparator — the
    third modality leg: synthesize a deterministic YUV4MPEG2 clip per
    document (luma closed-form in doc_id; dimensions and frame count
    parity-cycled), decode it with the stdlib codec, and sample EVERY
    SECOND frame's luma statistics — a 1->N frame explosion whose
    per-frame reads touch only the sampled frames' bytes (the
    offset-indexed decode).  The DuckDB oracle recomputes the stats
    from the closed form over the lateral frame x pixel grid; one
    wrong offset, plane size, or sampled index flips the hash.

    Scale shape: ``mapInPandas`` over a one-column scan, row-local
    decode, no shuffle; compressed codecs swap in at the
    ``decode_media`` seam with the same sampling contract."""
    import numpy as np

    from .y4mcodec import decode_y4m, encode_y4m, frame_luma

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 4 + (d % 3) * 2
                h = 2 + (d % 2) * 2
                nf = 3 + d % 4
                i = np.arange(w * h, dtype=np.int64) * 3
                frames = [
                    ((d + 5 * f + i) % 256).astype(np.uint8)
                    for f in range(nf)
                ]
                blob = encode_y4m(frames, w, h)
                meta = decode_y4m(blob)
                for f in range(0, meta["n_frames"], 2):
                    y = frame_luma(blob, meta, f).astype(np.int64)
                    rows.append((
                        d, f, w * h, int(y.sum()), int(y.min()),
                        int(y.max()),
                    ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_no", "n_px", "y_sum", "y_min",
                    "y_max",
                ],
            )

    return docs.mapInPandas(work, Y4M_FRAMES_SCHEMA)


# Closed-form mirror: luma at (frame f, pixel i) is
# (doc_id + 5f + 3i) % 256; sampled frames are 0, 2, 4, ...
MULTIMODAL_Y4M_FRAMES_SQL = """
WITH dims AS (
  SELECT doc_id,
         CAST(4 + (doc_id % 3) * 2 AS INTEGER) AS w,
         CAST(2 + (doc_id % 2) * 2 AS INTEGER) AS h,
         CAST(3 + doc_id % 4 AS INTEGER) AS nf
  FROM documents
), fr AS (
  SELECT d.doc_id, d.w, d.h, f.f
  FROM dims d,
       LATERAL (SELECT unnest(generate_series(0, d.nf - 1, 2)) AS f) f
)
SELECT fr.doc_id,
       CAST(fr.f AS INTEGER) AS frame_no,
       CAST(fr.w * fr.h AS INTEGER) AS n_px,
       CAST(SUM((fr.doc_id + 5 * fr.f + 3 * px.i) % 256) AS BIGINT)
         AS y_sum,
       CAST(MIN((fr.doc_id + 5 * fr.f + 3 * px.i) % 256) AS INTEGER)
         AS y_min,
       CAST(MAX((fr.doc_id + 5 * fr.f + 3 * px.i) % 256) AS INTEGER)
         AS y_max
FROM fr,
     LATERAL (SELECT unnest(generate_series(0, fr.w * fr.h - 1)) AS i) px
GROUP BY fr.doc_id, fr.f, fr.w, fr.h
"""


AUX_QUERIES = {
    "multimodal_png_decode": multimodal_png_decode,
    "multimodal_jpeg_decode": multimodal_jpeg_decode,
    "multimodal_wav_decode": multimodal_wav_decode,
    "multimodal_y4m_frames": multimodal_y4m_frames,
}

AUX_ORACLES = {
    "multimodal_png_decode": MULTIMODAL_PNG_DECODE_SQL,
    "multimodal_jpeg_decode": MULTIMODAL_JPEG_DECODE_SQL,
    "multimodal_wav_decode": MULTIMODAL_WAV_DECODE_SQL,
    "multimodal_y4m_frames": MULTIMODAL_Y4M_FRAMES_SQL,
}
