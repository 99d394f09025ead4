"""Multimodal column plumbing — image/audio/video as opaque BINARY columns
with typed metadata (north-star extension; no reference analog).

Decode comes in two tiers:
- REAL codecs, fully value-checked: WAV (stdlib ``wave`` RIFF/PCM16
  round-trip, ``multimodal_wav_decode``), PNG (zlib inflate +
  CRC-checked chunk walk + scanline unfiltering,
  ``multimodal_png_decode``), and BMP (header parse + bottom-up row
  re-order + stride-padding strip, ``multimodal_bmp_decode``) — genuine
  encode and decode running executor-side over Arrow batches;
- a deterministic fake decoder (``fake_decode_features``) standing in for
  codecs the container lacks (PIL/ffmpeg-class formats: JPEG, MP3,
  H.264 — an explicit non-goal, see COVERAGE.md), with
  production-shaped plumbing.

Payloads are synthesized deterministically from ``documents.text`` (ASCII →
bytes is 1:1), which lets the byte-level oracle run on string slices in
DuckDB while Spark operates on genuine BINARY columns — same bytes, same
md5, hash-checkable.

Scale notes: binary columns ride parquet like any other column; the decode
pass is ``mapInPandas`` over Arrow batches (zero-copy into NumPy
``frombuffer``), embarrassingly parallel, no shuffle. The metadata/frame
queries below are pure JVM expressions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

FRAME_BYTES = 32
MAX_FRAMES = 4

_KINDS = ["image", "audio", "video"]


def assets(docs: DataFrame) -> DataFrame:
    """Typed multimodal asset table: (asset_id, kind, payload BINARY,
    meta STRUCT<n_bytes, source>). Deterministic kind assignment by id."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


# --- metadata extraction (oracle-checked byte-level ops) -------------------------

_META_SQL = """
SELECT doc_id AS asset_id,
       ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
       length(text)::BIGINT       AS n_bytes,
       md5(text)                  AS checksum,
       (length(text) // 32)::BIGINT AS n_full_frames,
       source
FROM documents
"""


@register("multimodal_metadata", _META_SQL)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset metadata pass: byte length, md5 checksum, frame capacity —
    computed from the BINARY payload column (the oracle reproduces it on
    the source text, byte-identical for ASCII)."""
    a = assets(load_table(spark, sf_dir, "documents"))
    return a.select(
        "asset_id",
        "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
        F.floor(F.col("meta.n_bytes") / FRAME_BYTES).cast("long").alias("n_full_frames"),
        F.col("meta.source").alias("source"),
    )


# --- frame sampling (video-shaped slicing, oracle-checked) ------------------------

_FRAMES_SQL = f"""
WITH v AS (SELECT doc_id AS asset_id, text FROM documents WHERE doc_id % 3 = 2),
f AS (SELECT asset_id,
             unnest(range(0, least(length(text) // {FRAME_BYTES}, {MAX_FRAMES}))) AS frame_id,
             text
      FROM v)
SELECT asset_id, frame_id,
       md5(substr(text, (frame_id * {FRAME_BYTES} + 1)::INT, {FRAME_BYTES})) AS frame_checksum,
       {FRAME_BYTES}::BIGINT AS frame_bytes
FROM f
"""


@register("multimodal_frame_sample", _FRAMES_SQL)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' assets: slice the payload into fixed-size
    byte frames, checksum the first MAX_FRAMES of each. Pure binary
    expressions (substr on BINARY) — the slicing pattern a real
    frame-sampler UDF would follow, minus the codec."""
    # Payloads shorter than one frame must emit zero rows: without this
    # filter the sequence stop is -1 and Spark generates a DESCENDING
    # [0, -1], emitting spurious frames where the oracle's range(0, 0)
    # emits none.
    a = (
        assets(load_table(spark, sf_dir, "documents"))
        .filter(F.col("kind") == "video")
        .filter(F.col("meta.n_bytes") >= FRAME_BYTES)
    )
    frames = a.select(
        "asset_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.least(
                    F.floor(F.col("meta.n_bytes") / FRAME_BYTES).cast("long"),
                    F.lit(MAX_FRAMES),
                )
                - 1,
            )
        ).alias("frame_id"),
    )
    return frames.select(
        "asset_id",
        "frame_id",
        F.md5(
            F.expr(f"substring(payload, frame_id * {FRAME_BYTES} + 1, {FRAME_BYTES})")
        ).alias("frame_checksum"),
        F.lit(FRAME_BYTES).cast("long").alias("frame_bytes"),
    )


# --- deterministic fake decode (rows-only; real Arrow plumbing) --------------------


def fake_decode_features(asset_df: DataFrame) -> DataFrame:
    """DETERMINISTIC FAKE DECODER. Parses the payload bytes as if they were
    a decoded raster: 'width'/'height' from the first two bytes, channel
    statistics from the byte stream. The real decoder (PIL/librosa/ffmpeg)
    drops into this exact mapInPandas slot — schema, Arrow batching, and
    partition behavior are identical; only the numpy math changes."""
    import numpy as np

    schema = "asset_id long, kind string, width int, height int, mean_byte double, max_byte int"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for aid, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                rows.append(
                    (
                        int(aid),
                        kind,
                        int(buf[0]) if buf.size else 0,
                        int(buf[1]) if buf.size > 1 else 0,
                        round(float(buf.mean()) if buf.size else 0.0, 6),
                        int(buf.max()) if buf.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "width", "height", "mean_byte", "max_byte"]
            )

    return asset_df.select("asset_id", "kind", "payload").mapInPandas(decode, schema=schema)


_DECODE_SQL = """
WITH b AS (
  SELECT doc_id AS asset_id,
         ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
         text
  FROM documents),
e AS (SELECT asset_id, kind,
             ascii(substr(text, 1, 1)) AS width,
             ascii(substr(text, 2, 1)) AS height,
             list_transform(range(1, length(text) + 1),
                            i -> ascii(substr(text, i::INT, 1))) AS bytes
      FROM b)
SELECT asset_id, kind, width, height,
       round(list_avg(bytes), 6) AS mean_byte,
       list_max(bytes)           AS max_byte
FROM e
"""


@register("multimodal_decode_features", _DECODE_SQL)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake decode over the binary column (see
    fake_decode_features); byte statistics are oracle-checked via ascii()
    arithmetic on the source text."""
    a = assets(load_table(spark, sf_dir, "documents"))
    out = fake_decode_features(a)
    return out.select(
        "asset_id",
        "kind",
        "width",
        "height",
        "mean_byte",
        F.col("max_byte"),
    )


# --- REAL image decode #2: BMP (bottom-up rows + 4-byte stride padding) ----------
#
# Second real raster codec alongside PNG, zero external deps. BMP's two
# traps make the decode genuine work: the pixel array is stored BOTTOM-UP
# (a decoder that reads rows in file order flips the image — caught by the
# order-sensitive top_row_sum output) and every row is padded to a 4-byte
# boundary (BMP_WIDTH=30 → stride 32, so a decoder ignoring padding shears
# every row after the first). PIL/ffmpeg-class formats (JPEG, MP3, H.264)
# remain out of scope — see COVERAGE.md; the codec surface here is
# WAV + PNG + BMP, all decoded from bytes with stdlib only.

BMP_WIDTH = 30  # deliberately not a multiple of 4: stride padding is exercised
_BMP_PALETTE = b"".join(bytes((i, i, i, 0)) for i in range(256))
_BMP_OFFBITS = 14 + 40 + 256 * 4  # file header + info header + grayscale palette


def synth_bmp_assets(docs: DataFrame) -> DataFrame:
    """(asset_id, bmp BINARY): real 8-bit indexed-color BMPs — text bytes
    as pixels over a grayscale palette, rows of BMP_WIDTH padded to the
    4-byte stride, stored bottom-up per the format."""
    import struct

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = []
            for text in pdf["text"]:
                pix = bytes(text, "utf-8")
                h = (len(pix) + BMP_WIDTH - 1) // BMP_WIDTH
                pix = pix.ljust(h * BMP_WIDTH, b"\x00")
                stride = (BMP_WIDTH + 3) & ~3
                body = bytearray()
                for r in range(h - 1, -1, -1):  # bottom-up row order
                    row = pix[r * BMP_WIDTH : (r + 1) * BMP_WIDTH]
                    body.extend(row.ljust(stride, b"\x00"))
                info = struct.pack(
                    "<IiiHHIIiiII", 40, BMP_WIDTH, h, 1, 8, 0, len(body), 0, 0, 256, 0
                )
                file_hdr = struct.pack(
                    "<2sIHHI", b"BM", _BMP_OFFBITS + len(body), 0, 0, _BMP_OFFBITS
                )
                payloads.append(file_hdr + info + _BMP_PALETTE + bytes(body))
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "bmp": payloads})

    return docs.filter(F.col("doc_id") % 3 == 2).select("doc_id", "text").mapInPandas(
        encode, schema="asset_id long, bmp binary"
    )


def decode_bmp_features(bmp_df: DataFrame) -> DataFrame:
    """REAL decode: validate the BM header, parse BITMAPINFOHEADER, read
    the pixel array honoring the 4-byte row stride and bottom-up storage,
    emit image statistics. ``top_row_sum`` is the sum of the image's TOP
    row — wrong unless rows were re-ordered, so a file-order byte copy
    fails the value check."""
    import struct

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["bmp"]):
                data = bytes(payload)
                magic, _fsize, _r1, _r2, offbits = struct.unpack("<2sIHHI", data[:14])
                assert magic == b"BM", "bad BMP signature"
                hdr_size, width, height, planes, bpp, comp = struct.unpack(
                    "<IiiHHI", data[14:34]
                )
                assert hdr_size == 40 and planes == 1, "bad BITMAPINFOHEADER"
                assert bpp == 8 and comp == 0, "not uncompressed 8bpp"
                assert height >= 0, "top-down BMP not emitted by our encoder"
                if height == 0:
                    rows.append((int(aid), int(width), 0, None, None, None))
                    continue
                stride = (width + 3) & ~3
                arr = np.frombuffer(
                    data, dtype=np.uint8, count=stride * height, offset=offbits
                ).reshape(height, stride)
                img = arr[::-1, :width].astype("int64")  # un-flip, drop padding
                rows.append(
                    (
                        int(aid),
                        int(width),
                        int(height),
                        int(img.max()),
                        int(img.sum()),
                        int(img[0].sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height", "max_pixel", "pixel_sum", "top_row_sum"],
            ).astype({"max_pixel": "Int64", "pixel_sum": "Int64", "top_row_sum": "Int64"})

    return bmp_df.mapInPandas(
        decode,
        schema="asset_id long, width long, height long, max_pixel long, "
        "pixel_sum long, top_row_sum long",
    )


_BMP_SQL = f"""
WITH a AS (SELECT doc_id AS asset_id, text FROM documents WHERE doc_id % 3 = 2),
d AS (SELECT asset_id,
             CAST((length(text) + {BMP_WIDTH} - 1) // {BMP_WIDTH} AS BIGINT) AS height,
             list_transform(range(1, length(text) + 1),
                            i -> ascii(substr(text, i::INT, 1))) AS px,
             list_transform(range(1, least(length(text), {BMP_WIDTH}) + 1),
                            i -> ascii(substr(text, i::INT, 1))) AS top
      FROM a)
SELECT asset_id,
       {BMP_WIDTH}::BIGINT AS width,
       height,
       list_max(px)::BIGINT  AS max_pixel,
       list_sum(px)::BIGINT  AS pixel_sum,
       list_sum(top)::BIGINT AS top_row_sum
FROM d
"""


@register("multimodal_bmp_decode", _BMP_SQL)
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second real image codec round-trip (after PNG): synthesize genuine
    bottom-up stride-padded BMPs, decode by header parse + row re-order +
    padding strip, value-checked against the oracle computing on source
    bytes. top_row_sum pins row ORDER (the first text row must come out
    on top); pixel_sum pins padding (pad bytes are 0x00, excluded by the
    width slice). Exact integers only — same rationale as the PNG query."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_bmp_features(synth_bmp_assets(docs))


# --- audio byte-windows (tail-inclusive slicing, oracle-checked) -----------------

WIN_BYTES = 64

_AUDIO_SQL = f"""
WITH a AS (SELECT doc_id AS asset_id, text FROM documents WHERE doc_id % 3 = 1),
w AS (SELECT asset_id, text,
             unnest(range(0, CAST((length(text) + {WIN_BYTES} - 1) // {WIN_BYTES} AS BIGINT))) AS win_id
      FROM a)
SELECT asset_id, win_id,
       length(substr(text, (win_id * {WIN_BYTES} + 1)::INT, {WIN_BYTES}))::BIGINT AS win_bytes,
       md5(substr(text, (win_id * {WIN_BYTES} + 1)::INT, {WIN_BYTES}))            AS win_checksum
FROM w
"""


@register("multimodal_audio_windows", _AUDIO_SQL)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped windowing for 'audio' assets: fixed-size byte windows
    INCLUDING the partial tail — the complement of frame sampling, whose
    video semantics drop incomplete frames. ceil(n/W) windows per asset;
    the tail window's length is n mod W. Pure binary substring + md5
    expressions — exactly the slicing a real resample/feature UDF
    iterates, minus the codec; embarrassingly parallel, no shuffle."""
    a = assets(load_table(spark, sf_dir, "documents")).filter(F.col("kind") == "audio")
    n_wins = ((F.col("meta.n_bytes") + WIN_BYTES - 1) / WIN_BYTES).cast("long")
    wins = a.select(
        "asset_id",
        "payload",
        F.explode(F.sequence(F.lit(0).cast("long"), n_wins - 1)).alias("win_id"),
    )
    sliced = F.expr(f"substring(payload, win_id * {WIN_BYTES} + 1, {WIN_BYTES})")
    return wins.select(
        "asset_id",
        "win_id",
        F.length(sliced).cast("long").alias("win_bytes"),
        F.md5(sliced).alias("win_checksum"),
    )


# --- REAL audio decode: WAV (RIFF/PCM16) via the stdlib codec --------------------
#
# The container has no PIL/librosa, but Python ships a genuine WAV codec
# (`wave`): these operators run REAL encode and REAL decode — actual RIFF
# headers parsed by the standard-library parser inside executors — not the
# deterministic fake above. Payload synthesis is itself the encode side:
# each text byte becomes one signed PCM16 sample ((b - 128) << 8), mono,
# 8 kHz, so the DuckDB oracle can compute the expected waveform statistics
# from the source text while Spark must round-trip genuine WAV bytes to
# reproduce them — a decoder bug (header offset, endianness, width) breaks
# the value hash.

WAV_RATE = 8000


def synth_wav_assets(docs: DataFrame) -> DataFrame:
    """(asset_id, wav BINARY): real WAV files written by the stdlib codec
    in an Arrow-batched pass (the encode half of the codec plumbing)."""
    import io
    import wave as wave_mod

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = []
            for text in pdf["text"]:
                pcm = bytes(text, "utf-8")
                samples = b"".join(
                    int.to_bytes(((b - 128) << 8) & 0xFFFF, 2, "little")
                    for b in pcm
                )
                buf = io.BytesIO()
                with wave_mod.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_RATE)
                    w.writeframes(samples)
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "wav": payloads})

    return docs.filter(F.col("doc_id") % 3 == 1).select("doc_id", "text").mapInPandas(
        encode, schema="asset_id long, wav binary"
    )


def decode_wav_features(wav_df: DataFrame) -> DataFrame:
    """REAL decode: parse each BINARY payload with the stdlib `wave`
    parser, read the PCM frames, compute waveform statistics. Runs
    executor-side over Arrow batches; the RIFF header is genuinely
    parsed (a wrong magic/fmt chunk raises, it is not pattern-faked)."""
    import io
    import wave as wave_mod

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["wav"]):
                with wave_mod.open(io.BytesIO(bytes(payload)), "rb") as w:
                    n = w.getnframes()
                    rate = w.getframerate()
                    assert w.getnchannels() == 1 and w.getsampwidth() == 2
                    frames = w.readframes(n)
                x = np.frombuffer(frames, dtype="<i2").astype("float64")
                rows.append(
                    (
                        int(aid),
                        n,
                        rate,
                        int(np.abs(x).max()) if n else 0,
                        round(float(np.sqrt(np.mean(x * x))) if n else 0.0, 6),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "n_frames", "framerate", "peak", "rms"]
            )

    return wav_df.mapInPandas(
        decode, schema="asset_id long, n_frames long, framerate long, peak long, rms double"
    )


_WAV_SQL = f"""
WITH a AS (SELECT doc_id AS asset_id, text FROM documents WHERE doc_id % 3 = 1),
s AS (SELECT asset_id,
             list_transform(range(1, length(text) + 1),
                            i -> (ascii(substr(text, i::INT, 1)) - 128) * 256) AS samples
      FROM a)
SELECT asset_id,
       len(samples)::BIGINT AS n_frames,
       {WAV_RATE}::BIGINT   AS framerate,
       list_max(list_transform(samples, x -> abs(x)))::BIGINT AS peak,
       round(sqrt(list_avg(list_transform(samples, x -> x * x * 1.0))), 6) AS rms
FROM s
"""


@register("multimodal_wav_decode", _WAV_SQL)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL codec round-trip for audio assets: synthesize
    genuine RIFF/PCM16 WAV files (stdlib encoder), decode them with the
    stdlib `wave` parser, emit waveform stats — value-checked against the
    oracle's direct computation on the source bytes. Samples are exact
    integers (so peak and the mean-of-squares are exact on both engines;
    only the final sqrt is rounded). Two chained mapInPandas passes, no
    shuffle — the exact shape a production decode/feature stage has."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_wav_features(synth_wav_assets(docs))


# --- REAL image decode: PNG (zlib inflate + scanline unfilter) -------------------
#
# Same discipline as the WAV pair: genuine PNG files (signature, IHDR,
# CRC-checked chunks, zlib-compressed scanlines with a NON-TRIVIAL filter)
# are synthesized executor-side, then decoded by parsing the chunk stream,
# inflating IDAT, and UNFILTERING the scanlines. Synthesis writes filter
# type 2 ("Up": each byte stored as delta vs the byte above), so a decoder
# that skips unfiltering produces wrong pixels and fails the value hash —
# the decode is real work, not byte-copying.

PNG_WIDTH = 32


def synth_png_assets(docs: DataFrame) -> DataFrame:
    """(asset_id, png BINARY): real 8-bit grayscale PNGs — text bytes as
    pixels, rows of PNG_WIDTH, zero-padded tail row, Up-filtered
    scanlines, zlib-compressed, CRC'd chunks."""
    import struct
    import zlib

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        for pdf in batches:
            if pdf.empty:
                continue
            payloads = []
            for text in pdf["text"]:
                pix = bytes(text, "utf-8")
                h = (len(pix) + PNG_WIDTH - 1) // PNG_WIDTH
                pix = pix.ljust(h * PNG_WIDTH, b"\x00")
                raw = bytearray()
                prev = bytes(PNG_WIDTH)
                for r in range(h):
                    row = pix[r * PNG_WIDTH : (r + 1) * PNG_WIDTH]
                    raw.append(2)  # filter type 2: Up
                    raw.extend((row[i] - prev[i]) & 0xFF for i in range(PNG_WIDTH))
                    prev = row
                ihdr = struct.pack(">IIBBBBB", PNG_WIDTH, h, 8, 0, 0, 0, 0)
                payloads.append(
                    b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(bytes(raw)))
                    + chunk(b"IEND", b"")
                )
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "png": payloads})

    return docs.filter(F.col("doc_id") % 3 == 0).select("doc_id", "text").mapInPandas(
        encode, schema="asset_id long, png binary"
    )


def decode_png_features(png_df: DataFrame) -> DataFrame:
    """REAL decode: verify the PNG signature, walk the chunk stream with
    CRC checks, inflate IDAT, reverse the per-scanline filters (types 0
    and 2 — what the encoder emits), emit image statistics."""
    import struct
    import zlib

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["png"]):
                data = bytes(payload)
                assert data[:8] == b"\x89PNG\r\n\x1a\n", "bad PNG signature"
                pos, width, height = 8, None, None
                idat = bytearray()
                while pos < len(data):
                    (ln,) = struct.unpack(">I", data[pos : pos + 4])
                    tag = data[pos + 4 : pos + 8]
                    body = data[pos + 8 : pos + 8 + ln]
                    (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
                    assert zlib.crc32(tag + body) & 0xFFFFFFFF == crc, "CRC mismatch"
                    if tag == b"IHDR":
                        width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
                        assert depth == 8 and ctype == 0, "not 8-bit grayscale"
                    elif tag == b"IDAT":
                        idat.extend(body)
                    elif tag == b"IEND":
                        break
                    pos += 12 + ln
                assert width is not None, "missing IHDR chunk"
                if height == 0:
                    # zero-height PNG (empty source text): no scanlines to
                    # unfilter; match the oracle's aggregates over an empty
                    # pixel list (list_max/list_sum of [] are NULL, 0 pixels)
                    rows.append((int(aid), int(width), 0, None, None, 0))
                    continue
                raw = zlib.decompress(bytes(idat))
                stride = width + 1
                prev = np.zeros(width, dtype=np.uint8)
                pixels = []
                for r in range(height):
                    line = raw[r * stride : (r + 1) * stride]
                    ftype, row = line[0], np.frombuffer(line[1:], dtype=np.uint8)
                    if ftype == 2:  # Up
                        row = (row + prev).astype(np.uint8)
                    elif ftype != 0:
                        raise ValueError(f"unsupported filter {ftype}")
                    pixels.append(row)
                    prev = row
                img = np.stack(pixels).astype("int64")
                rows.append(
                    (
                        int(aid),
                        int(width),
                        int(height),
                        int(img.max()),
                        int(img.sum()),
                        int(img.size),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height", "max_pixel", "pixel_sum", "n_pixels"],
            ).astype({"max_pixel": "Int64", "pixel_sum": "Int64"})

    return png_df.mapInPandas(
        decode,
        schema="asset_id long, width long, height long, max_pixel long, "
        "pixel_sum long, n_pixels long",
    )


_PNG_SQL = f"""
WITH a AS (SELECT doc_id AS asset_id, text FROM documents WHERE doc_id % 3 = 0),
d AS (SELECT asset_id,
             length(text) AS n,
             CAST((length(text) + {PNG_WIDTH} - 1) // {PNG_WIDTH} AS BIGINT) AS height,
             list_transform(range(1, length(text) + 1),
                            i -> ascii(substr(text, i::INT, 1))) AS px
      FROM a)
SELECT asset_id,
       {PNG_WIDTH}::BIGINT AS width,
       height,
       list_max(px)::BIGINT  AS max_pixel,
       list_sum(px)::BIGINT  AS pixel_sum,
       (height * {PNG_WIDTH})::BIGINT AS n_pixels
FROM d
"""


@register("multimodal_png_decode", _PNG_SQL)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL image codec round-trip: synthesize genuine PNGs
    (Up-filtered scanlines, CRC'd chunks), decode by chunk-walking +
    zlib-inflating + unfiltering, emit image stats — value-checked
    against the oracle computing directly on the source bytes (zero-pad
    semantics included: pixel_sum/n_pixels cover height*width pixels).
    All outputs are EXACT integers — a mean would sit on power-of-two
    rounding midpoints (sum / h*32) where the engines' half-up vs
    half-even disagree; (pixel_sum, n_pixels) cannot. Padding bytes are
    0x00, so max_pixel is unaffected (text is printable ASCII > 0)."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_png_features(synth_png_assets(docs))


# --- image average-hash (perceptual fingerprint) -----------------------------
#
# aHash is the standard first-pass image near-dup fingerprint: decode →
# nearest-neighbor resize to 8×8 → each bit = pixel above the tile mean.
# Two images whose hashes sit within a small Hamming distance are
# near-duplicate candidates — the image-side analog of SimHash over text,
# and it composes with the same banded/bucketed machinery (knn_hamming_topk
# already searches packed sign bits with bit_count(xor) in codegen).
#
# Because our BMP assets' pixels ARE the document's text bytes, DuckDB can
# reproduce the nearest-neighbor index arithmetic and the exact bit
# packing — a FULL value oracle over a real decode → resize → threshold
# pipeline (the comparison that PIL-style codecs can never carry here).
# The mean comparison is done as 64·pixel > sum so both engines stay in
# exact integer arithmetic.


def image_ahash(bmp_df: DataFrame) -> DataFrame:
    """(asset_id, hash_lo, hash_hi, n_set): 64-bit aHash split into two
    uint32-valued longs (bit 63 would overflow a signed BIGINT in either
    engine), plus the popcount. Real byte-level decode: header parse,
    stride honor, bottom-up un-flip — then an 8×8 nearest-neighbor sample
    (row r → source row ⌊r·h/8⌋, col c → ⌊c·W/8⌋) and the above-mean
    threshold."""
    import struct

    import numpy as np

    def hash_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["bmp"]):
                data = bytes(payload)
                magic, _fs, _r1, _r2, offbits = struct.unpack("<2sIHHI", data[:14])
                assert magic == b"BM", "bad BMP signature"
                _hs, width, height, _pl, bpp, comp = struct.unpack(
                    "<IiiHHI", data[14:34]
                )
                assert bpp == 8 and comp == 0, "not uncompressed 8bpp"
                if height == 0:
                    # zero-pixel image has no meaningful hash; DROP it —
                    # the oracle's WHERE h > 0 does the same, and emitting
                    # an all-zero hash would make every empty image a
                    # "near-dup" of every other in the Hamming join
                    continue
                stride = (width + 3) & ~3
                arr = np.frombuffer(
                    data, dtype=np.uint8, count=stride * height, offset=offbits
                ).reshape(height, stride)
                img = arr[::-1, :width].astype("int64")
                ridx = (np.arange(8) * height) // 8
                cidx = (np.arange(8) * width) // 8
                sub = img[np.ix_(ridx, cidx)]
                total = int(sub.sum())
                bits = (sub.ravel() * 64) > total  # row-major: i = 8r + c
                lo = sum(1 << i for i in range(32) if bits[i])
                hi = sum(1 << i for i in range(32) if bits[32 + i])
                rows.append((int(aid), int(lo), int(hi), int(bits.sum())))
            yield pd.DataFrame(
                rows, columns=["asset_id", "hash_lo", "hash_hi", "n_set"]
            )

    return bmp_df.mapInPandas(
        hash_iter, schema="asset_id long, hash_lo long, hash_hi long, n_set long"
    )


_AHASH_IDX = f"(((i // 8) * h) // 8) * {BMP_WIDTH} + (((i % 8) * {BMP_WIDTH}) // 8) + 1"

_AHASH_SQL = f"""
WITH a AS (SELECT doc_id AS asset_id, text FROM documents WHERE doc_id % 3 = 2),
d AS (SELECT asset_id, length(text) AS n,
             CAST((length(text) + {BMP_WIDTH} - 1) // {BMP_WIDTH} AS BIGINT) AS h,
             text
      FROM a),
s AS (SELECT asset_id,
             list_transform(range(0, 64),
               i -> CASE WHEN {_AHASH_IDX} <= n
                         THEN ascii(substr(text, ({_AHASH_IDX})::INT, 1))
                         ELSE 0 END) AS px
      FROM d WHERE h > 0),
b AS (SELECT asset_id, px, list_sum(px) AS total FROM s)
SELECT asset_id,
       list_sum(list_transform(range(0, 32),
         i -> CASE WHEN px[i + 1] * 64 > total THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS hash_lo,
       list_sum(list_transform(range(0, 32),
         i -> CASE WHEN px[i + 33] * 64 > total THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS hash_hi,
       len(list_filter(px, p -> p * 64 > total))::BIGINT AS n_set
FROM b
"""


@register("multimodal_image_ahash", _AHASH_SQL)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aHash fingerprints over the synthesized BMP corpus — decode →
    8×8 nearest-neighbor resize → above-mean bits, value-checked against
    DuckDB reproducing the same index arithmetic on the source text
    bytes. Feed the two packed words into the Hamming machinery
    (knn_hamming_topk's bit_count(xor) plan) for image near-dup search."""
    docs = load_table(spark, sf_dir, "documents")
    return image_ahash(synth_bmp_assets(docs))


_IMG_NEARDUP_SQL = f"""
WITH h AS ({_AHASH_SQL.strip()})
SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,
       (bit_count(xor(a.hash_lo, b.hash_lo))
        + bit_count(xor(a.hash_hi, b.hash_hi)))::BIGINT AS hamming
FROM h a JOIN h b ON a.asset_id < b.asset_id
WHERE bit_count(xor(a.hash_lo, b.hash_lo))
      + bit_count(xor(a.hash_hi, b.hash_hi)) <= 1
"""


@register("multimodal_image_neardup", _IMG_NEARDUP_SQL)
def multimodal_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup candidates: aHash pairs within Hamming distance 1.
    The pair search is BANDED, not quadratic — distance ≤ 1 over a hash
    split into two words means AT LEAST ONE word is identical
    (pigeonhole), so two equi-joins on the word values find every
    qualifying pair and the filter only rescreens band collisions with
    codegen bit_count(xor). The oracle runs the plain quadratic
    formulation — same answer, which is exactly the losslessness claim.
    At 100 TB the equi-joins are shuffle-on-32-bit-key joins whose
    candidate sets are hash-collision-sized, the same shape as
    dedup_simhash's banding."""
    docs = load_table(spark, sf_dir, "documents")
    h = image_ahash(synth_bmp_assets(docs)).select("asset_id", "hash_lo", "hash_hi")
    ha = h.select(
        F.col("asset_id").alias("asset_a"),
        F.col("hash_lo").alias("lo_a"),
        F.col("hash_hi").alias("hi_a"),
    )
    hb = h.select(
        F.col("asset_id").alias("asset_b"),
        F.col("hash_lo").alias("lo_b"),
        F.col("hash_hi").alias("hi_b"),
    )
    j_lo = ha.join(hb, (F.col("lo_a") == F.col("lo_b")) & (F.col("asset_a") < F.col("asset_b")))
    j_hi = ha.join(hb, (F.col("hi_a") == F.col("hi_b")) & (F.col("asset_a") < F.col("asset_b")))
    cand = j_lo.unionByName(j_hi).distinct()
    ham = F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))) + F.bit_count(
        F.col("hi_a").bitwiseXOR(F.col("hi_b"))
    )
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= 1)
        .select("asset_a", "asset_b", "hamming")
    )


# --- audio fingerprint + near-dup (Haitsma–Kalker-style energy deltas) --------
#
# The audio twin of the image aHash/near-dup pair: decode the WAV PCM,
# split into AUDIO_FP_WINDOWS equal windows, per-window ENERGY = Σx²
# (exact integers — samples are (byte-128)·256, squares fit int64), one
# bit per adjacent-window energy comparison (the robust-hash idea of
# Haitsma & Kalker's "A Highly Robust Audio Fingerprinting System",
# ISMIR 2002, reduced to one band so every step stays integer-exact and
# the WHOLE fingerprint is value-checkable in SQL). A seeded subset of
# assets gets an exact twin (same payload, offset id) so the near-dup
# join is provably non-vacuous on the fixture; natural near-misses ride
# along.

AUDIO_FP_WINDOWS = 16
AUDIO_TWIN_MOD = 7
AUDIO_TWIN_OFFSET = 1_000_000_000


def wav_assets_with_twins(docs: DataFrame) -> DataFrame:
    base = synth_wav_assets(docs)
    twins = base.filter(F.col("asset_id") % AUDIO_TWIN_MOD == 1).select(
        (F.col("asset_id") + AUDIO_TWIN_OFFSET).alias("asset_id"), "wav"
    )
    return base.unionByName(twins)


def audio_fingerprint(wav_df: DataFrame) -> DataFrame:
    """(asset_id, fp, fp_lo, fp_hi): 15-bit energy-delta fingerprint from
    a REAL stdlib-wave decode — bit i set iff window i's energy exceeds
    window i+1's. fp_lo/fp_hi split the fingerprint for the lossless
    Hamming≤1 banding (pigeonhole: one differing bit lives in one half)."""
    import io
    import wave as wave_mod

    import numpy as np

    W = AUDIO_FP_WINDOWS

    def fp_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["wav"]):
                with wave_mod.open(io.BytesIO(bytes(payload)), "rb") as w:
                    frames = w.readframes(w.getnframes())
                x = np.frombuffer(frames, dtype="<i2").astype("int64")
                n = len(x)
                en = [
                    int((x[(wi * n) // W : ((wi + 1) * n) // W] ** 2).sum())
                    for wi in range(W)
                ]
                fp = sum((1 << i) for i in range(W - 1) if en[i] > en[i + 1])
                rows.append((int(aid), fp, fp & 255, fp >> 8))
            yield pd.DataFrame(
                rows, columns=["asset_id", "fp", "fp_lo", "fp_hi"]
            )

    return wav_df.mapInPandas(
        fp_iter, schema="asset_id long, fp long, fp_lo long, fp_hi long"
    )


_AUDIO_FP_SQL = f"""
WITH a AS (
  SELECT doc_id AS asset_id, text FROM documents WHERE doc_id % 3 = 1
  UNION ALL
  SELECT doc_id + {AUDIO_TWIN_OFFSET}, text FROM documents
  WHERE doc_id % 3 = 1 AND doc_id % {AUDIO_TWIN_MOD} = 1),
s AS (SELECT asset_id,
             list_transform(range(1, length(text) + 1),
                            i -> (ascii(substr(text, i::INT, 1)) - 128) * 256) AS samples,
             length(text) AS n
      FROM a),
e AS (SELECT asset_id,
             list_transform(range(0, {AUDIO_FP_WINDOWS}), wi ->
               coalesce(list_sum(list_transform(
                 samples[(wi * n) // {AUDIO_FP_WINDOWS} + 1 : ((wi + 1) * n) // {AUDIO_FP_WINDOWS}],
                 x -> (x * x)::BIGINT)), 0)) AS en
      FROM s),
f AS (SELECT asset_id,
             list_sum(list_transform(range(0, {AUDIO_FP_WINDOWS - 1}), i ->
               CASE WHEN en[i + 1] > en[i + 2] THEN (1 << i)::BIGINT
                    ELSE 0::BIGINT END))::BIGINT AS fp
      FROM e)
SELECT asset_id, fp, (fp % 256)::BIGINT AS fp_lo, (fp // 256)::BIGINT AS fp_hi
FROM f
"""


@register("multimodal_audio_fingerprint", _AUDIO_FP_SQL)
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprints over real WAV decodes, FULL value oracle: every
    step is exact integer arithmetic (PCM samples → window energies →
    comparison bits), so DuckDB reproduces the fingerprint bit for bit
    from the source text. Zero-shuffle codec pass, same plan shape as
    multimodal_wav_decode."""
    docs = load_table(spark, sf_dir, "documents")
    return audio_fingerprint(wav_assets_with_twins(docs))


_AUDIO_NEARDUP_SQL = f"""
WITH h AS ({_AUDIO_FP_SQL.strip()})
SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,
       bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
FROM h a JOIN h b ON a.asset_id < b.asset_id
WHERE bit_count(xor(a.fp, b.fp)) <= 1
"""


@register("multimodal_audio_neardup", _AUDIO_NEARDUP_SQL)
def multimodal_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs at Hamming ≤ 1 via the same LOSSLESS two-band
    equi-join as multimodal_image_neardup (pigeonhole over fp_lo/fp_hi);
    the oracle runs the quadratic formulation — an identical answer
    proves the banding drops nothing. The seeded exact twins guarantee
    the join is non-vacuous; the check is the VALUE match, not mere
    non-emptiness."""
    docs = load_table(spark, sf_dir, "documents")
    h = audio_fingerprint(wav_assets_with_twins(docs)).select(
        "asset_id", "fp", "fp_lo", "fp_hi"
    )
    ha = h.select(
        F.col("asset_id").alias("asset_a"),
        F.col("fp").alias("fp_a"),
        F.col("fp_lo").alias("lo_a"),
        F.col("fp_hi").alias("hi_a"),
    )
    hb = h.select(
        F.col("asset_id").alias("asset_b"),
        F.col("fp").alias("fp_b"),
        F.col("fp_lo").alias("lo_b"),
        F.col("fp_hi").alias("hi_b"),
    )
    j_lo = ha.join(
        hb, (F.col("lo_a") == F.col("lo_b")) & (F.col("asset_a") < F.col("asset_b"))
    )
    j_hi = ha.join(
        hb, (F.col("hi_a") == F.col("hi_b")) & (F.col("asset_a") < F.col("asset_b"))
    )
    cand = j_lo.unionByName(j_hi).select("asset_a", "asset_b", "fp_a", "fp_b").distinct()
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= 1)
        .select("asset_a", "asset_b", "hamming")
    )
