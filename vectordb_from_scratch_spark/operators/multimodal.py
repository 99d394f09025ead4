"""Multimodal column plumbing — image/audio/video as opaque BINARY columns
with typed metadata (north-star extension; no reference analog).

The container has no image/audio libraries, so the DECODE step is stubbed
two ways (both clearly marked):
- a deterministic fake decoder (``fake_decode_features``) that parses real
  bytes with real Arrow/mapInPandas plumbing — schema, batching, partition
  behavior are all production-shaped and tested;
- a real-decoder integration point (``decode_image``) gated behind an
  import-try that raises ``NotImplementedError`` with instructions.

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


# --- real-decoder integration point -------------------------------------------------


def decode_image(asset_df: DataFrame) -> DataFrame:
    """Real image decode — NOT IMPLEMENTED in this container (no PIL/cv2).

    Integration contract: swap ``_decode_real`` into the same mapInPandas
    slot as ``fake_decode_features`` — identical schema and batching. Kept
    as an explicit stub so the Spark-side plumbing is the tested part.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires pillow, which is not available in this "
            "environment; use fake_decode_features for the plumbing-equivalent "
            "deterministic path"
        ) from exc
    raise NotImplementedError("real decoder wiring reserved for an environment with codecs")


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
