"""Streaming ingest into the catalog: effectively-once via upsert.

Contract under test:
- a file-source stream of (id, text) rows drains into a library through
  foreachBatch → embed → ``upsert_chunks``; the final catalog state
  equals a one-shot batch ingest of the same rows (stream == batch);
- replaying a micro-batch (simulated redelivery after failure recovery)
  changes nothing — the upsert sink makes at-least-once delivery
  effectively-once;
- upsert replaces existing ids (and keeps the ANN sidecar exact through
  the index delta) instead of duplicating or conflicting.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from vectordb_from_scratch_spark import streaming
from vectordb_from_scratch_spark.catalog import VectorCatalog
from vectordb_from_scratch_spark.functions.embedder import embed_texts

DIMS = 8
SCHEMA = T.StructType(
    [T.StructField("id", T.StringType()), T.StructField("text", T.StringType())]
)


def _write_src(src_dir, n_files=3, per_file=5):
    rows = []
    for f in range(n_files):
        ids = [f"s{f:02d}-{i}" for i in range(per_file)]
        texts = [f"stream doc {f} item {i} about topic {i % 3}" for i in range(per_file)]
        pq.write_table(
            pa.table({"id": ids, "text": texts}), str(src_dir / f"batch{f:02d}.parquet")
        )
        rows += list(zip(ids, texts))
    return rows


@pytest.fixture()
def cat(spark, tmp_path):
    return VectorCatalog(spark, str(tmp_path / "cat"))


def _chunk_state(cat, lib_id):
    return sorted(
        (r["id"], r["text"], tuple(round(float(x), 6) for x in r["embedding"]))
        for r in cat.chunks.read().filter(f"library_id = '{lib_id}'").collect()
    )


def test_stream_ingest_equals_batch_and_replay_is_idempotent(spark, tmp_path, cat):
    src = tmp_path / "src"
    src.mkdir()
    rows = _write_src(src)
    lib = cat.create_library("streamed", DIMS)
    doc = cat.create_document(lib, "d1")

    streaming.catalog_ingest_stream(
        spark, str(src), SCHEMA, cat, lib, doc, str(tmp_path / "ckpt"), dims=DIMS
    )
    streamed = _chunk_state(cat, lib)
    assert len(streamed) == len(rows)

    # batch twin: same rows through add_chunks into a second library
    lib_b = cat.create_library("batched", DIMS)
    doc_b = cat.create_document(lib_b, "d1")
    df = spark.createDataFrame(rows, SCHEMA)
    emb = embed_texts(df, text_col="text", dims=DIMS).collect()
    cat.add_chunks(
        lib_b,
        doc_b,
        [{"text": r["text"], "embedding": list(r["embedding"])} for r in emb],
        ids=[r["id"] for r in emb],
    )
    batched = _chunk_state(cat, lib_b)
    assert [(i, t, e) for i, t, e in streamed] == [(i, t, e) for i, t, e in batched]

    # redelivery: re-run the whole stream with a FRESH checkpoint (every
    # batch redelivered) — the upsert sink must leave the state unchanged
    streaming.catalog_ingest_stream(
        spark, str(src), SCHEMA, cat, lib, doc, str(tmp_path / "ckpt2"), dims=DIMS
    )
    assert _chunk_state(cat, lib) == streamed


def test_upsert_replaces_and_keeps_index_exact(spark, cat):
    import numpy as np

    lib = cat.create_library("ups", DIMS, index_type="ivf")
    doc = cat.create_document(lib, "d1")
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((24, DIMS)).astype("float32")
    cat.add_chunks(
        lib,
        doc,
        [{"text": f"c{i}", "embedding": vecs[i].tolist()} for i in range(24)],
        ids=[f"c{i:02d}" for i in range(24)],
    )
    # replace c00 with a brand-new vector via upsert (no conflict raised)
    newv = rng.standard_normal(DIMS).astype("float32")
    cat.upsert_chunks(
        lib, doc, [{"text": "c0-new", "embedding": newv.tolist()}], ids=["c00"]
    )
    assert cat.library_stats(lib)["num_chunks"] == 24
    hits = cat.search(lib, newv.tolist(), k=1)
    assert hits[0].chunk_id == "c00"
    # the old vector no longer matches its former position
    assert cat.get_chunk(lib, "c00")["text"] == "c0-new"


def test_streamed_ingest_maintains_hybrid_lexical_sidecar(spark, tmp_path, cat):
    """The lexical (BM25) sidecar rides the same upsert delta as the ANN
    sidecars, so a built sidecar stays correct under streamed ingest:
    after the stream drains, hybrid search finds the streamed chunk with
    the highest tf of the query term — and the result equals a hybrid
    search over a library whose sidecar was built AFTER the ingest (delta
    path == rebuild path)."""
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "id": ["pre-0", "pre-1"],
                "text": ["alpha beta gamma", "beta gamma delta"],
            }
        ),
        str(src / "b0.parquet"),
    )
    lib = cat.create_library("hyb-stream", DIMS)
    doc = cat.create_document(lib, "d1")
    streaming.catalog_ingest_stream(
        spark, str(src), SCHEMA, cat, lib, doc, str(tmp_path / "ck1"), dims=DIMS
    )
    # build the sidecar on the initial corpus
    base = cat.search_hybrid(lib, "gamma", k=2)
    assert {r.chunk_id for r in base} == {"pre-0", "pre-1"}

    # stream a second wave; the delta must absorb it (no manual rebuild)
    pq.write_table(
        pa.table({"id": ["new-0"], "text": ["gamma gamma gamma focus"]}),
        str(src / "b1.parquet"),
    )
    streaming.catalog_ingest_stream(
        spark, str(src), SCHEMA, cat, lib, doc, str(tmp_path / "ck2"), dims=DIMS
    )
    after = cat.search_hybrid(lib, "gamma", k=3)
    assert "new-0" in {r.chunk_id for r in after}

    # delta path == rebuild path: a twin library ingested in one shot,
    # sidecar built fresh, must fuse to the same ranking
    lib_b = cat.create_library("hyb-batch", DIMS)
    doc_b = cat.create_document(lib_b, "d1")
    rows = [
        ("pre-0", "alpha beta gamma"),
        ("pre-1", "beta gamma delta"),
        ("new-0", "gamma gamma gamma focus"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    emb = embed_texts(df, text_col="text", dims=DIMS).collect()
    cat.add_chunks(
        lib_b,
        doc_b,
        [{"text": r["text"], "embedding": list(r["embedding"])} for r in emb],
        ids=[r["id"] for r in emb],
    )
    fresh = cat.search_hybrid(lib_b, "gamma", k=3)
    assert [(r.chunk_id, r.similarity_score) for r in after] == [
        (r.chunk_id, r.similarity_score) for r in fresh
    ]
