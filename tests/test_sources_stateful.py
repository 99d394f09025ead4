"""Sources round-trips (parquet/CSV/JSON/ORC, typed at the boundary) and the
custom stateful streaming operator (state carried across micro-batches)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vectordb_from_scratch_spark import sources, streaming
from vectordb_from_scratch_spark.session import load_table


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip_preserves_rows_and_types(spark, sf_small, tmp_path, fmt):
    orig = load_table(spark, sf_small, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    sources.write(orig, path, fmt=fmt)
    back = sources.read(spark, path, fmt=fmt, schema=orig.schema)
    assert back.schema == orig.schema  # CSV/JSON types survive via declared schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))


def test_csv_without_schema_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        sources.read(spark, str(tmp_path), fmt="csv")


def test_orc_self_describing_read(spark, sf_small, tmp_path):
    """ORC, like parquet, carries its schema — no declared schema needed."""
    orig = load_table(spark, sf_small, "region")
    path = str(tmp_path / "region_orc")
    sources.write(orig, path, fmt="orc")
    back = sources.read(spark, path, fmt="orc")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))
    with pytest.raises(ValueError, match="unknown format"):
        sources.read(spark, str(tmp_path), fmt="avro")


def test_partitioned_write_prunes(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events").withColumn(
        "ts", F.unix_micros("ts")
    )  # plain long for a clean round-trip
    path = str(tmp_path / "events_by_type")
    sources.write(ev, path, partition_by="event_type")
    from vectordb_from_scratch_spark import plans

    one = sources.read(spark, path).filter(F.col("event_type") == "click")
    # partition filter never reaches the row groups — it prunes directories
    assert "PartitionFilters" in plans.physical_plan(one)
    assert one.count() == ev.filter(F.col("event_type") == "click").count()


def test_stateful_running_totals_across_microbatches(spark, sf_small, tmp_path):
    """applyInPandasWithState must accumulate across micro-batches: split
    the events into 4 files -> 4 micro-batches, final per-user state must
    equal the batch groupBy."""
    ev = load_table(spark, sf_small, "events")
    src = str(tmp_path / "ev_stream")
    ev.withColumn("ts", F.unix_micros("ts")).repartition(4).write.parquet(src)

    schema = "event_id long, ts long, user_id long, event_type string, value double, props string"
    stream = sources.read_stream(spark, src, schema=spark.read.parquet(src).schema)
    out = streaming.running_user_totals_stream(stream)
    streaming.run_stream_to_memory(out, "t_running_totals", output_mode="update")

    # update-mode sink holds every intermediate emit; counts are monotone so
    # the per-user max IS the final state
    final = (
        spark.table("t_running_totals")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max(F.round("total_value", 6)).alias("v"))
    )
    expected = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("v")
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, expected.collect()))
    # and it genuinely ran more than one micro-batch per user somewhere
    n_updates = spark.table("t_running_totals").groupBy("user_id").count()
    assert n_updates.agg(F.max("count")).first()[0] > 1


def test_streaming_embed_ingest_matches_batch(spark, sf_small, tmp_path):
    """Stream → embed → parquet sink must produce the same vectors as the
    batch embed over the same documents (C8/C9 ingest as a flow)."""
    import numpy as np

    from vectordb_from_scratch_spark.functions.embedder import embed_texts

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.parquet(src)

    sink = str(tmp_path / "embedded")
    streaming.embed_ingest_stream(
        spark,
        src,
        schema=spark.read.parquet(src).schema,
        sink_dir=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        dims=16,
    )
    got = {r["doc_id"]: np.array(r["embedding"]) for r in spark.read.parquet(sink).collect()}
    exp = {r["doc_id"]: np.array(r["embedding"]) for r in embed_texts(docs, dims=16).collect()}
    assert set(got) == set(exp) and len(got) == docs.count()
    assert all(np.allclose(got[k], exp[k]) for k in got)


def test_catalog_text_search(spark, tmp_path):
    """C14: text query embedded with the same provider as ingest finds its
    own chunk first."""
    from vectordb_from_scratch_spark.catalog import VectorCatalog
    from vectordb_from_scratch_spark.functions.embedder import hashed_embedder

    cat = VectorCatalog(spark, str(tmp_path))
    lib = cat.create_library("textlib", 16)
    doc = cat.create_document(lib, "d")
    texts = [f"document number {i} about topic {i % 5} with extra words" for i in range(30)]
    embed = hashed_embedder(dims=16)
    items = [
        {"text": t, "embedding": embed([t])[0].tolist()} for t in texts
    ]
    ids = cat.add_chunks(lib, doc, items, ids=[f"c{i}" for i in range(30)])
    res = cat.search_text(lib, texts[7], k=3, include_chunk=True)
    assert res[0].chunk_id == ids[7]
    assert res[0].chunk["text"] == texts[7]


def test_streaming_knn_matches_batch(spark, sf_small, tmp_path):
    """Micro-batch k-NN over a query stream must equal the one-shot batch
    answer for the same queries."""
    import shutil

    from vectordb_from_scratch_spark.operators.knn import topk_pandas

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    qsrc = str(tmp_path / "qstream")
    queries.repartition(3).write.parquet(qsrc)  # 3 files -> 3 micro-batches

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS t_knn_stream")
    shutil.rmtree(f"{warehouse}/t_knn_stream", ignore_errors=True)
    streaming.knn_query_stream(
        emb, qsrc, spark.read.parquet(qsrc).schema, "t_knn_stream", k=5
    )
    got = sorted(
        (r["query_id"], r["vec_id"], r["rank"]) for r in spark.table("t_knn_stream").collect()
    )
    exp = sorted(
        (r["query_id"], r["vec_id"], r["rank"])
        for r in topk_pandas(emb, queries.toPandas(), k=5).collect()
    )
    assert got == exp and len(got) == 6 * 5


def test_streaming_mg_candidates_keep_every_heavy_hitter(spark, sf_small, tmp_path):
    """Streaming Misra-Gries: after draining the token stream in 4
    micro-batches, the union of final bucket summaries must contain every
    token whose TOTAL frequency exceeds n/HH_THRESHOLD_K — the batch
    operator's superset guarantee carried across incremental state."""
    from vectordb_from_scratch_spark.functions import texthash
    from vectordb_from_scratch_spark.operators import sketches

    docs = load_table(spark, sf_small, "documents")
    toks = docs.select(F.explode(texthash.words("text")).alias("w"))
    src = str(tmp_path / "tok_stream")
    toks.repartition(4).write.parquet(src)

    stream = sources.read_stream(spark, src, schema=spark.read.parquet(src).schema)
    out = streaming.heavy_hitter_candidates_stream(stream)
    streaming.run_stream_to_memory(out, "t_mg_stream", output_mode="update")

    sunk = spark.table("t_mg_stream")
    rows = sunk.collect()  # sketch-sized: buckets × state_k × versions
    last_ver: dict = {}
    for r in rows:
        last_ver[r["bucket"]] = max(last_ver.get(r["bucket"], 0), r["ver"])
    cands = {r["w"] for r in rows if r["ver"] == last_ver[r["bucket"]]}
    final_counts: dict = {}
    for r in rows:
        if r["ver"] == last_ver[r["bucket"]]:
            final_counts[r["bucket"]] = final_counts.get(r["bucket"], 0) + 1

    exact = {
        r["w"]: r["c"]
        for r in toks.groupBy("w").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(exact.values())
    truth = {w for w, c in exact.items() if c * sketches.HH_THRESHOLD_K > n}
    assert truth, "fixture must have heavy hitters"
    assert truth <= cands
    # bounded state: every bucket's final summary respects the cap
    assert all(c <= sketches.HH_STATE_K for c in final_counts.values())
    # and the stream really ran multiple micro-batches
    assert max(last_ver.values()) > 1


def test_streaming_histogram_register_identical_to_batch(spark, sf_small, tmp_path):
    """The streaming histogram's final (event_type, bin) counts must
    equal the batch histogram built with the SAME edges — sketch merge
    is addition, so micro-batch accumulation is exact, not approximate."""
    from vectordb_from_scratch_spark.operators.sketches import HIST_BINS

    ev = load_table(spark, sf_small, "events")
    edges = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    src = str(tmp_path / "hist_stream")
    ev.select("event_type", "value").repartition(4).write.parquet(src)
    stream = sources.read_stream(spark, src, schema=spark.read.parquet(src).schema)
    out = streaming.histogram_bins_stream(stream, edges)
    streaming.run_stream_to_memory(out, "t_hist_stream", output_mode="complete")

    got = {
        (r["event_type"], r["bin"]): r["c"]
        for r in spark.table("t_hist_stream").collect()
    }
    want = {
        (r["event_type"], r["bin"]): r["c"]
        for r in streaming.histogram_bins_stream(
            ev.select("event_type", "value"), edges
        ).collect()
    }
    assert got == want and len(want) > 50
    # bounded state: at most types x HIST_BINS rows
    n_types = edges.count()
    assert len(got) <= n_types * HIST_BINS


def test_streaming_ewma_matches_batch_fold(spark, sf_small, tmp_path):
    """The order-sensitive recurrence twin: four time-quartile files
    arrive as four in-order micro-batches; the final per-user streaming
    state must equal the batch higher-order fold EXACTLY (same alpha,
    same (ts, event_id) order, bitwise-equal arithmetic)."""
    import time

    from vectordb_from_scratch_spark import registry

    ev = load_table(spark, sf_small, "events").orderBy("ts", "event_id")
    src = tmp_path / "ev_ewma"
    src.mkdir()
    pdf = ev.toPandas()
    quarter = len(pdf) // 4 + 1
    for i in range(4):
        chunk = pdf.iloc[i * quarter : (i + 1) * quarter]
        if not chunk.empty:
            chunk.to_parquet(str(src / f"q{i}.parquet"))
            time.sleep(0.05)  # distinct mtimes → in-order micro-batches

    stream = sources.read_stream(
        spark, str(src), schema=spark.read.parquet(str(src)).schema
    )
    out = streaming.ewma_by_user_stream(stream)
    streaming.run_stream_to_memory(out, "t_ewma", output_mode="update")

    final = (
        spark.table("t_ewma")
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        )
        .filter(F.col("_r") == 1)
        .select("user_id", "n_events", "ewma")
    )
    expected = registry.QUERIES["events_ewma_by_user"](spark, sf_small)
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, expected.collect())
    )
