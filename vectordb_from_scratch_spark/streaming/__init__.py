"""Structured Streaming twins of the batch event operators.

The reference is strictly request/response (no streaming, SURVEY.md §2.3);
these are the north-star extensions, built so that STREAM and BATCH share
the same expressions: in Spark, a windowed aggregation over a static frame
and over a stream are the same logical plan — the tests assert exactly that
equivalence (availableNow trigger → memory sink vs. the batch run).

Operators:
- tumbling window counts with a watermark (late-data bound)
- session windows via F.session_window (gap-merge semantics; note the
  half-open boundary: a gap of EXACTLY the session timeout starts a new
  session here, while the batch lag-based formulation in operators/events
  keeps it — irrelevant off the razor's edge, documented here)
- per-user running stats via the same groupBy shapes

At scale: streaming state lives in the state store keyed by (window,
group) — the watermark bounds it; sessionization state is per active user
session. Both shapes run unchanged on a real cluster with a Kafka source —
only ``readStream`` options change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import normalize_event_ts

SESSION_GAP = "30 minutes"


def read_events_stream(
    spark: SparkSession, sf_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch under availableNow). Swapping in Kafka changes only this
    function.

    The stream schema comes from the batch footer read, so whatever shape
    ``events.ts`` ships in (bigint nanos under nanosAsLong, TIMESTAMP_NTZ
    for plain timestamp[us]) the raw stream matches it, and
    ``normalize_event_ts`` converts to the canonical LTZ event time."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    raw_schema = spark.read.parquet(f"{sf_dir}/{glob}").schema
    raw = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", glob)  # file source needs a dir
        .parquet(sf_dir)
    )
    return normalize_event_ts(raw)


def tumbling_counts(events: DataFrame, with_watermark: bool = True) -> DataFrame:
    """1-hour tumbling counts — IDENTICAL expression tree for batch and
    stream input; the watermark only bounds streaming state."""
    if with_watermark:
        events = events.withWatermark("ts", "2 hours")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def session_windows(events: DataFrame, with_watermark: bool = True) -> DataFrame:
    """Gap-based sessions via F.session_window — the built-in stateful
    session operator (the applyInPandasWithState escape hatch is only needed
    for custom session logic, e.g. cross-field termination rules)."""
    if with_watermark:
        events = events.withWatermark("ts", "2 hours")
    return (
        events.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def embed_ingest_stream(
    spark: SparkSession,
    src_dir: str,
    schema: StructType,
    sink_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    dims: int = 16,
) -> None:
    """Streaming ingest pipeline (the C8/C9 batch-create loop as a
    continuous flow): file-source stream → executor-side embedding
    (V18 mapInPandas, provider-pluggable) → parquet sink with exactly-once
    file-sink semantics via the checkpoint. availableNow drains the
    backlog then stops — the same code runs unbounded with a Kafka
    source."""
    from vectordb_from_scratch_spark import sources
    from vectordb_from_scratch_spark.functions.embedder import embed_texts

    stream = sources.read_stream(spark, src_dir, schema=schema)
    embedded = embed_texts(stream, text_col=text_col, dims=dims)
    q = (
        embedded.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def catalog_ingest_stream(
    spark: SparkSession,
    src_dir: str,
    schema: StructType,
    catalog,
    lib_id: str,
    doc_id: str,
    checkpoint_dir: str,
    dims: int = 8,
) -> None:
    """End-to-end streaming ingest INTO THE CATALOG: file-source stream of
    (id, text) rows → executor-side embedding (V18 mapInPandas) → an
    idempotent ``upsert_chunks`` MERGE per micro-batch — the reference's
    REST-call-per-chunk ingest loop (app/api/routes/chunks.py:43-70) as a
    continuous, replay-safe flow.

    Exactly-once story: the file sink's checkpoint gives at-least-once
    batch delivery on failure recovery; the sink being an UPSERT keyed on
    chunk id makes redelivery idempotent, so the composition is
    effectively-once — the standard foreachBatch discipline for
    transactional stores. The per-batch collect is bounded by
    maxFilesPerTrigger (this is the SERVING store's ingest path, sized
    like the reference's request loop, not a bulk-load path — bulk loads
    go through ``add_chunks`` straight from a DataFrame)."""
    from vectordb_from_scratch_spark import sources
    from vectordb_from_scratch_spark.functions.embedder import embed_texts

    stream = sources.read_stream(spark, src_dir, schema=schema)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        rows = embed_texts(batch_df, text_col="text", dims=dims).collect()
        if not rows:
            return
        catalog.upsert_chunks(
            lib_id,
            doc_id,
            [{"text": r["text"], "embedding": list(r["embedding"])} for r in rows],
            ids=[r["id"] for r in rows],
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    lifetime totals carried in explicit state across micro-batches —
    the shape (arbitrary per-key state + arbitrary Python update logic)
    that windowed aggregation can't express.

    State is one (count, sum) pair per user — O(users) in the state
    store, each micro-batch touches only the users present in it. This is
    the template for custom sessionization/termination rules; swap the
    update body, keep the plumbing."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    stream_df: DataFrame, table_name: str, output_mode: str = "complete"
) -> None:
    """Drain an aggregated stream into an in-memory sink with the
    availableNow trigger (process-everything-then-stop) — the test harness
    for batch/stream equivalence. Stateful applyInPandasWithState streams
    require ``output_mode='update'``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def knn_query_stream(
    corpus: DataFrame,
    query_src_dir: str,
    query_schema: StructType,
    sink_table: str,
    k: int = 10,
) -> None:
    """Micro-batch k-NN: a STREAM of query vectors scored against the
    static corpus via foreachBatch — each micro-batch runs the exact
    batch BLAS kernel (operators/knn.topk_pandas), results append to an
    in-memory table.

    This is the Spark-native answer to the reference's online search
    endpoint (north star: real-time serving is out of scope; micro-batch
    is the closest native fit — swap the file source for Kafka and the
    memory sink for a serving store, and this IS the production shape)."""
    from vectordb_from_scratch_spark.operators.knn import topk_pandas

    spark = corpus.sparkSession
    queries = (
        spark.readStream.schema(query_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(query_src_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = topk_pandas(corpus, batch_df.toPandas(), k=k)
        res.write.mode("append").saveAsTable(sink_table)

    q = (
        queries.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact deduplication with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps an event_id only until the
    watermark passes its timestamp, then evicts it — the streaming twin of
    the batch `dedup_exact` operator, and the standard guard in front of a
    training-data ingest pipeline where at-least-once sources (Kafka,
    retried file drops) re-deliver records.

    Plain ``dropDuplicates`` on a stream would grow state forever (every
    key ever seen); the watermarked variant holds O(keys-per-watermark-
    window) — at 100 TB/day ingest with a 2 h watermark that is state over
    ~8 TB of arrivals, sharded across executors' state stores, not a
    driver-side set."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def view_purchase_join_stream(
    views: DataFrame, purchases: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join with a time-range condition: each purchase
    matched to the same user's views in the preceding ``horizon`` —
    attribution, the canonical two-stream use case. Both sides carry
    watermarks; the range condition lets Spark evict a buffered view once
    the purchase-side watermark passes view_ts + horizon, so join state is
    bounded by horizon x arrival-rate per side.

    The batch twin (operators/events.events_range_pairs) is an identical
    join condition over static frames — the equivalence test pins that the
    streaming plan computes the same pairs."""
    v = (
        views.withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") < F.col("purchase_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select(
        "purchase_id",
        "view_id",
        F.col("p_user").alias("user_id"),
        "view_ts",
        "purchase_ts",
        "amount",
    )


def hll_registers_stream(events: DataFrame) -> DataFrame:
    """Streaming HyperLogLog: the register build (max rho per bucket) is
    a plain streaming max aggregate, because HLL's merge IS max — the
    whole point of sketch algebra is that the same expression tree runs
    batch or streaming, and micro-batches merge into exact register
    state. Identical registers to the batch build are asserted in
    tests/test_streaming.py; the estimate is a driver-side fold over 256
    rows of final state.

    At scale this is the production distinct-count shape: unbounded
    state is m=256 rows TOTAL (not per key, not per window), so the
    sketch never needs a watermark to stay bounded."""
    from vectordb_from_scratch_spark.operators.sketches import _hll_rho_cols

    r = _hll_rho_cols(events.select(F.col("user_id").cast("string").alias("k")), "k")
    return r.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.max("rho").cast("long").alias("max_rho")
    )


def heavy_hitter_candidates_stream(
    tokens: DataFrame, n_buckets: int = 8, state_k: int = None
) -> DataFrame:
    """Streaming Misra-Gries heavy-hitter candidates: the batch two-pass
    operator's pass 1 (operators/sketches.py::misra_gries_partials) as a
    custom stateful stream. Tokens group by a cross-engine hash bucket —
    every occurrence of a token lands in ONE bucket, so each bucket's MG
    summary carries the standard undercount bound over that token's FULL
    stream history and the superset guarantee survives micro-batching:
    any token with global frequency > n/HH_THRESHOLD_K is present in its
    bucket's final state (asserted in tests/test_sources_stateful.py).

    State is n_buckets × state_k (token, count) pairs TOTAL — like the
    streaming HLL, bounded without a watermark, which is the whole point
    of sketch state. Each emission carries a per-bucket version counter
    so the update-mode sink's final summary per bucket is selectable."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from vectordb_from_scratch_spark.functions import texthash
    from vectordb_from_scratch_spark.operators import sketches

    k = sketches.HH_STATE_K if state_k is None else state_k

    def update(key, pdfs, state: GroupState):
        toks, cnts, ver = state.get if state.exists else ([], [], 0)
        st = dict(zip(toks, [int(c) for c in cnts]))
        for pdf in pdfs:
            st = sketches.mg_update(st, pdf["w"].value_counts(), k)
        ver += 1
        state.update((list(st.keys()), [int(v) for v in st.values()], ver))
        yield pd.DataFrame(
            {
                "bucket": key[0],
                "w": list(st.keys()),
                "est": [int(v) for v in st.values()],
                "ver": ver,
            }
        )

    bucketed = tokens.withColumn(
        "bucket", F.pmod(texthash.hash60(F.col("w")), F.lit(n_buckets))
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType="bucket long, w string, est long, ver long",
        stateStructType="toks array<string>, cnts array<long>, ver long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def histogram_bins_stream(
    stream: DataFrame, edges: DataFrame, bins: int = None
) -> DataFrame:
    """Streaming histogram-quantile state: (event_type, bin) counts over
    the stream, binned against the broadcast static ``edges`` frame
    (event_type, vmin, vmax). Histogram merge IS addition, so a plain
    streaming sum carries the sketch — the same algebra argument as
    hll_registers_stream (merge = max) and heavy_hitter_candidates_stream
    (MG summaries). Bin ranges must be FIXED up front in a streaming
    setting (no second pass over history): the production shape takes
    edges from yesterday's profile, not today's stream. State is
    types × B rows total, watermark-free; register-identical to the
    batch histogram built with the same edges (asserted in tests)."""
    from vectordb_from_scratch_spark.operators.sketches import HIST_BINS, hist_bin_expr

    b = HIST_BINS if bins is None else bins
    binned = stream.join(F.broadcast(edges), "event_type").withColumn(
        "bin", hist_bin_expr(F.col("value"), F.col("vmin"), F.col("vmax"), b)
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )


def countmin_counters_stream(events: DataFrame) -> DataFrame:
    """Streaming Count-Min: the counter build is a plain streaming count
    per (row, bucket) — CM merge IS addition, so micro-batches sum into
    exactly the batch sketch (register-identity asserted in tests, same
    contract as the HLL and histogram twins). State is d·w rows TOTAL
    regardless of stream length or key cardinality; watermark-free."""
    from vectordb_from_scratch_spark.operators.sketches import _cm_pairs

    keyed = events.select(F.col("user_id").cast("string").alias("k"))
    return (
        _cm_pairs(keyed)
        .groupBy(
            F.col("row").cast("long").alias("row"),
            F.col("bucket").cast("long").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def ewma_by_user_stream(events: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Streaming twin of ``events_ewma_by_user``: the per-key recurrence
    carried as explicit (ewma, n) state across micro-batches — exactly
    the scale path the batch operator's docstring names for histories
    too long to collect per task (state is O(1) per user; each
    micro-batch folds only its own rows). Within a micro-batch rows fold
    in (ts, event_id) order; ACROSS batches the fold follows arrival
    order, so register-identity with the batch fold holds under in-order
    delivery — the time-partitioned log-replay contract every
    order-sensitive streaming operator carries (cf. watermarked ops,
    which instead buy disorder tolerance with lateness bounds)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        ewma, n = state.get if state.exists else (0.0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        for v in pdf["value"]:
            v = float(v)
            ewma = v if n == 0 else ewma * alpha + v * alpha
            n += 1
        state.update((float(ewma), int(n)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma": [round(ewma, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, ewma double",
        stateStructType="ewma double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def edge_maintenance_stream(
    spark: SparkSession, src_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Streaming twin of :func:`operators.graph.merge_edge_delta`: a
    file-source stream of (ok, pk) order items where each micro-batch
    carries WHOLE orders (the additivity contract — one file per order
    batch, one file per trigger), folded into the co-purchase edge
    artifact by the same sum-merge the batch path uses. Returns the final
    edge DataFrame; equality with the one-shot derivation over the union
    of all batches is asserted by test (the same stream==batch register
    equality discipline as the sketch twins).

    Each merge eagerly ``localCheckpoint``-s: the accumulated artifact
    must not keep lineage into transient micro-batch frames (a batch
    DataFrame is only valid inside its foreachBatch call), and the
    checkpoint also bounds plan depth across an unbounded stream. At
    scale the same fold writes MERGE deltas to the edge table's storage
    instead of holding a checkpointed frame."""
    from pyspark.sql import types as T

    from vectordb_from_scratch_spark import sources
    from vectordb_from_scratch_spark.operators import graph

    schema = T.StructType(
        [
            T.StructField("ok", T.LongType()),
            T.StructField("pk", T.LongType()),
        ]
    )
    stream = sources.read_stream(spark, src_dir, schema=schema)
    state: dict = {"edges": None}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if state["edges"] is None:
            state["edges"] = graph.copurchase_edges_from_items(
                batch_df
            ).localCheckpoint()
        else:
            state["edges"] = graph.merge_edge_delta(
                state["edges"], batch_df
            ).localCheckpoint()

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state["edges"]


def truss_support_stream(
    spark: SparkSession, src_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Streaming twin of :func:`operators.graph.truss_support_delta`
    (r9): whole-order micro-batches fold into the (src, dst, n_orders,
    sup) support artifact — the first batch seeds edges + one support
    enumeration, every later batch pays only its new-edge-incident
    triangles. The nightly warm-peel regime (`ktruss(support0=...)`)
    as a continuously-maintained stream; equality with the one-shot
    (merge_edge_delta over everything + full edge_support) is the test
    contract, same as the edge-maintenance twin."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from vectordb_from_scratch_spark import sources
    from vectordb_from_scratch_spark.operators import graph

    schema = T.StructType(
        [
            T.StructField("ok", T.LongType()),
            T.StructField("pk", T.LongType()),
        ]
    )
    stream = sources.read_stream(spark, src_dir, schema=schema)
    state: dict = {"table": None}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if state["table"] is None:
            edges = graph.copurchase_edges_from_items(batch_df).localCheckpoint()
            sup = graph.edge_support(edges.select("src", "dst"))
            state["table"] = (
                edges.join(sup, ["src", "dst"], "left")
                .select(
                    "src",
                    "dst",
                    "n_orders",
                    F.coalesce(F.col("sup"), F.lit(0)).alias("sup"),
                )
                .localCheckpoint()
            )
        else:
            prev = state["table"]
            state["table"] = graph.truss_support_delta(
                prev.select("src", "dst", "n_orders"),
                prev.select("src", "dst", "sup"),
                batch_df,
            ).localCheckpoint()

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state["table"]


def minhash_maintenance_stream(
    spark: SparkSession, src_dir: str, checkpoint_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of :func:`operators.dedup.dedup_minhash_incremental`
    (r10, VERDICT r9 #4 — the one incremental artifact without one):
    document micro-batches fold into the maintained (bands, pairs) MinHash
    state via the same two delta-sided band joins — base×delta with
    least/greatest id normalization, plus the tiny delta×delta — so the
    base band table is never re-hashed and never re-self-joined, and
    base×base pairs are untouched by construction (a new document cannot
    change whether two old signatures agree). Returns the final
    (bands, pairs); equality of ``pairs`` with the one-shot
    ``dedup_minhash_lsh`` over the union of all batches is the test
    contract (the edge/truss stream twins' discipline). Precondition:
    batches carry NEW doc_ids only (the incremental decomposition's
    additivity contract, same as whole-order edge batches)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from vectordb_from_scratch_spark import sources
    from vectordb_from_scratch_spark.operators import dedup

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = sources.read_stream(spark, src_dir, schema=schema)
    state: dict = {"bands": None, "pairs": None}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = dedup.minhash_bands(
            dedup.minhash_signatures(batch_df)
        ).localCheckpoint()
        if state["bands"] is None:
            state["bands"] = delta
            state["pairs"] = dedup._minhash_pair_counts(
                delta, delta
            ).localCheckpoint()
            return
        base = state["bands"]
        a, b = base.alias("a"), delta.alias("b")
        cross = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key")),
            )
            .groupBy(
                F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
                F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
            )
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        )
        dd = dedup._minhash_pair_counts(delta, delta)
        state["pairs"] = (
            state["pairs"].unionByName(cross).unionByName(dd).localCheckpoint()
        )
        state["bands"] = base.unionByName(delta).localCheckpoint()

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state["bands"], state["pairs"]


def pca_moments_stream(emb: DataFrame) -> DataFrame:
    """Streaming twin of the PCA moment pass (operators/pca.py): the
    (n, Σx, Σxxᵀ) accumulator carried as a streaming sum over keyed
    moment cells — moment merge IS addition, the same algebra argument
    as the histogram/Count-Min twins, so micro-batch accumulation lands
    on exactly the batch moments (up to float-sum associativity ulps —
    unlike the integer sketches this state is DOUBLE, so the twin test
    compares at 1e-9 relative, not bit-identity). State is bounded at
    1 + d + d² rows regardless of stream length; watermark-free. An
    incremental PCA: re-running the 64×64 power iteration over the
    accumulated moments after any micro-batch refreshes the components
    without revisiting history."""
    from vectordb_from_scratch_spark.operators.pca import _moment_rows

    parts = emb.mapInPandas(
        _moment_rows, schema="n long, s array<double>, g array<double>"
    )
    n_rows = parts.select(
        F.lit("n").alias("kind"),
        F.lit(0).cast("long").alias("idx"),
        F.col("n").cast("double").alias("val"),
    )
    s_rows = parts.select(
        F.lit("s").alias("kind"), F.posexplode("s").alias("idx", "val")
    ).select("kind", F.col("idx").cast("long"), "val")
    g_rows = parts.select(
        F.lit("g").alias("kind"), F.posexplode("g").alias("idx", "val")
    ).select("kind", F.col("idx").cast("long"), "val")
    return (
        n_rows.unionByName(s_rows)
        .unionByName(g_rows)
        .groupBy("kind", "idx")
        .agg(F.sum("val").alias("total"))
    )


def kmv_state_stream(events: DataFrame, k: int = None) -> DataFrame:
    """Streaming twin of ``sketch_kmv_state``: per event_type, the K
    smallest distinct user-id hashes carried as explicit state across
    micro-batches. Bottom-k-of-distinct is ORDER-INSENSITIVE under
    merge (union then re-take the k smallest), so the final state is
    REGISTER-IDENTICAL to the batch sketch — the same argument as the
    HLL (max) and Count-Min (sum) twins, with min-k as the merge. State
    is ≤ K hashes per type, watermark-free; each emission carries a
    version counter so the update-mode sink's final row per type is
    selectable."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from vectordb_from_scratch_spark.functions import texthash
    from vectordb_from_scratch_spark.operators import sketches

    kk = sketches.KMV_K if k is None else k

    def update(key, pdfs, state: GroupState):
        (hashes, ver) = state.get if state.exists else ([], 0)
        st = set(int(h) for h in hashes)
        for pdf in pdfs:
            st.update(int(h) for h in pdf["h"])
        keep = sorted(st)[:kk]
        ver += 1
        state.update((keep, ver))
        yield pd.DataFrame(
            {
                "event_type": key[0],
                "rk": range(1, len(keep) + 1),
                "h": keep,
                "ver": ver,
            }
        )

    hashed = events.select(
        "event_type",
        texthash.hash60(F.col("user_id").cast("string")).alias("h"),
    )
    return hashed.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType="event_type string, rk long, h long, ver long",
        stateStructType="hashes array<long>, ver long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
