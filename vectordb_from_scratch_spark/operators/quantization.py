"""Scalar (int8) quantization — compressed-domain similarity search.

The reference keeps every vector as float64 in RAM (``app/core/indexes/
flat.py:30-38``); at 100 TB of embeddings that is the single biggest cost
of the corpus. Scalar quantization stores each vector as 64 int8 codes
(+ nothing else, for cosine): per vector, ``code_i = floor(x_i / amax *
127 + 0.5)`` with ``amax = max|x_i|``. The per-vector scale CANCELS in
cosine — cos(deq(a), deq(b)) = dot_int(a, b) / sqrt(||a||²_int ·
||b||²_int) — so the compressed domain needs no dequantization at all,
and the whole search is exact integer arithmetic + one sqrt. That makes
it the one ANN compression whose results a SQL oracle can reproduce
bit-for-bit: both engines compute the same integer dot products.

Rounding is ``floor(v + 0.5)`` deliberately: Spark's ``round`` (HALF_UP
via BigDecimal) and DuckDB's ``round`` (half-away-from-zero on doubles)
disagree on negative .5 boundaries; ``floor`` is IEEE-exact and identical
in both engines.

Scale design: the codes table is 8× smaller than float64 (64 B vs 512 B a
vector; packed BINARY on a real deployment, array<long> here for SQL
ergonomics), so the scan that dominates brute-force search reads 8× less.
The expression path keeps scoring JVM-side for oracle parity; the Arrow
kernel path (``sq8_topk_pandas``) is the 100 TB plan — per-partition int
matmul + local top-k, identical merge shape to ``knn.topk_pandas``.
Shortlist + exact rerank against the raw vectors recovers full-precision
ordering; at SQ8's fidelity the quantized ordering already value-matches
the rerank on the fixture (asserted in tests).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import knn
from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

SQ_MAX = 127  # int8 symmetric range


def sq8_codes(vec: Column | str) -> Column:
    """Per-vector symmetric int8 codes as array<long>: floor(x/amax*127
    + 0.5); an all-zero vector encodes to all-zero codes."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    enc = F.transform(vec, lambda x: F.floor(x / amax * SQ_MAX + F.lit(0.5)))
    zero = F.transform(vec, lambda x: F.lit(0).cast("long"))
    return F.when(amax == 0, zero).otherwise(enc)


def _int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sq8_encode(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, codes, norm2) — norm2 = integer self-dot, precomputed once at
    encode time so search divides by a stored value instead of recomputing
    per pair (the same trick as storing unit-normalized floats)."""
    codes = sq8_codes(vec_col)
    return df.select(
        F.col(id_col),
        codes.alias("codes"),
    ).withColumn("norm2", _int_dot(F.col("codes"), F.col("codes")))


_SQ8_SQL = """
WITH enc AS (
  SELECT vec_id,
         CASE WHEN list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) = 0
              THEN list_transform(embedding::DOUBLE[], x -> 0::BIGINT)
              ELSE list_transform(embedding::DOUBLE[],
                     x -> floor(x / list_max(list_transform(embedding::DOUBLE[], y -> abs(y)))
                                * 127 + 0.5)::BIGINT)
         END AS codes
  FROM embeddings),
n AS (SELECT vec_id, codes,
             list_dot_product(codes::DOUBLE[], codes::DOUBLE[]) AS norm2
      FROM enc),
q AS (SELECT vec_id AS query_id, codes AS qc, norm2 AS qn FROM n WHERE vec_id < {Q}),
s AS (SELECT q.query_id, n.vec_id,
             CASE WHEN q.qn * n.norm2 = 0 THEN 0.0
                  ELSE list_dot_product(q.qc::DOUBLE[], n.codes::DOUBLE[])
                       / sqrt(q.qn * n.norm2)
             END AS score
      FROM q CROSS JOIN n),
r AS (SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS rnk
      FROM s)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM r WHERE rnk <= {K}
"""

_SQ_Q = 10
_SQ_K = 10


@register("knn_sq8_topk", _SQ8_SQL.format(Q=_SQ_Q, K=_SQ_K))
def knn_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-domain cosine top-k over int8 codes, value-checked
    against DuckDB running the identical integer arithmetic — an
    oracle-checked ANN compression path (recall vs the float scan is
    additionally pinned in tests/test_ann_recall.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    enc = sq8_encode(emb)
    q = enc.filter(F.col("vec_id") < _SQ_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("codes").alias("qc"),
        F.col("norm2").alias("qn"),
    )
    dot = _int_dot(F.col("qc"), F.col("codes"))
    score = F.when(F.col("qn") * F.col("norm2") == 0, F.lit(0.0)).otherwise(
        dot / F.sqrt((F.col("qn") * F.col("norm2")).cast("double"))
    )
    scored = enc.join(F.broadcast(q)).select(
        "query_id", "vec_id", score.alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _SQ_K)
        .select(
            "query_id",
            "vec_id",
            F.round("score", 6).alias("score"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def sq8_encode_pandas(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Arrow-kernel twin of :func:`sq8_encode` — one batched NumPy pass.
    Spark's higher-order array functions are interpreted per element (no
    whole-stage codegen), so the expression encoder costs ~4× this kernel
    at 200k×64 (measured in tools/stress.py); the arithmetic is the same
    IEEE double ops (divide, multiply, floor), so both encoders produce
    IDENTICAL codes — knn_sq8_topk_kernel runs this one against the same
    DuckDB oracle as the expression plan."""
    import numpy as np

    id_type = df.schema[id_col].dataType.simpleString()

    def enc_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_list()).astype("float64")
            amax = np.abs(X).max(axis=1, keepdims=True)
            safe = np.where(amax == 0, 1.0, amax)
            codes = np.floor(X / safe * SQ_MAX + 0.5).astype("int64")
            codes[amax[:, 0] == 0, :] = 0
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "codes": list(codes),
                    "norm2": np.einsum("ij,ij->i", codes, codes),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        enc_iter, schema=f"{id_col} {id_type}, codes array<long>, norm2 long"
    )


def sq8_topk_pandas(
    enc: DataFrame, queries_pdf: pd.DataFrame, k: int = 10
) -> DataFrame:
    """Scale path: per-partition integer matmul over the codes table +
    local top-k, then the tiny global merge — ``knn.topk_pandas`` over the
    8×-compressed representation. ``queries_pdf`` carries (query_id,
    codes, norm2) for a small query set."""
    import numpy as np

    qids = queries_pdf["query_id"].to_numpy()
    Qc = np.stack(queries_pdf["codes"].to_list()).astype("float64")  # int-valued
    qn = queries_pdf["norm2"].to_numpy().astype("float64")
    qn_safe = np.where(qn == 0, 1.0, qn)

    def part_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy()
            X = np.stack(pdf["codes"].to_list()).astype("float64")
            n2 = pdf["norm2"].to_numpy().astype("float64")
            n2_safe = np.where(n2 == 0, 1.0, n2)
            S = (X @ Qc.T) / np.sqrt(np.outer(n2_safe, qn_safe))
            S[n2 == 0, :] = 0.0
            S[:, qn == 0] = 0.0
            rows = []
            for j, qid in enumerate(qids):
                # exact (score DESC, id ASC) local order — integer-dot
                # scores tie routinely, and the merge is oracle-checked
                sel = knn.local_topk_indices(S[:, j], ids, k)
                rows.append(
                    pd.DataFrame({"query_id": qid, "vec_id": ids[sel], "score": S[sel, j]})
                )
            yield pd.concat(rows, ignore_index=True)

    cand = enc.select("vec_id", "codes", "norm2").mapInPandas(
        part_topk, schema="query_id long, vec_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def sign_bits_word(vec_expr: str, word: int) -> Column:
    """1-bit binarization, one 32-bit word at a time: bit i of word w is
    set iff x_{32w+i} > 0, summed into a BIGINT. 32-bit words sidestep
    the sign-bit overflow a single 64-bit pack would hit at dim 63, and
    generalize to any dimension as an array of words."""
    return F.expr(
        f"aggregate(zip_with(slice({vec_expr}, {32 * word + 1}, 32), sequence(0, 31), "
        f"(x, i) -> IF(x > CAST(0 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i), "
        f"CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def _hamming_word_sql(word: int) -> str:
    lo, hi = 32 * word + 1, 32 * word + 32
    return (
        f"list_sum(list_transform(range(1, 33), "
        f"i -> CASE WHEN (embedding[{lo}:{hi}])[i] > 0 "
        f"THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END))::BIGINT"
    )


_HAMMING_SQL = f"""
WITH b AS (
  SELECT vec_id,
         {_hamming_word_sql(0)} AS lo,
         {_hamming_word_sql(1)} AS hi
  FROM embeddings),
q AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi FROM b WHERE vec_id < {{Q}}),
s AS (SELECT q.query_id, b.vec_id,
             (bit_count(xor(q.qlo, b.lo)) + bit_count(xor(q.qhi, b.hi)))::BIGINT AS hamming
      FROM q CROSS JOIN b),
r AS (SELECT query_id, vec_id, hamming,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY hamming ASC, vec_id ASC) AS rnk
      FROM s)
SELECT query_id, vec_id, hamming, rnk
FROM r WHERE rnk <= {{K}}
"""


@register("knn_hamming_topk", _HAMMING_SQL.format(Q=_SQ_Q, K=_SQ_K))
def knn_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third compression tier: 1-bit sign binarization — 64 dims in
    one BIGINT (512× vs float64). Ranking is Hamming distance =
    bit_count(xor), a 2-instruction kernel that whole-stage codegen keeps
    entirely JVM-side; the oracle reproduces it exactly because every
    step is integer. At 100 TB this is the cheapest possible first-pass
    filter — the binary scan touches 0.2% of the float bytes, and its
    survivors feed the SQ8/PQ/exact tiers (the cascade every production
    vector store runs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bits = emb.select(
        "vec_id",
        sign_bits_word("embedding", 0).alias("lo"),
        sign_bits_word("embedding", 1).alias("hi"),
    )
    q = bits.filter(F.col("vec_id") < _SQ_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    hamming = (
        F.bit_count(F.col("qlo").bitwiseXOR(F.col("lo")))
        + F.bit_count(F.col("qhi").bitwiseXOR(F.col("hi")))
    ).cast("long")
    scored = bits.join(F.broadcast(q)).select(
        "query_id", "vec_id", hamming.alias("hamming")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _SQ_K)
        .select("query_id", "vec_id", "hamming", F.col("rnk").cast("long").alias("rnk"))
    )


@register("knn_sq8_topk_kernel", _SQ8_SQL.format(Q=_SQ_Q, K=_SQ_K))
def knn_sq8_topk_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The all-Arrow plan for the same SQ8 search, against the same
    oracle — pins BOTH kernels (batched encode + integer matmul) against
    the expression plan, exactly as knn_cosine_topk_blas pins the float
    kernel."""
    emb = load_table(spark, sf_dir, "embeddings")
    enc = sq8_encode_pandas(emb)
    # filter BEFORE the encode kernel: a filter above mapInPandas cannot
    # push to the scan, so deriving queries from `enc` would pay a full
    # corpus encode just to keep 10 rows
    qpdf = (
        sq8_encode_pandas(emb.filter(F.col("vec_id") < _SQ_Q))
        .select(F.col("vec_id").alias("query_id"), "codes", "norm2")
        .toPandas()
    )
    qpdf["codes"] = qpdf["codes"].map(list)
    res = sq8_topk_pandas(enc, qpdf, k=_SQ_K)
    return res.select(
        "query_id",
        "vec_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rnk"),
    )


def _query_funnel_arrays(Q):
    """(qbits, qcodes, qn2_safe) for a query matrix — the tier-1 packed
    sign bits and tier-2 SQ8 codes, shared by both cascade kernels so the
    arithmetic is literally the same code."""
    import numpy as np

    qbits = np.packbits(Q > 0, axis=1, bitorder="little")  # (Q, ceil(d/8)) uint8
    qamax = np.abs(Q).max(axis=1, keepdims=True)
    qsafe = np.where(qamax == 0, 1.0, qamax)
    qcodes = np.floor(Q / qsafe * SQ_MAX + 0.5)
    qnorm2 = np.einsum("ij,ij->i", qcodes, qcodes)
    return qbits, qcodes, np.where(qnorm2 == 0, 1.0, qnorm2)


def _funnel_unit(ids, X, qids, qbits, qcodes, qn2_safe, prefilter, id_col):
    """Tiers 1+2 of the cascade over one UNIT of corpus rows (a physical
    partition on the driver path, a cogrouped block pair on the bigq
    path): Hamming over packed sign bits, per-query local
    top-``prefilter`` with the pinned tie order, SQ8 integer-dot cosine
    for the survivors. Emits (query_id, id, hamming, sq8).

    Unit-invariance is what makes the two cascade paths EQUAL, not
    merely equivalent: the local cut is a superset of the global
    top-``prefilter``'s members in the unit (so the global tier-1 window
    sees the same set under any partitioning/blocking), and both scores
    are exact — Hamming is integer, and SQ8 dots/norms are
    integer-valued doubles (≤ 64·127² terms, far under 2⁵³), so no
    summation-order ulp can differ across blockings (the gotcha that
    rules out raw-float scores here)."""
    import numpy as np

    popcnt = np.unpackbits(np.arange(256, dtype="uint8")[:, None], axis=1).sum(1)
    # tier 1: (n, Q, w) xor via broadcasting, popcount via table lookup
    xbits = np.packbits(X > 0, axis=1, bitorder="little")  # (n, w)
    ham = popcnt[xbits[:, None, :] ^ qbits[None, :, :]].sum(axis=2)
    # tier-2 codes for the whole unit once (encoding is per-row, so the
    # per-query survivor slices below reuse it)
    amax = np.abs(X).max(axis=1, keepdims=True)
    safe = np.where(amax == 0, 1.0, amax)
    codes = np.floor(X / safe * SQ_MAX + 0.5)
    n2 = np.einsum("ij,ij->i", codes, codes)
    n2s = np.where(n2 == 0, 1.0, n2)
    keep_n = min(prefilter, ham.shape[0])
    rows = []
    for j, qid in enumerate(qids):
        # the pinned total order (score desc, id asc) via
        # knn.local_topk_indices — a bare argpartition makes shortlist
        # membership at a tie depend on row order within the unit
        # (ADVICE r3 #1)
        sel = knn.local_topk_indices(-ham[:, j].astype("float64"), ids, keep_n)
        s = (codes[sel] @ qcodes[j]) / np.sqrt(n2s[sel] * qn2_safe[j])
        s[n2[sel] == 0] = 0.0
        rows.append(
            pd.DataFrame(
                {
                    "query_id": int(qid),
                    id_col: ids[sel],
                    "hamming": ham[sel, j].astype("int64"),
                    "sq8": s,
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


def _cascade_tail(
    cand: DataFrame,
    corpus: DataFrame,
    k: int,
    prefilter: int,
    rerank_n: int,
    id_col: str,
    vec_col: str,
    score_fn,
) -> DataFrame:
    """Global tiers of the cascade, shared by both paths: window the
    per-unit candidates down to the global Hamming top-``prefilter``,
    then the global SQ8 top-``rerank_n``, then exact-rerank top-``k``.
    Because every cut is a global window over exact scores with the
    (score, id) tie order, the result is independent of how tier 1/2 ran
    — per-partition closure kernel or cogrouped block pairs."""
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col(id_col).asc()
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("sq8").desc(), F.col(id_col).asc()
    )
    short = (
        cand.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= prefilter)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= rerank_n)
        .select("query_id", id_col)
    )
    cand_vec = short.join(corpus.select(id_col, vec_col), id_col)
    rerank = score_fn(cand_vec)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def cascade_search(
    corpus: DataFrame,
    queries_pdf,
    k: int = 10,
    prefilter: int = 200,
    rerank_n: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full compression cascade as ONE operator — the production
    serving funnel every large vector store runs:

    1. **binary tier** (512×): Hamming prefilter — bit_count(xor) over
       packed sign words, cut to the global per-query ``prefilter`` best
       (per-unit local top + one global window);
    2. **SQ8 tier** (8×): integer-dot cosine rescores those survivors,
       cut to the global per-query ``rerank_n`` best (default 4·k);
    3. **exact tier** (1×): reranks the ``rerank_n`` survivors against
       the raw floats.

    Each tier reads only what the previous one let through, so the bytes
    touched per tier shrink 512× → 8× → (candidates only). At 100 TB the
    binary scan is the only full pass. Every cut is GLOBAL (r7): the
    result is a pure function of (corpus, queries, k, prefilter,
    rerank_n), independent of physical partitioning — which is what lets
    ``cascade_search_blockjoin`` assert exact equality. Recall vs the
    exact scan is pinned in tests/test_ann_recall.py; approximation
    comes only from the two pruning tiers (prefilter == corpus keeps
    tier 1 total, also asserted)."""
    import numpy as np

    rerank_n = rerank_n if rerank_n is not None else max(4 * k, 40)
    qids = queries_pdf["query_id"].to_numpy()
    Q = np.stack(queries_pdf["query_vec"].to_list()).astype("float64")
    qbits, qcodes, qn2_safe = _query_funnel_arrays(Q)

    def funnel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            X = np.stack(pdf[vec_col].to_list()).astype("float64")
            yield _funnel_unit(
                ids, X, qids, qbits, qcodes, qn2_safe, prefilter, id_col
            )

    id_type = corpus.schema[id_col].dataType.simpleString()
    cand = corpus.select(id_col, vec_col).mapInPandas(
        funnel, schema=f"query_id long, {id_col} {id_type}, hamming long, sq8 double"
    )
    # tier 3 rerank kernel: queries ride the closure (knn is the
    # module-level import — a local re-import here would turn `knn` into
    # an unbound closure cell inside `funnel`, serialized before this line)
    return _cascade_tail(
        cand,
        corpus,
        k,
        prefilter,
        rerank_n,
        id_col,
        vec_col,
        lambda cv: knn.score_pairs_pandas(cv, queries_pdf, id_col=id_col, vec_col=vec_col),
    )


def cascade_search_blockjoin(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prefilter: int = 200,
    rerank_n: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_corpus_hint: int | None = None,
    n_queries_hint: int | None = None,
    rows_per_block: int = 65536,
    queries_per_block: int = 4096,
) -> DataFrame:
    """The cascade for UNBOUNDED query batches (VERDICT r6 #5 — the last
    search family whose queries had to fit the driver): the block-join
    layout of ``knn.topk_blockjoin``/``pq.search_blockjoin`` applied to
    the funnel. Queries stay a DataFrame end to end — corpus rows and
    query rows are hash-blocked, every (corpus block × query block) pair
    cogroups into the SAME ``_funnel_unit`` kernel as the driver path,
    and the global windows + in-plan rerank (``knn.score_pairs_joined``)
    produce results EQUAL to ``cascade_search`` (asserted in
    tests/test_plans.py): the cuts are global and both tier scores are
    exact integers, so blocking cannot perturb them."""
    import numpy as np

    rerank_n = rerank_n if rerank_n is not None else max(4 * k, 40)
    n_c = n_corpus_hint if n_corpus_hint is not None else corpus.count()
    n_q = n_queries_hint if n_queries_hint is not None else queries.count()
    ncb = max(1, -(-int(n_c) // rows_per_block))
    nqb = max(1, -(-int(n_q) // queries_per_block))
    c = corpus.select(
        id_col,
        vec_col,
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(ncb)).cast("int").alias("cblk"),
        F.explode(F.sequence(F.lit(0), F.lit(nqb - 1))).alias("qblk"),
    )
    q = queries.select(
        "query_id",
        "query_vec",
        F.pmod(F.xxhash64(F.col("query_id")), F.lit(nqb)).cast("int").alias("qblk"),
        F.explode(F.sequence(F.lit(0), F.lit(ncb - 1))).alias("cblk"),
    )
    id_type = corpus.schema[id_col].dataType.simpleString()

    def pair_funnel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(
                {"query_id": [], id_col: [], "hamming": [], "sq8": []}
            ).astype({"query_id": "int64", "hamming": "int64", "sq8": "float64"})
        ids = left[id_col].to_numpy()
        X = np.stack(left[vec_col].to_list()).astype("float64")
        qids = right["query_id"].to_numpy()
        Q = np.stack(right["query_vec"].to_list()).astype("float64")
        qbits, qcodes, qn2_safe = _query_funnel_arrays(Q)
        return _funnel_unit(ids, X, qids, qbits, qcodes, qn2_safe, prefilter, id_col)

    cand = (
        c.groupBy("cblk", "qblk")
        .cogroup(q.groupBy("cblk", "qblk"))
        .applyInPandas(
            pair_funnel,
            schema=f"query_id long, {id_col} {id_type}, hamming long, sq8 double",
        )
    )
    return _cascade_tail(
        cand,
        corpus,
        k,
        prefilter,
        rerank_n,
        id_col,
        vec_col,
        lambda cv: knn.score_pairs_joined(cv, queries, id_col=id_col, vec_col=vec_col),
    )


def _cascade_sql(
    q: int = _SQ_Q, k: int = _SQ_K, prefilter: int = 200, rerank_n: int = 40
) -> str:
    """The whole funnel replayed in DuckDB (r10): every cut is a global
    window over cross-engine-exact scores — Hamming is integer, the SQ8
    cosine is an exact-integer dot over an IEEE-identical sqrt/divide —
    so tier membership can't drift; only the final rerank is float,
    under the proven knn-oracle pattern. This is why the cascade's cuts
    were made GLOBAL with pinned tie orders in r7: a partitioning-
    dependent shortlist could never carry a value oracle."""
    return f"""
WITH b AS (
  SELECT vec_id,
         {_hamming_word_sql(0)} AS lo,
         {_hamming_word_sql(1)} AS hi
  FROM embeddings),
enc AS (
  SELECT vec_id,
         CASE WHEN list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) = 0
              THEN list_transform(embedding::DOUBLE[], x -> 0::BIGINT)
              ELSE list_transform(embedding::DOUBLE[],
                     x -> floor(x / list_max(list_transform(embedding::DOUBLE[], y -> abs(y)))
                                * 127 + 0.5)::BIGINT)
         END AS codes
  FROM embeddings),
n AS (SELECT vec_id, codes,
             list_dot_product(codes::DOUBLE[], codes::DOUBLE[]) AS norm2
      FROM enc),
qb AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi FROM b WHERE vec_id < {q}),
qc AS (SELECT vec_id AS query_id, codes AS qcd, norm2 AS qn FROM n WHERE vec_id < {q}),
ham AS (SELECT qb.query_id, b.vec_id,
               (bit_count(xor(qb.qlo, b.lo)) + bit_count(xor(qb.qhi, b.hi)))::BIGINT AS hamming
        FROM qb CROSS JOIN b),
t1 AS (SELECT query_id, vec_id FROM (
         SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id
                    ORDER BY hamming ASC, vec_id ASC) AS rn
         FROM ham) WHERE rn <= {prefilter}),
t2s AS (SELECT t1.query_id, t1.vec_id,
               CASE WHEN qc.qn * n.norm2 = 0 THEN 0.0
                    ELSE list_dot_product(qc.qcd::DOUBLE[], n.codes::DOUBLE[])
                         / sqrt(qc.qn * n.norm2) END AS sq8
        FROM t1 JOIN qc USING (query_id) JOIN n ON n.vec_id = t1.vec_id),
t2 AS (SELECT query_id, vec_id FROM (
         SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id
                    ORDER BY sq8 DESC, vec_id ASC) AS rn
         FROM t2s) WHERE rn <= {rerank_n}),
raw AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
sc AS (SELECT t2.query_id, t2.vec_id,
              CASE WHEN sqrt(list_dot_product(qr.e, qr.e))
                        * sqrt(list_dot_product(r.e, r.e)) = 0 THEN 0.0
                   ELSE list_dot_product(qr.e, r.e)
                        / (sqrt(list_dot_product(qr.e, qr.e))
                           * sqrt(list_dot_product(r.e, r.e))) END AS score
       FROM t2 JOIN raw qr ON qr.vec_id = t2.query_id
               JOIN raw r ON r.vec_id = t2.vec_id),
rk AS (SELECT query_id, vec_id, score,
              row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS rnk
       FROM sc)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM rk WHERE rnk <= {k}
"""


@register("knn_cascade", _cascade_sql())
def knn_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → SQ8 → exact funnel over the fixture query set."""
    from vectordb_from_scratch_spark.operators import knn

    emb = load_table(spark, sf_dir, "embeddings")
    qpdf, _ = knn.fixture_query_set(spark, sf_dir, 10)
    res = cascade_search(emb, qpdf, k=10)
    return res.select(
        "query_id",
        "vec_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rnk"),
    )


@register("knn_cascade_bigq", _cascade_sql())
def knn_cascade_bigq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cascade's large-batch exit (completing the bigq family:
    ivf/lsh/pq/ivfpq/hnsw/blockjoin): no toPandas of the batch, no query
    matrix in any closure — shrunken block targets on the fixture
    exercise the multi-block merge exactly like pq_search_bigq."""
    from vectordb_from_scratch_spark.operators import knn

    emb = load_table(spark, sf_dir, "embeddings")
    _, queries = knn.fixture_query_set(spark, sf_dir, 10)
    from vectordb_from_scratch_spark.operators.dedup import embedding_corpus_stats

    n, _d = embedding_corpus_stats(sf_dir)
    res = cascade_search_blockjoin(
        emb,
        queries,
        k=10,
        n_corpus_hint=n,
        n_queries_hint=10,
        rows_per_block=2048,
        queries_per_block=4,
    )
    return res.select(
        "query_id",
        "vec_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rnk"),
    )

