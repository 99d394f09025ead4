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


def cascade_search(
    corpus: DataFrame,
    queries_pdf,
    k: int = 10,
    prefilter: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full compression cascade as ONE operator — the production
    serving funnel every large vector store runs:

    1. **binary tier** (512×): Hamming prefilter keeps each partition's
       ``prefilter`` best candidates per query — bit_count(xor) over two
       BIGINT words, inside the same Arrow pass as tier 2;
    2. **SQ8 tier** (8×): integer-dot cosine rescores the survivors and
       keeps the per-partition top-k;
    3. **exact tier** (1×): the tiny global merge reranks O(partitions·
       Q·k) survivors against the raw floats.

    Each tier reads only what the previous one let through, so the bytes
    touched per tier shrink 512× → 8× → (candidates only). At 100 TB the
    binary scan is the only full pass. Recall vs the exact scan is pinned
    in tests/test_ann_recall.py; approximation comes only from the two
    pruning stages (prefilter == corpus reproduces the exact scan, also
    asserted)."""
    import numpy as np

    qids = queries_pdf["query_id"].to_numpy()
    Q = np.stack(queries_pdf["query_vec"].to_list()).astype("float64")
    qbits = np.packbits(Q > 0, axis=1, bitorder="little")  # (Q, ceil(d/8)) uint8
    qamax = np.abs(Q).max(axis=1, keepdims=True)
    qsafe = np.where(qamax == 0, 1.0, qamax)
    qcodes = np.floor(Q / qsafe * SQ_MAX + 0.5)
    qnorm2 = np.einsum("ij,ij->i", qcodes, qcodes)
    qn2_safe = np.where(qnorm2 == 0, 1.0, qnorm2)

    def funnel(batches):
        import pandas as pd

        popcnt = np.unpackbits(np.arange(256, dtype="uint8")[:, None], axis=1).sum(1)
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            X = np.stack(pdf[vec_col].to_list()).astype("float64")
            # tier 1: Hamming over packed sign bits
            xbits = np.packbits(X > 0, axis=1, bitorder="little")  # (n, w)
            # (n, Q, w) xor via broadcasting, popcount via table lookup
            ham = popcnt[xbits[:, None, :] ^ qbits[None, :, :]].sum(axis=2)
            keep_n = min(prefilter, ham.shape[0])
            rows = []
            for j, qid in enumerate(qids):
                # Both cutoffs use the pinned total order (score desc, id
                # asc) via knn.local_topk_indices — a bare argpartition
                # makes shortlist membership at a tie depend on row order
                # within the partition (ADVICE r3 #1).
                sel = knn.local_topk_indices(-ham[:, j].astype("float64"), ids, keep_n)
                # tier 2: SQ8 integer-dot cosine on the survivors
                Xs = X[sel]
                amax = np.abs(Xs).max(axis=1, keepdims=True)
                safe = np.where(amax == 0, 1.0, amax)
                codes = np.floor(Xs / safe * SQ_MAX + 0.5)
                n2 = np.einsum("ij,ij->i", codes, codes)
                n2s = np.where(n2 == 0, 1.0, n2)
                s = (codes @ qcodes[j]) / np.sqrt(n2s * qn2_safe[j])
                s[n2 == 0] = 0.0
                top = knn.local_topk_indices(s, ids[sel], k)
                rows.append(
                    pd.DataFrame({"query_id": qid, id_col: ids[sel][top]})
                )
            yield pd.concat(rows, ignore_index=True)

    id_type = corpus.schema[id_col].dataType.simpleString()
    shortlist = corpus.select(id_col, vec_col).mapInPandas(
        funnel, schema=f"query_id long, {id_col} {id_type}"
    )
    # tier 3: exact rerank of the merged survivors (knn is the module-level
    # import — a local re-import here would turn `knn` into an unbound
    # closure cell inside `funnel`, which is serialized before this line)
    cand_vec = shortlist.join(corpus.select(id_col, vec_col), id_col)
    rerank = knn.score_pairs_pandas(cand_vec, queries_pdf, id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


@register("knn_cascade")  # rows-only: multi-tier pruning is not SQL-shaped
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

