"""Sketch-based approximate aggregation over ``events`` — HyperLogLog
distinct counts and approximate quantiles.

At 100 TB, exact count(DISTINCT user) shuffles every distinct value and
exact percentiles need a full sort; the sketch versions are single-pass,
mergeable (each partition builds a small sketch, the driver merges — the
same partial/merge algebra as sum), and bounded-error. Spark built-ins:
``approx_count_distinct`` (HLL++, default rsd 5%) and
``percentile_approx`` (Greenwald-Khanna, accuracy 1/eps).

The built-in sketches are rows-only for the driver (HLL++/GK internals
differ across engines, so DuckDB cannot value-match them); correctness is
carried by ``tests/test_sketches.py`` asserting measured error against the
exact answers — the same discipline as the ANN recall tests (approximate
operator, measured guarantee).

``sketch_hll_registers`` / ``sketch_hll_estimate`` go one further: an HLL
built on the cross-engine md5 hash family (functions/texthash), so both
engines compute IDENTICAL registers and the sketch itself is value-checked
— including the estimate, whose harmonic mean runs in scaled integer
arithmetic to stay deterministic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.functions import texthash
from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

QUANTILES = [0.5, 0.9, 0.99]
PA_ACCURACY = 10_000  # percentile_approx: error <= 1/accuracy of rank

# --- cross-engine deterministic HyperLogLog ---------------------------------------
#
# Spark's approx_count_distinct is rows-only for the driver because HLL++
# internals are engine-specific. This HLL is built from the same md5 hash
# family as MinHash (functions/texthash), so Spark and DuckDB compute the
# SAME registers — the sketch itself becomes value-checkable, which is the
# strongest check an approximate-distinct operator can carry. The register
# table is also the honest scale artifact: partial aggregation = per-
# partition max-per-bucket, merge = max again (the same algebra Spark's
# partial aggregates use), and the final sketch is m integers regardless
# of row count.

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 buckets
#: h is 60 bits; bucket takes 8, the remaining v has 52 → rho ∈ [1, 53].
_HLL_VBITS = 52
_HLL_RHO_MAX = _HLL_VBITS + 1
#: standard bias constant alpha_m for m >= 128 (Flajolet et al. 2007).
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hll_rho_cols(df: DataFrame, key) -> DataFrame:
    """Adds (bucket, rho) per row: bucket = low 8 bits of the 60-bit md5
    hash, rho = 1 + leading zeros of the remaining 52 bits. Leading zeros
    via length(bin(v)) — bin() renders without padding identically in
    Spark and DuckDB (verified), so rho = 53 - length(bin(v)) for v > 0."""
    h = texthash.hash60(key)
    return (
        df.withColumn("_h", h)
        .withColumn("bucket", F.pmod(F.col("_h"), F.lit(HLL_M)))
        # (h - bucket) is a multiple of 256 <= 2^60: exactly representable
        # in double (52-bit mantissa suffices), and /256 is a power-of-two
        # division — so this is EXACT despite passing through double.
        # A bare h/256 would NOT be (h has 60 significant bits).
        .withColumn("_v", ((F.col("_h") - F.col("bucket")) / HLL_M).cast("long"))
        .withColumn(
            "rho",
            F.when(
                F.col("_v") > 0, F.lit(_HLL_RHO_MAX) - F.length(F.bin("_v"))
            ).otherwise(F.lit(_HLL_RHO_MAX)),
        )
    )


def approx_user_counts(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """(event_type, n_events, approx_users, exact_users): HLL++ distinct
    users next to the exact answer — emitting both is the honest shape
    while validating a sketch rollout; drop the exact column once trusted."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


def approx_value_quantiles(events: DataFrame) -> DataFrame:
    """(event_type, p50, p90, p99) via Greenwald-Khanna with exact median
    alongside (median() is exact in Spark 3.4+)."""
    qs = F.percentile_approx("value", QUANTILES, PA_ACCURACY)
    return events.groupBy("event_type").agg(
        qs.alias("approx_q"),
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
    ).select(
        "event_type",
        F.round(F.col("approx_q")[0], 6).alias("p50"),
        F.round(F.col("approx_q")[1], 6).alias("p90"),
        F.round(F.col("approx_q")[2], 6).alias("p99"),
        F.round("exact_p50", 6).alias("exact_p50"),
    )


@register("sketch_distinct_users")  # rows-only: HLL internals engine-specific
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_user_counts(load_table(spark, sf_dir, "events"))


_HLL_H_SQL = texthash.hash60_sql("CAST(user_id AS VARCHAR)")

_HLL_REGISTERS_SQL = f"""
WITH h AS (SELECT {_HLL_H_SQL} AS h FROM events),
b AS (SELECT h % {HLL_M} AS bucket, h // {HLL_M} AS v FROM h),
r AS (SELECT bucket,
             CASE WHEN v > 0 THEN {_HLL_RHO_MAX} - length(bin(v))
                  ELSE {_HLL_RHO_MAX} END AS rho
      FROM b)
SELECT bucket::BIGINT AS bucket, max(rho)::BIGINT AS max_rho
FROM r GROUP BY bucket
"""


@register("sketch_hll_registers", _HLL_REGISTERS_SQL)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL sketch ITSELF, value-checked: because the hash is the
    cross-engine md5 family, both engines compute identical registers —
    an approximate-distinct operator with an EXACT oracle on its state
    (Spark's own HLL++ can only ever be rows-only). The register table is
    what actually ships at scale: per-partition partial = max-per-bucket,
    merge = max again, final size m=256 integers regardless of input rows
    — the same partial/merge algebra as sum(), so Spark's two-level
    aggregation IS the sketch merge."""
    ev = load_table(spark, sf_dir, "events")
    r = _hll_rho_cols(ev.select(F.col("user_id").cast("string").alias("k")), "k")
    return r.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.max("rho").cast("long").alias("max_rho")
    )


_HLL_ESTIMATE_SQL = f"""
WITH h AS (SELECT event_type, user_id, {_HLL_H_SQL} AS h FROM events),
regs AS (SELECT event_type, h % {HLL_M} AS bucket,
                max(CASE WHEN h // {HLL_M} > 0
                         THEN {_HLL_RHO_MAX} - length(bin(h // {HLL_M}))
                         ELSE {_HLL_RHO_MAX} END) AS r
         FROM h GROUP BY 1, 2),
agg AS (SELECT event_type, count(*) AS n_used,
               sum((1::BIGINT << ({_HLL_RHO_MAX} - r)))::BIGINT AS sum_used
        FROM regs GROUP BY 1),
est AS (SELECT event_type, ({HLL_M} - n_used)::BIGINT AS zeros,
               {HLL_ALPHA!r}::DOUBLE * {HLL_M} * {HLL_M} * {1 << _HLL_RHO_MAX}
               / (sum_used + ({HLL_M} - n_used) * {1 << _HLL_RHO_MAX})::DOUBLE AS e_raw
        FROM agg),
ex AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users
       FROM events GROUP BY 1)
SELECT ex.event_type, exact_users,
       round(CASE WHEN e_raw <= {2.5 * HLL_M} AND zeros > 0
                  THEN {HLL_M}.0 * ln({HLL_M}.0 / zeros) ELSE e_raw END, 2) AS hll_users
FROM est JOIN ex USING (event_type)
"""


@register("sketch_hll_estimate", _HLL_ESTIMATE_SQL)
def sketch_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HLL cardinality estimate next to the exact count.
    The harmonic mean runs in INTEGER arithmetic (each 2^-rho term scaled
    by 2^53 — sums stay < 2^61), so the only float ops are one division
    and the small-range ln() correction, making the estimate itself
    deterministic enough to value-check at 2dp. Standard Flajolet alpha_m
    bias constant and linear-counting correction below 2.5m."""
    ev = load_table(spark, sf_dir, "events")
    r = _hll_rho_cols(
        ev.select("event_type", F.col("user_id").cast("string").alias("k")), "k"
    )
    regs = r.groupBy("event_type", "bucket").agg(F.max("rho").alias("r"))
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_RHO_MAX} - r AS INT))")
    agg = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_used"), F.sum(term).alias("sum_used")
    )
    scale = F.lit(1 << _HLL_RHO_MAX).cast("long")
    zeros = (F.lit(HLL_M) - F.col("n_used")).cast("long")
    e_raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M)
        * scale
        / (F.col("sum_used") + zeros * scale).cast("double")
    )
    est = agg.select(
        "event_type",
        zeros.alias("zeros"),
        e_raw.alias("e_raw"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    hll = F.when(
        (F.col("e_raw") <= 2.5 * HLL_M) & (F.col("zeros") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("zeros")),
    ).otherwise(F.col("e_raw"))
    return est.join(exact, "event_type").select(
        "event_type", "exact_users", F.round(hll, 2).alias("hll_users")
    )


@register("sketch_value_quantiles")  # rows-only: GK sketch engine-specific
def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_value_quantiles(load_table(spark, sf_dir, "events"))


# --- heavy hitters (Misra-Gries candidates + exact recount) ------------------
#
# The corpus-vocabulary question a 100 TB pipeline actually asks: which
# tokens exceed x% of all traffic (stopword discovery, boilerplate
# detection, tokenizer-health dashboards). The naive answer is a full
# (token → count) shuffle of the whole vocabulary; the sketch answer is
# the classic two-pass heavy hitters:
#
#  pass 1 — per-partition Misra-Gries summaries (fixed HH_STATE_K
#           counters, ZERO shuffle, one Arrow scan). MG's undercount
#           bound (≤ n_p/(k+1)) plus pigeonhole over partitions
#           guarantees the union of partition summaries is a SUPERSET of
#           every token with global freq > n/HH_THRESHOLD_K;
#  pass 2 — exact counts for the ≤ parts·k candidates only (the single
#           shuffle carries candidate tokens, not the vocabulary), then
#           the exact integer threshold cnt·K > n.
#
# Because the OUTPUT depends only on exact counts (MG only proposes
# candidates and can never miss a true heavy hitter), the operator is
# deterministic under ANY partitioning and carries a FULL value oracle —
# the same two-tier discipline as the ANN cascade: approximate pruning,
# exact final answer.

HH_THRESHOLD_K = 30  # report tokens with freq > n/30 (~3.3% of all tokens;
# the fixture vocabulary is near-uniform at ~3.4%, so this yields a real,
# non-empty answer — and the integer comparison is exact either way)
HH_STATE_K = 64  # MG counters per partition; > 2·threshold for margin


def mg_update(state: dict, counts, k: int) -> dict:
    """Merge one batch's (token → count) tallies into a Misra-Gries
    summary of ≤ k counters — the ONE copy of the decrement rule, shared
    by the per-partition batch pass and the streaming stateful twin (two
    hand-maintained copies could silently diverge on the undercount
    bound). Batch decrement: subtract the over-th smallest counter from
    all — each round destroys d·|state| > d·k count units, so the total
    undercount per surviving token is ≤ n/k, the standard MG bound."""
    import numpy as np

    for tok, c in counts.items():
        state[tok] = state.get(tok, 0) + int(c)
    over = len(state) - k
    if over > 0:
        vals = np.sort(np.fromiter(state.values(), dtype="int64"))
        d = int(vals[over - 1])
        state = {t: c - d for t, c in state.items() if c > d}
    return state


def misra_gries_partials(tokens: DataFrame, col: str = "w", state_k: int = HH_STATE_K):
    """Per-partition MG summaries: DataFrame(token, est, part_total).
    est undercounts by ≤ part_total/state_k; any token with local
    count above that bound is guaranteed present."""
    import pandas as pd

    def mg_iter(batches):
        state: dict = {}
        total = 0
        for pdf in batches:
            vc = pdf[col].value_counts()
            total += int(vc.sum())
            state = mg_update(state, vc, state_k)
        if total:
            yield pd.DataFrame(
                {
                    col: list(state.keys()) or [""],
                    "est": list(state.values()) or [0],
                    "part_total": total,
                }
            )

    return tokens.select(col).mapInPandas(
        mg_iter, schema=f"{col} string, est long, part_total long"
    )


def heavy_hitters(
    tokens: DataFrame, col: str = "w", threshold_k: int = HH_THRESHOLD_K
) -> DataFrame:
    """Exact heavy hitters via MG candidate pruning: tokens with exact
    count · threshold_k > total tokens, with exact counts. One zero-
    shuffle scan + one candidate-only shuffle; never a full-vocabulary
    aggregation."""
    cands = {
        r[col] for r in misra_gries_partials(tokens, col=col).collect()
    }  # ≤ parts·k rows collected
    cands.discard("")
    # exact total via a count-only scan (map-side partial count, no
    # shuffle of values) — partition-shape-independent, unlike trying to
    # reconstruct it from the per-partition summary rows
    n = tokens.count()
    if not cands:
        return tokens.sparkSession.createDataFrame([], f"{col} string, cnt long")
    return (
        tokens.filter(F.col(col).isin(list(cands)))
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * threshold_k > F.lit(int(n)))
    )


_HH_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), w -> w != '')) AS w
  FROM documents),
tot AS (SELECT count(*)::BIGINT AS n FROM toks),
c AS (SELECT w, count(*)::BIGINT AS cnt FROM toks GROUP BY w)
SELECT w, cnt FROM c CROSS JOIN tot WHERE cnt * {HH_THRESHOLD_K} > n
"""


@register("text_heavy_hitters", _HH_SQL)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens exceeding 1/HH_THRESHOLD_K of all corpus tokens, with EXACT
    counts — found without ever shuffling the vocabulary (MG candidate
    pass + candidate-only recount). FULL value oracle: the output is a
    pure function of exact counts, so DuckDB reproduces it bit-for-bit;
    the sketch is only the pruning strategy. The integer comparison
    cnt·K > n avoids any float threshold drift between engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(texthash.words("text")).alias("w"))
    return heavy_hitters(toks, col="w")


# --- histogram quantiles (cross-engine value-checked) ------------------------
#
# Completes the value-checked sketch triad: distinct counts (md5 HLL),
# heavy hitters (MG + exact recount), and now quantiles. GK/t-digest
# internals are engine-specific (rows-only forever); an equi-width
# histogram is the quantile sketch whose STATE a SQL engine can
# reproduce bit-for-bit: bin = floor((v - min) / (max - min) * B) is the
# same IEEE double expression in both engines, the histogram is one
# mergeable groupBy (partial = per-partition counts, merge = sum — the
# sum algebra again), and the estimate is integer arithmetic over
# cumulative counts. Error is bounded by construction: the true quantile
# lies inside the selected bin, so |est - exact| <= bin width (asserted
# in tests). Two linear passes (min/max, then bins), state B ints per
# group regardless of rows.

HIST_BINS = 1024
#: (q numerator, label) — thresholds compared as 100·cum >= k·n, exact
#: integer arithmetic, no float quantile thresholds anywhere.
HIST_QS = ((50, "p50"), (90, "p90"), (99, "p99"))


def hist_bin_expr(value, vmin, vmax, bins: int = HIST_BINS):
    """bin = floor((v - vmin) / (vmax - vmin) · B), clamped — the ONE
    definition of the histogram's bin arithmetic. The streaming twin's
    register-identity contract holds exactly because it uses this same
    Column builder (hand-maintained copies of IEEE float expressions
    drift); the oracle SQL mirrors it literally."""
    return (
        F.when(vmax == vmin, F.lit(0))
        .otherwise(F.least(F.lit(bins - 1), F.floor((value - vmin) / (vmax - vmin) * bins)))
        .cast("long")
    )


def histogram_quantiles(events: DataFrame, bins: int = HIST_BINS) -> DataFrame:
    """(event_type, p50_est, p90_est, p99_est) from an equi-width
    histogram: estimates are each bin's LOWER edge — deterministic,
    interpolation-free, within one bin width of the exact quantile."""
    from pyspark.sql import Window

    stats = events.groupBy("event_type").agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = (
        events.join(F.broadcast(stats), "event_type")
        .withColumn(
            "bin", hist_bin_expr(F.col("value"), F.col("vmin"), F.col("vmax"), bins)
        )
        .groupBy("event_type", "vmin", "vmax", "n", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("bin")
    cum = binned.withColumn("cum", F.sum("c").over(w))
    edge = F.col("vmin") + F.col("bin") * (F.col("vmax") - F.col("vmin")) / bins
    agg = [
        F.round(
            F.min(F.when(F.col("cum") * 100 >= F.col("n") * k, edge)), 6
        ).alias(label)
        for k, label in HIST_QS
    ]
    return cum.groupBy("event_type").agg(*agg)


def _hist_sql(bins: int = HIST_BINS) -> str:
    qs = ",\n       ".join(
        f"round(min(CASE WHEN cum * 100 >= n * {k} THEN vmin + bin * (vmax - vmin) / {bins} END), 6) AS {label}"
        for k, label in HIST_QS
    )
    return f"""
WITH stats AS (
  SELECT event_type, min(value) AS vmin, max(value) AS vmax,
         count(*)::BIGINT AS n
  FROM events GROUP BY event_type),
binned AS (
  SELECT e.event_type, s.vmin, s.vmax, s.n,
         CASE WHEN s.vmax = s.vmin THEN 0
              ELSE least({bins - 1},
                         floor((e.value - s.vmin) / (s.vmax - s.vmin) * {bins}))
         END::BIGINT AS bin,
         count(*)::BIGINT AS c
  FROM events e JOIN stats s USING (event_type)
  GROUP BY 1, 2, 3, 4, 5),
cum AS (
  SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
  FROM binned)
SELECT event_type,
       {qs}
FROM cum GROUP BY event_type
"""


@register("sketch_histogram_quantiles", _hist_sql())
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p90/p99 from the 1024-bin histogram sketch,
    value-checked against DuckDB running the identical double arithmetic
    — the quantile sketch that CAN carry a full oracle. The one-bin
    error bound vs the exact percentile is asserted in
    tests/test_sketches.py."""
    return histogram_quantiles(load_table(spark, sf_dir, "events"))


# --- Count-Min sketch (cross-engine value-checked) ---------------------------
#
# Completes the frequency side of the sketch family: HLL answers "how
# many distinct", MG+recount answers "which keys are heavy", Count-Min
# answers "how often does THIS key occur" for any key, from d·w integers
# of state. Each of d hash rows maps the key to one of w counters; the
# estimate is the MIN over rows — never an undercount (every counter the
# key touches holds its true count plus collisions), over by ≤ e·n/w with
# probability 1-e^-d (Cormode & Muthukrishnan 2005).
#
# Like the md5 HLL, the whole sketch is value-checkable: row hashes come
# from the cross-engine md5 family (row j salts the key with a literal
# "j:" prefix), counters are one groupBy, and the estimate is integer
# min() — both engines reproduce sketch STATE and ESTIMATE bit-for-bit.
# Scale shape: partial = per-partition counter tallies, merge = sum (the
# sum algebra again — which is also why the streaming twin is register-
# identical), state d·w ints regardless of rows.

CM_D = 3  # hash rows
CM_W = 1024  # counters per row
#: probe every ~5th distinct user (deterministic md5 subset) so the
#: estimate query's output is small and stable while still exercising
#: the counter table — and non-empty even at the 15-user sf0.001 fixture.
CM_PROBE_MOD = 5


def _cm_pairs(keyed: DataFrame, key: str = "k") -> DataFrame:
    """(row, bucket) per input row per hash row — one scan, the explode
    is d tiny structs per row, no Python."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                F.pmod(
                    texthash.hash60(F.concat(F.lit(f"{j}:"), F.col(key))), F.lit(CM_W)
                ).alias("bucket"),
            )
            for j in range(CM_D)
        ]
    )
    return keyed.select(F.explode(pairs).alias("p")).select("p.row", "p.bucket")


def countmin_counters(keyed: DataFrame, key: str = "k") -> DataFrame:
    """The sketch state: (row, bucket, c) with exactly d·w possible rows.
    One shuffle on (row, bucket) whose input is already map-side
    partially aggregated down to ≤ parts·d·w rows."""
    return (
        _cm_pairs(keyed, key)
        .groupBy(F.col("row").cast("long").alias("row"), F.col("bucket").cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def countmin_estimates(keyed: DataFrame, key: str = "k") -> DataFrame:
    """(key, exact_cnt, cm_est) for the deterministic probe subset:
    cm_est = min over rows of that row's counter. The counter table is
    ≤ d·w rows — broadcast to the probe side, so probing N keys costs d
    broadcast-hash lookups per key and zero extra shuffles of the data."""
    counters = countmin_counters(keyed, key)
    probes = (
        keyed.filter(F.pmod(texthash.hash60(F.col(key)), F.lit(CM_PROBE_MOD)) == 0)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    pb = (
        probes.select(
            key,
            "exact_cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).cast("long").alias("row"),
                            F.pmod(
                                texthash.hash60(
                                    F.concat(F.lit(f"{j}:"), F.col(key))
                                ),
                                F.lit(CM_W),
                            ).cast("long").alias("bucket"),
                        )
                        for j in range(CM_D)
                    ]
                )
            ).alias("p"),
        )
        .select(key, "exact_cnt", "p.row", "p.bucket")
    )
    return (
        pb.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy(key, "exact_cnt")
        .agg(F.min("c").alias("cm_est"))
    )


def _cm_bucket_sql(j: int) -> str:
    """DuckDB rendering of row j's bucket for key column k — mirrors the
    literal-prefix salt used Spark-side in :func:`_cm_pairs`."""
    return f"{texthash.hash60_sql(repr(f'{j}:') + ' || k')} % {CM_W}"


_CM_KEY = "CAST(user_id AS VARCHAR)"

_CM_ROWS_SQL = " UNION ALL ".join(
    f"SELECT k, {j} AS row, {_cm_bucket_sql(j)} AS bucket FROM keyed"
    for j in range(CM_D)
)

_CM_COUNTERS_SQL = f"""
WITH keyed AS (SELECT {_CM_KEY} AS k FROM events),
pairs AS ({_CM_ROWS_SQL})
SELECT row::BIGINT AS row, bucket::BIGINT AS bucket, count(*)::BIGINT AS c
FROM pairs GROUP BY 1, 2
"""


@register("sketch_countmin_counters", _CM_COUNTERS_SQL)
def sketch_countmin_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Count-Min sketch ITSELF (d=3 rows × w=1024 counters) over
    events.user_id, value-checked: both engines hash with the md5 family
    and count, so the driver's hash compare confirms every counter."""
    ev = load_table(spark, sf_dir, "events")
    return countmin_counters(ev.select(F.col("user_id").cast("string").alias("k")))


_CM_ESTIMATE_SQL = f"""
WITH keyed AS (SELECT {_CM_KEY} AS k FROM events),
pairs AS ({_CM_ROWS_SQL}),
counters AS (
  SELECT row, bucket, count(*)::BIGINT AS c FROM pairs GROUP BY 1, 2),
probes AS (
  SELECT k, count(*)::BIGINT AS exact_cnt FROM keyed
  WHERE {texthash.hash60_sql("k")} % {CM_PROBE_MOD} = 0 GROUP BY k),
pb AS ({" UNION ALL ".join(
    f"SELECT k, exact_cnt, {j} AS row, {_cm_bucket_sql(j)} AS bucket FROM probes"
    for j in range(CM_D))})
SELECT pb.k AS k, pb.exact_cnt, min(c)::BIGINT AS cm_est
FROM pb JOIN counters USING (row, bucket)
GROUP BY 1, 2
"""


@register("sketch_countmin_estimate", _CM_ESTIMATE_SQL)
def sketch_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates next to exact counts for the
    deterministic probe subset — integer-only output, FULL value oracle.
    The never-undercounts guarantee (cm_est ≥ exact_cnt always) and the
    e·n/w overestimate bound are asserted in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    return countmin_estimates(
        ev.select(F.col("user_id").cast("string").alias("k"))
    )


# --- KMV (k-minimum-values) distinct sketch ----------------------------------
#
# The fourth sketch family: bottom-k order statistics of the hash space
# (Bar-Yossef et al. 2002). Where HLL keeps max-rho per bucket, KMV keeps
# the K smallest DISTINCT hashes — mergeable by "union then re-take the
# K smallest", with the unbiased estimate (K-1)·M/h_K from the K-th
# minimum of hashes uniform on [0, M). Like the HLL registers, the
# cross-engine md5 hash makes the sketch STATE exactly value-oracle-able
# (integer order statistics), and the estimate is a ratio of exact
# integers — Spark's approx_count_distinct could only ever be rows-only.
# KMV's extra trick over HLL: the states of two sketches intersect/union
# set-theoretically, giving distinct-intersection estimates HLL can't.

KMV_K = 128
_KMV_M = float(1 << 60)  # hash domain size for hash60

_KMV_STATE_SQL = f"""
WITH h AS (SELECT DISTINCT event_type, {_HLL_H_SQL} AS h FROM events),
r AS (SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rk
      FROM h)
SELECT event_type, rk::BIGINT AS rk, h
FROM r WHERE rk <= {KMV_K}
"""


@register("sketch_kmv_state", _KMV_STATE_SQL)
def sketch_kmv_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV sketch itself per event_type: the K=128 smallest distinct
    user-id hashes with their rank — K integers of bounded state per
    group, exactly reproduced by the oracle. Partial = per-partition
    bottom-k, merge = bottom-k of the union (WindowGroupLimit prunes
    map-side, so the exchange carries O(partitions·K) rows per group,
    the same shape as every top-k in the repo)."""
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select(
            "event_type",
            texthash.hash60(F.col("user_id").cast("string")).alias("h"),
        )
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.asc("h"))
    return (
        h.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= KMV_K)
        .select("event_type", "rk", "h")
    )


_KMV_ESTIMATE_SQL = f"""
WITH h AS (SELECT DISTINCT event_type, {_HLL_H_SQL} AS h FROM events),
r AS (SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rk
      FROM h),
kth AS (SELECT event_type, count(*)::BIGINT AS k_used,
               max(CASE WHEN rk = {KMV_K} THEN h END) AS h_k
        FROM r WHERE rk <= {KMV_K} GROUP BY 1),
ex AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users
       FROM events GROUP BY 1)
SELECT kth.event_type, kth.k_used,
       coalesce(kth.h_k, 0)::BIGINT AS kth_hash,
       round(CASE WHEN kth.k_used < {KMV_K} THEN kth.k_used::DOUBLE
                  ELSE ({KMV_K} - 1)::DOUBLE * {_KMV_M!r} / kth.h_k END, 2)
         AS est_users,
       ex.exact_users
FROM kth JOIN ex ON ex.event_type = kth.event_type
"""


@register("sketch_kmv_estimate", _KMV_ESTIMATE_SQL)
def sketch_kmv_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV distinct estimate (K−1)·M/h_K per event_type next to the
    exact count — a ratio of exact cross-engine integers, so even the
    approximation is value-checked (HLL's estimate gets the same
    treatment above; the expected relative error at K=128 is
    1/√(K−2) ≈ 9%, asserted in tests). Sketches with fewer than K
    distinct hashes ARE the exact answer and report it."""
    ev = load_table(spark, sf_dir, "events")
    state = sketch_kmv_state(spark, sf_dir)
    kth = state.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max(F.when(F.col("rk") == KMV_K, F.col("h"))).alias("h_k"),
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    est = F.when(
        F.col("k_used") < KMV_K, F.col("k_used").cast("double")
    ).otherwise(F.lit(float(KMV_K - 1)) * F.lit(_KMV_M) / F.col("h_k"))
    return (
        kth.join(ex, "event_type")
        .select(
            "event_type",
            F.col("k_used").cast("long").alias("k_used"),
            F.coalesce(F.col("h_k"), F.lit(0)).cast("long").alias("kth_hash"),
            F.round(est, 2).alias("est_users"),
            F.col("exact_users").cast("long").alias("exact_users"),
        )
    )


_KMV_INTERSECT_SQL = f"""
WITH h AS (SELECT DISTINCT event_type, {_HLL_H_SQL} AS h FROM events),
r AS (SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rk
      FROM h),
state AS (SELECT event_type, h FROM r WHERE rk <= {KMV_K}),
pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
          FROM (SELECT DISTINCT event_type FROM events) a
          JOIN (SELECT DISTINCT event_type FROM events) b
            ON a.event_type < b.event_type),
ud AS (SELECT DISTINCT p.type_a, p.type_b, s.h
       FROM pairs p JOIN state s
         ON s.event_type = p.type_a OR s.event_type = p.type_b),
ur AS (SELECT type_a, type_b, h,
              row_number() OVER (PARTITION BY type_a, type_b ORDER BY h ASC) AS rk
       FROM ud),
uk AS (SELECT type_a, type_b, h FROM ur WHERE rk <= {KMV_K}),
kth AS (SELECT type_a, type_b, max(h) AS h_k, count(*)::BIGINT AS k_used
        FROM uk GROUP BY 1, 2),
shared AS (SELECT uk.type_a, uk.type_b, count(*)::BIGINT AS n_shared
           FROM uk
           JOIN state sa ON sa.event_type = uk.type_a AND sa.h = uk.h
           JOIN state sb ON sb.event_type = uk.type_b AND sb.h = uk.h
           GROUP BY 1, 2)
SELECT kth.type_a, kth.type_b, kth.k_used,
       coalesce(shared.n_shared, 0)::BIGINT AS n_shared,
       round(coalesce(shared.n_shared, 0) * 1.0 / kth.k_used, 6) AS jaccard_est,
       round(coalesce(shared.n_shared, 0) * 1.0 / kth.k_used
             * (CASE WHEN kth.k_used < {KMV_K} THEN kth.k_used::DOUBLE
                     ELSE ({KMV_K} - 1)::DOUBLE * {_KMV_M!r} / kth.h_k END), 2)
         AS est_common_users
FROM kth LEFT JOIN shared
  ON shared.type_a = kth.type_a AND shared.type_b = kth.type_b
"""


@register("sketch_kmv_intersection", _KMV_INTERSECT_SQL)
def sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-INTERSECTION estimates between every pair of event types
    from their KMV sketches alone — the set-theoretic trick HLL cannot
    do: the bottom-K of the union of two sketches is a uniform sample of
    A∪B, so the fraction of it present in BOTH sketches estimates
    Jaccard, and J·|A∪B|̂ estimates the user overlap. Runs entirely on
    sketch state (2·K integers per pair), never the raw corpus — the
    federated/privacy shape where only sketches leave each silo. All
    arithmetic is ratios of exact cross-engine integers: FULL oracle."""
    ev = load_table(spark, sf_dir, "events")
    state = sketch_kmv_state(spark, sf_dir).select("event_type", "h")
    types = ev.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    u = (
        pairs.join(
            state,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .select("type_a", "type_b", "h")
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("type_a", "type_b").orderBy(F.asc("h"))
    uk = u.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= KMV_K)
    kth = uk.groupBy("type_a", "type_b").agg(
        F.max("h").alias("h_k"), F.count(F.lit(1)).alias("k_used")
    )
    sa = state.select(F.col("event_type").alias("type_a"), F.col("h").alias("h"))
    sb = state.select(F.col("event_type").alias("type_b"), F.col("h").alias("h"))
    shared = (
        uk.join(sa, ["type_a", "h"])
        .join(sb, ["type_b", "h"])
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    union_est = F.when(
        F.col("k_used") < KMV_K, F.col("k_used").cast("double")
    ).otherwise(F.lit(float(KMV_K - 1)) * F.lit(_KMV_M) / F.col("h_k"))
    j = F.coalesce(F.col("n_shared"), F.lit(0)) / F.col("k_used")
    return (
        kth.join(shared, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.col("k_used").cast("long").alias("k_used"),
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
            F.round(j, 6).alias("jaccard_est"),
            F.round(j * union_est, 2).alias("est_common_users"),
        )
    )
