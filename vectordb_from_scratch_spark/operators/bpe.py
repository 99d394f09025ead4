"""In-engine BPE tokenizer training (Sennrich et al. 2016) over the
``documents`` corpus — the subword-vocabulary step every LLM data pipeline
runs before token counting, packing, or dedup-by-token.

The reference has no tokenizer surface (its only text op is Cohere
embedding calls, /root/reference/app/api/routes/embed.py); this is a
north-star extension in the `text_*` family discipline: exact integer
arithmetic end to end, the ENTIRE training loop replayed by a DuckDB
unrolled MATERIALIZED-CTE oracle.

Algorithm (classic corpus-frequency BPE):
  1. word frequencies — one corpus scan, map-side combinable;
  2. each word starts as its character sequence;
  3. per round: count adjacent symbol pairs weighted by word frequency
     (overlaps counted, the textbook rule), take the global argmax with
     the pinned tie-break (count DESC, left ASC, right ASC), merge every
     occurrence greedy-left-to-right, repeat.

Scale shape: after round 0 ALL work runs over the DISTINCT-WORD table
(Heaps' law: sublinear in corpus size — the reason word-level BPE
training is tractable at 100 TB while corpus-level scans per round are
not). Each round is one pair-count aggregate (map-side combine on the
vocab's own partitioning) + a 1-row global argmax (TakeOrderedAndProject)
+ one projection; the argmax row is the only driver materialization
(scalar-stats class, bounded at 1 row/round).

The greedy merge itself is a single ``replace`` over a separator-wrapped
symbol string: a word's symbols are stored as ``⟂s1⟂⟂s2⟂…⟂sk⟂``
(⟂ = US, chr(31), outside the corpus alphabet), and merging pair (L, R)
is ``replace(s, '⟂L⟂⟂R⟂', '⟂LR⟂')``. Because every symbol carries its
own ⟂…⟂ wrapper, the pattern can only match whole symbols (no
mid-symbol false hits), and left-to-right non-overlapping `replace`
semantics — identical in Spark and DuckDB — are exactly BPE's greedy
merge, including back-to-back merges in runs like ``aaaa`` → ``aa aa``
(each match consumes only its own wrappers, never a shared separator).
``tests/test_bpe.py`` pins this equivalence against a pure-Python
tokenizer under hypothesis-generated adversarial corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.functions import texthash
from vectordb_from_scratch_spark.registry import register, track_persist
from vectordb_from_scratch_spark.session import load_table

#: merge rounds learned / replayed by the oracle (bounded CTE unroll).
BPE_MERGES = 10

#: symbol separator — ASCII unit separator, not producible by the
#: whitespace tokenizer (texthash.words) from any real corpus byte we
#: tokenize here; symbols therefore never contain it.
SEP = "\x1f"

#: per-(applicationId, sf_dir) trained merge tables, shared by the
#: registered queries (train once per session per fixture — same
#: key contract as graph._EDGES_CACHE: the applicationId component
#: invalidates the cache when a new Spark app reuses a fixture path,
#: ADVICE r8).
_MERGE_CACHE: dict[tuple[str, str, int], list[tuple[int, str, str, int]]] = {}


def wrap_word(word: Column | str) -> Column:
    """``abc`` → ``⟂a⟂⟂b⟂⟂c⟂``: every char individually ⟂-wrapped.

    Built as ⟂ + per-char ``c⟂⟂`` (global regexp_replace) minus the one
    surplus trailing ⟂ — the same expression the oracle uses
    (``left(chr(31) || regexp_replace(word,'([\\s\\S])','\\1'||…, 'g'), -1)``).

    The capture class is an explicit any-char ``[\\s\\S]``, NOT ``.``:
    the engines disagree on what ``.`` excludes (Java regex drops
    ``\\r``/``\\u0085``/``\\u2028``/``\\u2029``, DuckDB's RE2 drops only
    ``\\n`` — ADVICE r8), so a CR or Unicode line separator inside a
    space-delimited word would silently fuse with its neighbor in one
    engine and not the other. ``[\\s\\S]`` wraps EVERY char (newlines
    included) identically in both.
    """
    word = F.col(word) if isinstance(word, str) else word
    s = F.concat(F.lit(SEP), F.regexp_replace(word, "([\\s\\S])", "$1" + SEP + SEP))
    return s.substr(F.lit(1), F.length(s) - 1)


def symbols(s: Column | str) -> Column:
    """Wrapped string back to its symbol array (split on ⟂, drop empties
    — mirrors ``list_filter(string_split(s, chr(31)), x -> x != '')``)."""
    s = F.col(s) if isinstance(s, str) else s
    return F.filter(F.split(s, SEP), lambda x: x != "")


def merge_pair(s: Column, left: str, right: str) -> Column:
    """One greedy-left-to-right BPE merge as a literal string replace."""
    pat = SEP + left + SEP + SEP + right + SEP
    rep = SEP + left + right + SEP
    return F.replace(s, F.lit(pat), F.lit(rep))


def word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq, s) — the distinct-word training table with each word
    pre-wrapped into its initial character-symbol string."""
    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(texthash.words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return wf.withColumn("s", wrap_word("word"))


#: GPT-2-style pre-tokenization regex, RE2-safe (r10, VERDICT r9 #7): the
#: original GPT-2 pattern's trailing-space lookahead ``\s+(?!\S)`` is a
#: Java-only feature, so this variant drops it — contractions, then
#: space-prefixed letter runs, digit runs, punctuation runs, then
#: whitespace runs. Both engines support the char classes (Java regex and
#: RE2 agree on \p{L}/\p{N} for this ASCII corpus), so the SAME literal
#: drives Spark's regexp_extract_all and DuckDB's. Precondition shared
#: with the whitespace trainer: the corpus must not contain the \x1f
#: symbol separator (a pre-token would smuggle it into a symbol).
BPE_PRETOK_RE = "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"


def pretoken_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq, s) — the distinct PRE-TOKEN training table: the
    byte-pair trainer's input when tokenization follows the GPT-2 regex
    discipline (space-prefixed word pieces) instead of whitespace words.
    Same downstream shape as :func:`word_frequencies`; only the
    pre-tokenizer differs — which changes the distinct-"word" table
    (tokens carry their leading space) but not the merge loop."""
    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select(
            F.explode(
                F.regexp_extract_all("text", F.lit(BPE_PRETOK_RE), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return wf.withColumn("s", wrap_word("word"))


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the current symbol strings.

    zip_with over two shifted slices (the text_ngram_freq bigram trick)
    builds the pair stream without a posexplode self-join; single-symbol
    words contribute an empty array and drop out of the explode."""
    ss = symbols("s")
    k = F.greatest(F.size(ss) - 1, F.lit(0))
    prs = F.zip_with(
        F.slice(ss, 1, k),
        F.slice(ss, 2, k),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        words.select("freq", F.explode(prs).alias("p"))
        .select("freq", "p.l", "p.r")
        .groupBy("l", "r")
        .agg(F.sum("freq").alias("n"))
    )


#: driver-side training vocabulary bound (VERDICT r8 #3, the
#: train_centroids sample discipline): the merge loop runs over the TOP
#: ``BPE_TRAIN_WORDS`` words by (freq DESC, word ASC) — at web scale the
#: frequency head carries essentially all pair mass (Zipf), and the
#: bound keeps the collected table broadcast-class. Fixture vocabularies
#: (≤ tens of thousands of words) sit far below it, so the trained
#: merges equal full-vocabulary training there — which is what the
#: unrolled-CTE oracle replays.
BPE_TRAIN_WORDS = 1 << 18

#: the production merge budget (VERDICT r8 #3: past the 10-merge toy
#: ceiling). At fixture scale this budget exhausts the corpus — every
#: pair eventually merges and each known word collapses to ONE token —
#: which is exactly what `text_bpe_token_counts_big`'s closed-form
#: oracle pins end to end.
BPE_BIG_MERGES = 1024


def _greedy_merge_syms(syms: list[str], left: str, right: str) -> list[str]:
    """One merge over a symbol list, leftmost-first non-overlapping —
    the in-memory twin of the wrapped-string ``replace`` (pinned equal
    by tests/test_bpe.py's hypothesis suite)."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_merges_local(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Exact BPE training over an in-memory (word, freq) table —
    the driver-side merge loop (VERDICT r8 #3: the ``train_centroids``
    precedent — distributed corpus aggregation, bounded-state driver
    iteration). Semantics are IDENTICAL to the r8 per-round Spark
    aggregates: adjacent pairs weighted by word frequency, overlaps
    counted, argmax tie-break (count DESC, left ASC, right ASC),
    greedy leftmost merges — pinned by the 10-merge unrolled-CTE
    oracle replay and a hypothesis equivalence suite vs the textbook
    reference trainer.

    Cost shape: per merge, only the pairs TOUCHING a merge site update
    (positional diff — ~5 dict ops per occurrence instead of two full
    word recounts), and the lazy max-heap never pushes on decrements
    (a popped stale-high entry re-pushes at its current count, so the
    "heap holds an entry ≥ every live count" invariant is maintained
    with one push per INCREMENT only). 1024 merges over a 262k-word
    collected vocabulary run in tens of seconds driver-side — vs the
    1k Spark jobs the r8 round loop would have paid (SCALE.md r9)."""
    import heapq
    from sys import intern

    words: list[tuple[list[str], int]] = [
        ([intern(c) for c in w], int(f)) for w, f in word_freqs
    ]
    counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, f) in enumerate(words):
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + f
            s = pair_words.get(p)
            if s is None:
                pair_words[p] = s = set()
            s.add(idx)
    heap = [(-n, p[0], p[1]) for p, n in counts.items()]
    heapq.heapify(heap)
    push, pop = heapq.heappush, heapq.heappop
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        # pop to the first entry whose count is CURRENT: increments
        # push a fresh entry (leaving the older, now stale-LOW copies
        # behind) and decrements push nothing (leaving stale-HIGH
        # entries), so a mismatched top in EITHER direction re-enters
        # at its true count and the loop converges on the exact argmax
        # with the exact tie order (count DESC, l ASC, r ASC)
        while heap:
            nn, l, r = heap[0]
            cur = counts.get((l, r), 0)
            if cur <= 0:
                pop(heap)
            elif cur != -nn:
                pop(heap)
                push(heap, (-cur, l, r))
            else:
                break
        if not heap:
            break  # alphabet exhausted — every word fully merged
        nn, l, r = pop(heap)
        pair = (l, r)
        merges.append((rank, l, r, -nn))
        counts.pop(pair, None)
        t = intern(l + r)
        for idx in pair_words.pop(pair, ()):
            syms, f = words[idx]
            n = len(syms)
            out: list[str] = []
            dest: set[int] = set()  # OLD pair indices destroyed
            newpos: list[int] = []  # positions of t in the new word
            i = 0
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    if i > 0:
                        dest.add(i - 1)
                    dest.add(i)
                    if i + 2 < n:
                        dest.add(i + 1)
                    newpos.append(len(out))
                    out.append(t)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            if not newpos:
                continue  # stale membership — pair already gone here
            for j in dest:
                p = (syms[j], syms[j + 1])
                c = counts.get(p)
                if c is not None:
                    counts[p] = c - f  # decrements never push
            created: set[int] = set()
            for q in newpos:
                if q > 0:
                    created.add(q - 1)
                if q + 1 < len(out):
                    created.add(q)
            for j in created:
                p = (out[j], out[j + 1])
                c = counts.get(p, 0) + f
                counts[p] = c
                push(heap, (-c, p[0], p[1]))
                s = pair_words.get(p)
                if s is None:
                    pair_words[p] = s = set()
                s.add(idx)
            words[idx] = (out, f)
    return merges


def train_merges(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = BPE_MERGES,
    pretok: bool = False,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(rank, left, right, count)].
    ``pretok=True`` trains over the GPT-2-regex pre-token table
    (:func:`pretoken_frequencies`) instead of whitespace words.

    One distributed corpus aggregation (``word_frequencies`` — the only
    pass that touches the corpus), one bounded collect (top
    ``BPE_TRAIN_WORDS`` by (freq DESC, word ASC) — broadcast-class), then
    the exact driver-side merge loop. The r8 form ran one pair-count
    Spark aggregate + argmax PER ROUND — fine at 10 merges, a 1000-job
    serialization at a real vocabulary size; the word-count table is the
    bounded state the whole loop needs (VERDICT r8 #3)."""
    key = (spark.sparkContext.applicationId, str(sf_dir), int(n_merges), pretok)
    if key in _MERGE_CACHE:
        return _MERGE_CACHE[key]
    wf = (
        (pretoken_frequencies if pretok else word_frequencies)(spark, sf_dir)
        .select("word", "freq")
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(BPE_TRAIN_WORDS)
        .collect()
    )
    if len(wf) >= BPE_TRAIN_WORDS:
        # The DuckDB oracles for the small-budget queries train on the
        # FULL vocabulary; hitting the cap means trainer and oracle now
        # see different word tables, so an eventual hash mismatch must be
        # diagnosable as THIS truncation, not chased as a merge-loop bug
        # (ADVICE r9). The cap itself stays: at web scale the sub-head
        # tail can't change the first n_merges argmaxes it's meant for.
        import warnings

        warnings.warn(
            f"BPE training vocabulary truncated to BPE_TRAIN_WORDS="
            f"{BPE_TRAIN_WORDS}; the small-budget oracle contract "
            f"(full-vocabulary replay) no longer holds for {sf_dir}",
            stacklevel=2,
        )
    merges = train_merges_local([(r["word"], r["freq"]) for r in wf], n_merges)
    _MERGE_CACHE[key] = merges
    return merges


def train_merges_rounds(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> list[tuple[int, str, str, int]]:
    """The r8 per-round distributed trainer, kept as the semantic
    cross-check for :func:`train_merges` (tests pin route equality):
    each round is one pair-count aggregate over the distinct-word table
    + a 1-row argmax collect + one replace projection."""
    wf = track_persist(word_frequencies(spark, sf_dir))
    # size the iteration state to the measured vocabulary: the corpus agg
    # runs wide, but rounds of tiny aggregates over a 31-row table in
    # 32 shuffle partitions is pure task-scheduling overhead (measured
    # 11.1s → 3.4s at sf0.1). ~64k words per partition keeps single-task
    # rounds at fixture scale and wide rounds at web-scale vocabularies.
    n_vocab = wf.count()
    words = wf.coalesce(max(1, min(32, n_vocab // 65536 + 1)))
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:  # alphabet exhausted — every word fully merged
            break
        row = best[0]
        merges.append((rank, row["l"], row["r"], int(row["n"])))
        words = words.withColumn("s", merge_pair(F.col("s"), row["l"], row["r"]))
        if rank % 4 == 0 and rank < n_merges:
            words = track_persist(words)
    return merges


def apply_merges(s: Column, merges: list[tuple[int, str, str, int]]) -> Column:
    """Encode: replay the learned merges in rank order as one chained
    projection (each rank one literal replace — pure codegen, no UDF).
    Right for SMALL merge tables (the 10-merge oracled family): the
    expression tree is O(merges) deep. Past that, use
    :func:`encode_token_counts` (rank-priority, O(present pairs))."""
    for _, left, right, _ in merges:
        s = merge_pair(s, left, right)
    return s


def encode_word_local(word: str, rank_of: dict) -> list[str]:
    """Rank-priority BPE encoding of one word: repeatedly merge the
    LOWEST-rank adjacent pair present (all its occurrences, leftmost
    first). Provably identical to replaying the full merge list in rank
    order — a merge can only create pairs involving its brand-new token,
    which no earlier-rank rule references — while costing O(pairs
    present), not O(vocabulary) (VERDICT r8 #3; the hypothesis suite
    pins the equality against the replay chain)."""
    syms = list(word)
    while len(syms) > 1:
        best = None
        for p in zip(syms, syms[1:]):
            rk = rank_of.get(p)
            if rk is not None and (best is None or rk < best[0]):
                best = (rk, p)
        if best is None:
            break
        syms = _greedy_merge_syms(syms, *best[1])
    return syms


def encode_token_counts(
    words: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """(word, n_tokens) under rank-priority encoding — the scale path
    for big merge tables: one Arrow ``mapInPandas`` pass over the
    DISTINCT-WORD table (Heaps-law sublinear in corpus size), the merge
    ranks riding the closure as a dict (1k merges ≈ 50 KB; a 32k-merge
    production vocabulary would move to an explicit broadcast
    variable). No shuffle beyond the distinct-word aggregate the caller
    already paid."""
    from typing import Iterator

    import pandas as pd

    rank_of = {(l, r): rank for rank, l, r, _ in merges}

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_tokens": [
                        len(encode_word_local(w, rank_of)) for w in pdf["word"]
                    ],
                }
            )

    return words.select("word").mapInPandas(enc, schema="word string, n_tokens long")


# --- oracle: the training loop as an unrolled MATERIALIZED-CTE chain --------
#
# MATERIALIZED because s{i} is referenced by both p{i+1} and s{i+1}; without
# it DuckDB inlines the replace chain twice per round (2^N blowup). The
# final SELECT unions the N 1-row argmax CTEs.


#: the whitespace pre-tokenizer's wf CTE body (the r8 original); the
#: regex-pre-token variant swaps only this CTE and reuses the whole chain
_WF_WHITESPACE_SQL = (
    "SELECT w AS word, count(*)::BIGINT AS freq "
    "FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS w "
    "FROM documents) GROUP BY w"
)

_WF_PRETOK_SQL = (
    "SELECT w AS word, count(*)::BIGINT AS freq "
    "FROM (SELECT unnest(regexp_extract_all(text, '"
    + BPE_PRETOK_RE.replace("'", "''")
    + "')) AS w FROM documents) GROUP BY w"
)


def _bpe_cte_chain(n_merges: int, wf_sql: str = _WF_WHITESPACE_SQL) -> str:
    S = "chr(31)"
    ctes = [
        f"wf AS MATERIALIZED ({wf_sql})",
        f"s0 AS MATERIALIZED (SELECT word, freq, "
        f"left({S} || regexp_replace(word, '([\\s\\S])', '\\1' || {S} || {S}, 'g'), -1) AS s "
        f"FROM wf)",
    ]
    for i in range(1, n_merges + 1):
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT ss[i] AS l, ss[i+1] AS r, "
            f"sum(freq)::BIGINT AS n "
            f"FROM (SELECT freq, list_filter(string_split(s, {S}), x -> x != '') AS ss "
            f"FROM s{i - 1}), unnest(range(1, len(ss))) AS u(i) GROUP BY 1, 2)"
        )
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT {i}::BIGINT AS rank, l, r, n FROM p{i} "
            f"ORDER BY n DESC, l ASC, r ASC LIMIT 1)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT word, freq, "
            f"replace(s, {S} || m.l || {S} || {S} || m.r || {S}, "
            f"{S} || m.l || m.r || {S}) AS s FROM s{i - 1} CROSS JOIN m{i} m)"
        )
    return ",\n".join(ctes)


_BPE_MERGES_SQL = (
    "WITH "
    + _bpe_cte_chain(BPE_MERGES)
    + "\nSELECT rank, lhs, rhs, lhs || rhs AS new_token, pair_count FROM ("
    + " UNION ALL ".join(
        f"SELECT rank, l AS lhs, r AS rhs, n AS pair_count FROM m{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    + ") ORDER BY rank"
)


@register("text_bpe_merges", _BPE_MERGES_SQL)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: (rank, lhs, rhs, new_token, pair_count).

    FULL value oracle — DuckDB re-runs the entire training loop (pair
    counts, argmax tie-breaks, greedy merges) via the unrolled CTE chain
    and must land on the identical ten merges with identical weighted
    counts."""
    merges = train_merges(spark, sf_dir)
    rows = [
        (rank, left, right, left + right, n) for rank, left, right, n in merges
    ]
    return spark.createDataFrame(
        rows, "rank bigint, lhs string, rhs string, new_token string, pair_count bigint"
    )


_BPE_PRETOK_MERGES_SQL = (
    "WITH "
    + _bpe_cte_chain(BPE_MERGES, wf_sql=_WF_PRETOK_SQL)
    + "\nSELECT rank, lhs, rhs, lhs || rhs AS new_token, pair_count FROM ("
    + " UNION ALL ".join(
        f"SELECT rank, l AS lhs, r AS rhs, n AS pair_count FROM m{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    + ") ORDER BY rank"
)


@register("text_bpe_merges_pretok", _BPE_PRETOK_MERGES_SQL)
def text_bpe_merges_pretok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge table trained over GPT-2-REGEX pre-tokens (VERDICT r9
    #7): real pipelines split on a pre-tokenization regex and merge
    within the resulting space-prefixed pieces, not within whitespace
    words. The distinct-"word" table changes (pieces carry their leading
    space, whitespace runs become trainable tokens); the merge-loop
    discipline, tie order, and the unrolled CTE-replay oracle are the
    whitespace trainer's, byte for byte — DuckDB re-runs the identical
    regex via its own regexp_extract_all and must land on the identical
    ten merges. Char-level symbols stand in for GPT-2's bytes (this
    corpus is single-byte); the wrap/split machinery is byte-agnostic."""
    merges = train_merges(spark, sf_dir, pretok=True)
    rows = [
        (rank, left, right, left + right, n) for rank, left, right, n in merges
    ]
    return spark.createDataFrame(
        rows, "rank bigint, lhs string, rhs string, new_token string, pair_count bigint"
    )


_BPE_TOKENS_SQL = (
    "WITH "
    + _bpe_cte_chain(BPE_MERGES)
    + f""",
vt AS (SELECT word,
              len(list_filter(string_split(s, chr(31)), x -> x != ''))::BIGINT AS n_tokens
       FROM s{BPE_MERGES}),
dw AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS word
       FROM documents)
SELECT dw.doc_id,
       count(*)::BIGINT AS n_words,
       sum(length(word))::BIGINT AS n_chars,
       sum(n_tokens)::BIGINT AS bpe_tokens,
       round(sum(length(word)) * 1.0 / sum(n_tokens), 6) AS chars_per_token
FROM dw JOIN vt USING (word)
GROUP BY dw.doc_id
"""
)


@register("text_bpe_token_counts", _BPE_TOKENS_SQL)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token accounting under the trained vocabulary —
    the number that prices a document into a token budget (packing,
    billing, mixture weights all key off it).

    Encoding = the train-time merge chain replayed as ONE projection of
    ten literal replaces over the wrapped word (pure codegen, no UDF,
    no per-round shuffle), counted per distinct word, then joined back
    onto the corpus word stream (vocab-sized broadcast at fixture scale;
    the join is (word)-keyed co-partitionable past broadcast size). The
    oracle replays training AND encoding from scratch."""
    merges = train_merges(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    vocab = word_frequencies(spark, sf_dir).select(
        "word", F.size(symbols(apply_merges(F.col("s"), merges))).cast("bigint").alias("n_tokens")
    )
    from vectordb_from_scratch_spark.operators.textstats import vocab_join

    dw = d.select("doc_id", F.explode(texthash.words("text")).alias("word"))
    return (
        vocab_join(dw, vocab, "word", sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_tokens").alias("bpe_tokens"),
            F.round(
                F.sum(F.length("word")) / F.sum("n_tokens"), 6
            ).alias("chars_per_token"),
        )
        .select(
            "doc_id",
            F.col("n_words").cast("bigint"),
            F.col("n_chars").cast("bigint"),
            F.col("bpe_tokens").cast("bigint"),
            "chars_per_token",
        )
    )


# --- deep oracle replay: exhaustion-safe CTE chain ----------------------------

#: merge budget for the DEEP value-oracled table: ~10× the r8 replay
#: depth, with BOTH engines running exactly this many rounds — the
#: oracle stays correct for ANY corpus (under- or over-exhaustion)
#: because round count, not vocabulary shape, pins the replay length.
BPE_MID_MERGES = 96


def _bpe_cte_chain_safe(n_merges: int) -> str:
    """Like :func:`_bpe_cte_chain` but EXHAUSTION-SAFE: a round whose
    pair table is empty produces an empty ``m{i}``, and ``s{i}`` carries
    the previous state through a LEFT JOIN instead of annihilating it
    (the plain CROSS JOIN form returns zero rows on an empty argmax —
    correct only while merges remain). This is what lets the oracle
    run a FIXED round budget past the corpus's merge capacity and
    still equal the early-breaking trainer."""
    S = "chr(31)"
    ctes = [
        "wf AS MATERIALIZED (SELECT w AS word, count(*)::BIGINT AS freq "
        "FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS w "
        "FROM documents) GROUP BY w)",
        f"s0 AS MATERIALIZED (SELECT word, freq, "
        f"left({S} || regexp_replace(word, '([\\s\\S])', '\\1' || {S} || {S}, 'g'), -1) AS s "
        f"FROM wf)",
    ]
    for i in range(1, n_merges + 1):
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT ss[i] AS l, ss[i+1] AS r, "
            f"sum(freq)::BIGINT AS n "
            f"FROM (SELECT freq, list_filter(string_split(s, {S}), x -> x != '') AS ss "
            f"FROM s{i - 1}), unnest(range(1, len(ss))) AS u(i) GROUP BY 1, 2)"
        )
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT {i}::BIGINT AS rank, l, r, n FROM p{i} "
            f"ORDER BY n DESC, l ASC, r ASC LIMIT 1)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT word, freq, "
            f"CASE WHEN m.l IS NULL THEN s ELSE "
            f"replace(s, {S} || m.l || {S} || {S} || m.r || {S}, "
            f"{S} || m.l || m.r || {S}) END AS s "
            f"FROM s{i - 1} LEFT JOIN m{i} m ON true)"
        )
    return ",\n".join(ctes)


_BPE_MERGES_MID_SQL = (
    "WITH "
    + _bpe_cte_chain_safe(BPE_MID_MERGES)
    + "\nSELECT rank, lhs, rhs, lhs || rhs AS new_token, pair_count FROM ("
    + " UNION ALL ".join(
        f"SELECT rank, l AS lhs, r AS rhs, n AS pair_count FROM m{i}"
        for i in range(1, BPE_MID_MERGES + 1)
    )
    + ") ORDER BY rank"
)


@register("text_bpe_merges_mid", _BPE_MERGES_MID_SQL)
def text_bpe_merges_mid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge table at a 96-round budget with a FULL value oracle —
    ~10× the r8 replay depth, proving the unrolled-CTE discipline holds
    far past the toy ceiling. DuckDB runs ALL 96 rounds of the
    exhaustion-safe chain (empty argmax rounds carry state unchanged),
    so the comparison is exact whether the corpus exhausts early (the
    fixture: 89 merges at sf0.01) or not at all — the round budget,
    not the vocabulary, pins the replay length, which keeps this query
    correct under fixture regeneration."""
    merges = train_merges(spark, sf_dir, n_merges=BPE_MID_MERGES)
    rows = [
        (rank, left, right, left + right, n) for rank, left, right, n in merges
    ]
    return spark.createDataFrame(
        rows, "rank bigint, lhs string, rhs string, new_token string, pair_count bigint"
    )


# --- the production-scale merge budget (1k+ merges) --------------------------


@register("text_bpe_merges_big")  # rows-only: a 1k-round training loop has
# no bounded SQL replay; the 10-merge unrolled-CTE oracle pins the exact
# prefix and the hypothesis suite pins trainer equivalence at this depth
def text_bpe_merges_big(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge table under the production ``BPE_BIG_MERGES`` budget
    (VERDICT r8 #3). Deterministic (same tie-breaks as the oracled
    10-merge table — by construction its first ten rows ARE that
    table); at fixture scale training exhausts (every pair eventually
    merges) well inside the budget, so the row count is the corpus's
    total merge capacity."""
    merges = train_merges(spark, sf_dir, n_merges=BPE_BIG_MERGES)
    rows = [
        (rank, left, right, left + right, n) for rank, left, right, n in merges
    ]
    return spark.createDataFrame(
        rows, "rank bigint, lhs string, rhs string, new_token string, pair_count bigint"
    )


_BPE_TOKENS_BIG_SQL = """
WITH dw AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS word
            FROM documents)
SELECT doc_id,
       count(*)::BIGINT AS n_words,
       sum(length(word))::BIGINT AS n_chars,
       count(*)::BIGINT AS bpe_tokens,
       round(sum(length(word)) * 1.0 / count(*), 6) AS chars_per_token
FROM dw GROUP BY doc_id
"""


@register("text_bpe_token_counts_big", _BPE_TOKENS_BIG_SQL)
def text_bpe_token_counts_big(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token accounting under the ``BPE_BIG_MERGES``
    vocabulary, encoded by the rank-priority kernel
    (:func:`encode_token_counts`) over the distinct-word table.

    Oracle (closed form, and a REAL end-to-end property): a merge
    budget past the corpus's total merge capacity trains to
    exhaustion — the pair table empties only when every training word
    is a single symbol — so every in-vocabulary word encodes to
    EXACTLY ONE token and per-doc ``bpe_tokens`` equals ``n_words``.
    A trainer that stops early, an encoder that misses a rank, or a
    tie-break drift all break the equality. The non-exhausted regime
    (the interesting middle) is pinned by the 10-merge unrolled-CTE
    replay plus the hypothesis equivalence suite (tests/test_bpe.py)."""
    merges = train_merges(spark, sf_dir, n_merges=BPE_BIG_MERGES)
    # The closed-form oracle (bpe_tokens == n_words) is valid ONLY in the
    # exhausted regime: the budget must exceed the corpus's total merge
    # capacity (sum(len(w)-1) over distinct training words) and the
    # trainer must have seen the WHOLE vocabulary. Fail loudly here when
    # a regenerated fixture breaks either precondition, instead of
    # surfacing as an opaque driver hash mismatch (ADVICE r9).
    if len(merges) >= BPE_BIG_MERGES:
        raise AssertionError(
            f"text_bpe_token_counts_big: training consumed the full "
            f"BPE_BIG_MERGES={BPE_BIG_MERGES} budget without exhausting "
            f"the corpus — the bpe_tokens==n_words oracle no longer "
            f"holds; raise the budget or re-oracle"
        )
    d = load_table(spark, sf_dir, "documents")
    vocab = encode_token_counts(word_frequencies(spark, sf_dir), merges)
    from vectordb_from_scratch_spark.operators.textstats import vocab_join

    dw = d.select("doc_id", F.explode(texthash.words("text")).alias("word"))
    return (
        vocab_join(dw, vocab, "word", sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_tokens").alias("bpe_tokens"),
            F.round(F.sum(F.length("word")) / F.sum("n_tokens"), 6).alias(
                "chars_per_token"
            ),
        )
        .select(
            "doc_id",
            F.col("n_words").cast("bigint"),
            F.col("n_chars").cast("bigint"),
            F.col("bpe_tokens").cast("bigint"),
            "chars_per_token",
        )
    )


# --- BPE-priced sequence packing ---------------------------------------------
#
# pipeline_sequence_packing prices documents in whitespace words; real
# packing budgets are MODEL TOKENS. This is the composed form: the same
# contiguous first-fit window arithmetic, priced by the trained BPE
# vocabulary — the handoff between the tokenizer family and the packing
# family, end-to-end value-oracled (the oracle replays training, encoding
# AND packing).

_PACK_BUDGET = 2048
_PACK_SHARDS = 8

_BPE_PACKING_SQL = (
    "WITH "
    + _bpe_cte_chain(BPE_MERGES)
    + f""",
vt AS (SELECT word,
              len(list_filter(string_split(s, chr(31)), x -> x != ''))::BIGINT AS n_tokens
       FROM s{BPE_MERGES}),
dw AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS word
       FROM documents),
d AS (SELECT dw.doc_id, sum(vt.n_tokens)::BIGINT AS n_tokens
      FROM dw JOIN vt USING (word) GROUP BY dw.doc_id),
dd AS (SELECT docs.doc_id, docs.lang, d.n_tokens,
              ({texthash.hash60_sql("CAST(docs.doc_id AS VARCHAR)")} % {_PACK_SHARDS}) AS shard
       FROM documents docs JOIN d ON d.doc_id = docs.doc_id),
runs AS (
  SELECT lang, shard, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS run_total
  FROM dd),
binned AS (
  SELECT lang, shard, doc_id, n_tokens,
         ((run_total - n_tokens) // {_PACK_BUDGET})::BIGINT AS bin
  FROM runs)
SELECT lang, shard::BIGINT AS shard, bin,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens
FROM binned GROUP BY lang, shard, bin
"""
)


@register("pipeline_packing_bpe", _BPE_PACKING_SQL)
def pipeline_packing_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing under the trained BPE vocabulary: per (lang,
    md5-shard), docs in id order accumulate into 2048-BPE-token bins
    (contiguous first-fit — a doc opens the next bin when its START
    offset crosses the budget). Same window arithmetic as
    pipeline_sequence_packing, integer-exact; the token prices come from
    one chained-replace projection over the distinct-word table joined
    back onto the corpus. The shard partition bounds the window — packing
    parallelizes across (lang, shard) instead of serializing on a global
    cumulative sum."""
    from pyspark.sql import Window

    merges = train_merges(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    vocab = word_frequencies(spark, sf_dir).select(
        "word",
        F.size(symbols(apply_merges(F.col("s"), merges))).cast("bigint").alias("n_tokens"),
    )
    from vectordb_from_scratch_spark.operators.textstats import vocab_join

    dw = d.select("doc_id", F.explode(texthash.words("text")).alias("word"))
    per_doc = (
        vocab_join(dw, vocab, "word", sf_dir)
        .groupBy("doc_id")
        .agg(F.sum("n_tokens").cast("long").alias("n_tokens"))
    )
    dd = d.select("doc_id", "lang").join(per_doc, "doc_id").withColumn(
        "shard", texthash.hash60(F.col("doc_id").cast("string")) % _PACK_SHARDS
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = dd.withColumn("run_total", F.sum("n_tokens").over(w)).withColumn(
        "bin", F.expr(f"(run_total - n_tokens) DIV {_PACK_BUDGET}")
    )
    return binned.groupBy(
        "lang", F.col("shard").cast("long").alias("shard"), "bin"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
