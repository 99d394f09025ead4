"""BPE trainer: the wrapped-string replace trick vs the textbook greedy
merger, the Spark trainer vs a pure-Python reference, and token-count
accounting invariants."""

import collections

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vectordb_from_scratch_spark.operators import bpe


# --- pure-Python reference (textbook Sennrich BPE) ---------------------------


def greedy_merge(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def python_bpe(word_freqs: dict[str, int], n_merges: int):
    syms = {w: tuple(w) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = collections.Counter()
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (l, r), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, n))
        syms = {w: greedy_merge(s, l, r) for w, s in syms.items()}
    return merges, syms


def wrap(syms) -> str:
    return "".join(bpe.SEP + s + bpe.SEP for s in syms)


def replace_merge(s: str, left: str, right: str) -> str:
    """The engine's merge: str.replace == SQL replace (leftmost,
    non-overlapping) on the wrapped representation."""
    pat = bpe.SEP + left + bpe.SEP + bpe.SEP + right + bpe.SEP
    rep = bpe.SEP + left + right + bpe.SEP
    return s.replace(pat, rep)


# --- the representation trick is exact ---------------------------------------


@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8), min_size=1, max_size=12
    ),
    n_merges=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=300, deadline=None)
def test_wrapped_replace_equals_greedy_merge(words, n_merges):
    """Over a 2-letter alphabet (maximal overlap pressure: runs like
    'aaaa', merge results that re-enter later rounds), replaying the
    reference trainer's merge sequence through the wrapped-string
    replace lands on identical symbol sequences every round."""
    freqs = collections.Counter(words)
    merges, final_syms = python_bpe(dict(freqs), n_merges)
    wrapped = {w: wrap(tuple(w)) for w in freqs}
    for _, l, r, _ in merges:
        wrapped = {w: replace_merge(s, l, r) for w, s in wrapped.items()}
    for w in freqs:
        got = tuple(x for x in wrapped[w].split(bpe.SEP) if x)
        assert got == final_syms[w], (w, got, final_syms[w])


def test_back_to_back_runs_merge_pairwise():
    """'aaaa' under merge (a,a) must become [aa, aa], not [aa, a, a] —
    the shared-separator bug the double-wrapping exists to prevent."""
    s = wrap(tuple("aaaa"))
    out = replace_merge(s, "a", "a")
    assert tuple(x for x in out.split(bpe.SEP) if x) == ("aa", "aa")
    # odd run: leftover single survives
    s3 = replace_merge(wrap(tuple("aaa")), "a", "a")
    assert tuple(x for x in s3.split(bpe.SEP) if x) == ("aa", "a")


# --- the driver-side incremental trainer vs the reference --------------------


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=10), min_size=1, max_size=24
    ),
    n_merges=st.integers(min_value=1, max_value=50),
)
@settings(max_examples=300, deadline=None)
def test_incremental_trainer_equals_textbook(words, n_merges):
    """`train_merges_local` (lazy-deletion heap, per-word incremental
    pair updates — the 1k-merge production loop) must land on the EXACT
    merge sequence of the O(n·rounds) full-recount textbook trainer:
    same pairs, same counts, same tie-breaks, same exhaustion point."""
    freqs = collections.Counter(words)
    want, _ = python_bpe(dict(freqs), n_merges)
    got = bpe.train_merges_local(sorted(freqs.items()), n_merges)
    assert got == want


@given(
    words=st.lists(
        st.text(alphabet=" ab.'0", min_size=1, max_size=12),
        min_size=1,
        max_size=24,
    ),
    n_merges=st.integers(min_value=1, max_value=1000),
)
@settings(max_examples=200, deadline=None)
def test_trainer_equivalence_on_pretoken_shaped_symbols(words, n_merges):
    """The GPT-2-regex pre-token variant (r10) feeds the trainer tokens
    that CONTAIN leading spaces, apostrophes, digits and punctuation —
    symbol material the whitespace tokenizer could never produce. The
    heap trainer must still equal the textbook recount trainer on such
    tables, through budgets past exhaustion (the registered query's 1k
    regime): same merges, same counts, same tie order, same stop."""
    freqs = collections.Counter(words)
    want, _ = python_bpe(dict(freqs), n_merges)
    got = bpe.train_merges_local(sorted(freqs.items()), n_merges)
    assert got == want


@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=12), min_size=1, max_size=16
    ),
    word=st.text(alphabet="ab", min_size=1, max_size=16),
    n_merges=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=300, deadline=None)
def test_rank_priority_encode_equals_replay_chain(words, word, n_merges):
    """`encode_word_local` (lowest-rank-present loop) == replaying the
    whole merge list in rank order — including for words NEVER seen in
    training (the new-corpus serving case). The 2-letter alphabet keeps
    overlap/run pressure maximal."""
    freqs = collections.Counter(words)
    merges, _ = python_bpe(dict(freqs), n_merges)
    syms = tuple(word)
    for _, l, r, _ in merges:
        syms = greedy_merge(syms, l, r)
    rank_of = {(l, r): rank for rank, l, r, _ in merges}
    assert tuple(bpe.encode_word_local(word, rank_of)) == syms


# --- Spark trainer vs the reference ------------------------------------------


def test_spark_trainer_matches_python_reference(spark, tmp_path):
    """An adversarial mini-corpus (runs, ties, merge results that feed
    later merges) through the real Spark trainer equals python_bpe."""
    docs = [
        "aaaa aab abab abab",
        "banana bandana aaaa",
        "aab abab banana banana",
    ]
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "lang": ["en"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(t) for t in docs],
        }
    )
    d = tmp_path / "bpedata"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    freqs = collections.Counter(w for t in docs for w in t.split() if w)
    expected, _ = python_bpe(dict(freqs), 8)
    got = bpe.train_merges(spark, str(d), n_merges=8)
    assert got == expected
    # route equality: the retired per-round Spark trainer (kept as the
    # distributed cross-check) lands on the identical merge sequence
    assert bpe.train_merges_rounds(spark, str(d), n_merges=8) == expected


def test_mid_oracle_safe_chain_both_regimes(spark, tmp_path):
    """The 96-round exhaustion-safe CTE chain must equal the trainer in
    BOTH regimes on the same corpus family: a corpus whose merge
    capacity exceeds the budget (all 96 rounds merge) — the regime the
    fixture never exercises — checked here directly against DuckDB."""
    import duckdb
    import pandas as pd

    docs = [
        " ".join(f"w{i}abcdefghij{i % 7}" for i in range(j, j + 8))
        for j in range(0, 40, 8)
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "lang": ["en"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(t) for t in docs],
        }
    )
    d = tmp_path / "bpemid"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")
    got = bpe.train_merges(spark, str(d), n_merges=bpe.BPE_MID_MERGES)
    assert len(got) == bpe.BPE_MID_MERGES  # capacity >> budget: no break
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    want = [
        (r[0], r[1], r[2], r[4])
        for r in con.execute(bpe._BPE_MERGES_MID_SQL).fetchall()
    ]
    assert [(rk, l, r, n) for rk, l, r, n in got] == want


def test_big_budget_trains_to_exhaustion(spark, sf_small):
    """The closed-form contract behind text_bpe_token_counts_big's
    oracle, asserted directly: under BPE_BIG_MERGES the trainer
    exhausts the fixture corpus (strictly fewer merges than budget; the
    pair table emptied) and every document's token count collapses to
    its word count through the rank-priority encoder."""
    merges = bpe.train_merges(spark, sf_small, n_merges=bpe.BPE_BIG_MERGES)
    assert 0 < len(merges) < bpe.BPE_BIG_MERGES
    rows = bpe.text_bpe_token_counts_big(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r["bpe_tokens"] == r["n_words"]


def test_token_counts_invariants(spark, sf_small):
    rows = {
        r["doc_id"]: r
        for r in bpe.text_bpe_token_counts(spark, sf_small).collect()
    }
    assert rows
    for r in rows.values():
        # merging only ever shrinks: words <= tokens <= chars
        assert r["n_words"] <= r["bpe_tokens"] <= r["n_chars"]
        assert r["chars_per_token"] == pytest.approx(
            r["n_chars"] / r["bpe_tokens"], abs=1e-6
        )
    # the trained merges actually compress the corpus somewhere
    assert any(r["bpe_tokens"] < r["n_chars"] for r in rows.values())
