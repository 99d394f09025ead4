"""Exact-substring dedup (duplicated-span coverage + span cutting).

The oracle-parity suite already proves Spark == DuckDB for the two
registered queries; these tests prove both engines compute the RIGHT
thing, via an independent brute-force reference over adversarial
synthetic corpora (overlapping spans, a fully-duplicated doc, sub-k
docs, within-doc-only repeats that must NOT count)."""

from __future__ import annotations

import hashlib

import pytest

from vectordb_from_scratch_spark.operators.dedup import (
    DUPSPAN_K,
    cut_dup_spans,
    span_coverage,
)

# Corpus notes:
# - d1 and d2 share the 7-token run "a b c d e f g" (cross-doc dup).
# - d3 repeats a 5-token run WITHIN itself only -> must not count.
# - d4 is a verbatim copy of d5 (full coverage both).
# - d6 has 4 tokens (< k) -> no shingles, coverage 0.
# - d1's tail "x y z w v" is unique -> stays uncovered.
_DOCS = [
    (1, "a b c d e f g x y z w v"),
    (2, "q q q a b c d e f g r r"),
    (3, "m n o p s m n o p s t u"),
    (4, "h i j k l h i j k l h i"),
    (5, "h i j k l h i j k l h i"),
    (6, "s h o r"),
]


def _brute(docs, k=DUPSPAN_K):
    toks = {d: t.split() for d, t in docs}
    from collections import defaultdict

    owners = defaultdict(set)
    for d, ws in toks.items():
        for p in range(len(ws) - k + 1):
            owners[" ".join(ws[p : p + k])].add(d)
    out = {}
    for d, ws in toks.items():
        covered = set()
        spans = 0
        for p in range(len(ws) - k + 1):
            if len(owners[" ".join(ws[p : p + k])]) >= 2:
                spans += 1
                covered.update(range(p, p + k))
        kept = [w for i, w in enumerate(ws) if i not in covered]
        out[d] = {
            "n_tokens": len(ws),
            "n_dup_spans": spans,
            "covered_tokens": len(covered),
            "dup_coverage": round(len(covered) / len(ws), 6),
            "kept_tokens": len(kept),
            "clean_md5": hashlib.md5(" ".join(kept).encode()).hexdigest(),
        }
    return out


@pytest.fixture(scope="module")
def synth(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_span_coverage_matches_bruteforce(spark, synth):
    got = {r["doc_id"]: r.asDict() for r in span_coverage(synth).collect()}
    want = _brute(_DOCS)
    assert set(got) == set(want)
    for d in want:
        for col in ("n_tokens", "n_dup_spans", "covered_tokens", "dup_coverage"):
            assert got[d][col] == want[d][col], (d, col, got[d], want[d])


def test_cut_spans_matches_bruteforce(spark, synth):
    got = {r["doc_id"]: r.asDict() for r in cut_dup_spans(synth).collect()}
    want = _brute(_DOCS)
    for d in want:
        assert got[d]["kept_tokens"] == want[d]["kept_tokens"], (d, got[d])
        assert got[d]["clean_md5"] == want[d]["clean_md5"], (d, got[d])


def test_semantics_pinned(spark, synth):
    """The contract cases the corpus was built to pin down."""
    cov = {r["doc_id"]: r.asDict() for r in span_coverage(synth).collect()}
    # within-doc-only repetition does not count as duplication
    assert cov[3]["covered_tokens"] == 0
    # verbatim cross-doc copies are fully covered and clean to ''
    assert cov[4]["dup_coverage"] == 1.0 and cov[5]["dup_coverage"] == 1.0
    cut = {r["doc_id"]: r.asDict() for r in cut_dup_spans(synth).collect()}
    assert cut[4]["kept_tokens"] == 0
    assert cut[4]["clean_md5"] == hashlib.md5(b"").hexdigest()
    # sub-k docs produce no shingles and keep everything
    assert cov[6]["n_dup_spans"] == 0 and cut[6]["kept_tokens"] == 4
    # the shared run plus unique tail: covered == run length exactly
    assert cov[1]["covered_tokens"] == 7 and cov[1]["n_dup_spans"] == 3


def test_overlapping_spans_union_not_sum(spark):
    """Two overlapping duplicated spans must union (gaps-and-islands),
    not double-count: doc A shares tokens 1-5 with B and 2-6 with C."""
    docs = [
        (1, "t1 t2 t3 t4 t5 t6 zz yy xx ww vv uu"),
        (2, "aa bb t1 t2 t3 t4 t5 cc dd ee ff gg"),
        (3, "hh ii t2 t3 t4 t5 t6 jj kk ll mm nn"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cov = {r["doc_id"]: r.asDict() for r in span_coverage(df).collect()}
    # doc 1: spans at p=1 and p=2 union to tokens 1..6 -> 6, not 10
    assert cov[1]["covered_tokens"] == 6
    assert cov[1]["n_dup_spans"] == 2
