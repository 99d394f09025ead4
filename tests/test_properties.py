"""Property-based tests (hypothesis): the engine's kernels against
independent reference implementations on randomized inputs — similarity
metrics vs NumPy, as-of join vs pandas.merge_asof, MinHash banding's
candidate guarantee."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vectordb_from_scratch_spark.functions import linalg
from vectordb_from_scratch_spark.operators.temporal import asof_join

_DIM = 6

vec = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    min_size=_DIM,
    max_size=_DIM,
)


@pytest.fixture(scope="module")
def metric_evaluator(spark):
    """One reusable single-row frame evaluator for metric expressions."""

    def run(a, b):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(a, b)], "a array<double>, b array<double>"
        ).select(
            linalg.cosine(F.col("a"), F.col("b")).alias("cos"),
            linalg.l2_distance(F.col("a"), F.col("b")).alias("l2"),
            linalg.manhattan_distance(F.col("a"), F.col("b")).alias("man"),
        )
        return df.first()

    return run


@given(a=vec, b=vec)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_metrics_match_numpy(metric_evaluator, a, b):
    r = metric_evaluator(a, b)
    na, nb = np.array(a), np.array(b)
    denom = np.linalg.norm(na) * np.linalg.norm(nb)
    exp_cos = 0.0 if denom == 0 else float(na @ nb / denom)  # zero-vector → 0.0
    assert r["cos"] == pytest.approx(exp_cos, abs=1e-9)
    assert r["l2"] == pytest.approx(float(np.linalg.norm(na - nb)), abs=1e-9)
    assert r["man"] == pytest.approx(float(np.abs(na - nb).sum()), abs=1e-9)


@given(
    lefts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=25),
    rights=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=25),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_matches_pandas_merge_asof(spark, lefts, rights):
    # pandas merge_asof requires unique ordering keys per group for a clean
    # comparison: dedupe (key, ts) and keep the max payload id on the right
    ldf = pd.DataFrame(sorted(set(lefts)), columns=["k", "t"])
    rrows = {}
    for i, (k, t) in enumerate(rights):
        rrows[(k, t)] = i
    rdf = pd.DataFrame(
        [(k, t, i) for (k, t), i in sorted(rrows.items())], columns=["k", "t", "rid"]
    )
    sl = spark.createDataFrame(ldf.assign(lid=range(len(ldf))))
    sr = spark.createDataFrame(rdf)
    got = {
        r["lid"]: r["right_rid"]
        for r in asof_join(
            sl, sr, key="k", left_ts="t", right_ts="t", right_cols=["rid"]
        ).collect()
    }
    exp_df = pd.merge_asof(
        ldf.assign(lid=range(len(ldf))).sort_values("t", kind="stable"),
        rdf.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction="backward",
    )
    exp = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid)) for r in exp_df.itertuples()}
    assert got == exp


def test_minhash_band_guarantee(spark):
    """Identical shingle sets ⇒ identical signatures ⇒ ALL bands collide —
    the deterministic end of the LSH guarantee."""
    from vectordb_from_scratch_spark.operators.dedup import (
        N_BANDS,
        minhash_bands,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5"), (2, "w1 w2 w3 w4 w5"), (3, "totally different text here")],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    bands = minhash_bands(minhash_signatures(docs))

    collide = (
        bands.groupBy("band_id", "band_key")
        .agg(F.collect_set("doc_id").alias("members"))
        .filter(F.size("members") > 1)
    )
    rows = collide.collect()
    assert len(rows) == N_BANDS  # docs 1 and 2 collide in every band
    assert all(sorted(r["members"]) == [1, 2] for r in rows)


def test_bloom_decontaminate_superset_and_low_fp(spark, sf_oracle):
    """Bloom decontamination can only ADD hits (false positives), never
    lose one: flagged docs and per-doc shared counts must dominate the
    exact operator's. At fixture load (~15k shingles into 4M bits) the FP
    rate is ~1e-6, so the two answers should in fact be identical."""
    from pyspark.sql import functions as F  # noqa: F401

    from vectordb_from_scratch_spark import registry

    exact = {
        r["doc_id"]: r["n_shared"]
        for r in registry.QUERIES["dedup_decontaminate"](spark, sf_oracle).collect()
    }
    bloom = {
        r["doc_id"]: r["n_shared"]
        for r in registry.QUERIES["dedup_decontaminate_bloom"](spark, sf_oracle).collect()
    }
    assert set(exact) <= set(bloom)
    assert all(bloom[d] >= c for d, c in exact.items())
    assert bloom == exact  # FP ≈ 0 at fixture load — measured, not assumed


def test_bloom_decontaminate_plan_no_corpus_shuffle(spark, sf_oracle):
    """The corpus side must reach the per-doc aggregate with NO join at
    all: the filter is a spark-broadcast numpy bitset probed inside one
    Arrow pass (the crossJoin(words) alternative copies the 1MB array
    into every probe row — measured 6.5s vs 0.2s at sf0.1). The only
    exchange is the final per-doc partial aggregate."""
    from vectordb_from_scratch_spark import plans, registry

    p = plans.physical_plan(
        registry.QUERIES["dedup_decontaminate_bloom"](spark, sf_oracle)
    )
    assert "Join" not in p  # bit test is a map-side Arrow kernel
    assert "MapInPandas" in p
    # exactly one exchange: the partial/final count aggregate
    assert p.count("Exchange") <= 2  # agg exchange (+ AQE read marker)


# --- pure-kernel property tests (no Spark session in the loop) ---------------


@given(
    n=st.integers(min_value=2, max_value=40),
    d=st.integers(min_value=2, max_value=8),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=40, deadline=None)
def test_nsw_full_beam_reaches_every_node(n, d, seed):
    """The NSW construction invariant behind the full-ef == exact
    contract: for ANY corpus, a beam with ef >= n starting at node 0
    visits all n nodes (each insert links bidirectionally to an existing
    node, so the graph is connected and the unevictable beam exhausts
    it)."""
    import numpy as np

    from vectordb_from_scratch_spark.operators import hnsw

    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d))
    Xu = hnsw._normalize(X)
    adj = hnsw._build_shard_graph(Xu, m=4, m_max=6, efc=8)
    res = hnsw._beam(adj, Xu, Xu[rng.integers(0, n)], ef=n + 10)
    assert {v for _, v in res} == set(range(n))


@given(
    counts=st.lists(
        st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=1, max_value=50)),
        min_size=1,
        max_size=200,
    ),
    k=st.integers(min_value=2, max_value=16),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_undercount_bound(counts, k):
    """MG's contract for ANY stream: every counter undercounts its true
    frequency by at most n/k (the documented bound of the batch
    decrement rule in sketches.mg_update), and no counter overcounts."""
    from vectordb_from_scratch_spark.operators.sketches import mg_update

    state: dict = {}
    true: dict = {}
    n = 0
    for tok, c in counts:
        state = mg_update(state, {str(tok): c}, k)
        true[str(tok)] = true.get(str(tok), 0) + c
        n += c
    for tok, est in state.items():
        assert est <= true[tok], (tok, est, true[tok])
        assert true[tok] - est <= n / k + 1e-9, (tok, est, true[tok], n, k)


def test_winnowing_shared_run_guarantee(spark):
    """Schleimer et al.'s theorem, asserted on constructed docs: two
    documents sharing a word run of length >= w + k - 1 must share at
    least one winnowed fingerprint (same hash — position may differ)."""
    from vectordb_from_scratch_spark.operators.textstats import (
        WINNOW_W,
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 words >= w+k-1 = 6
    docs = spark.createDataFrame(
        [
            ("a", f"one two {shared} three four"),
            ("b", f"nine eight seven {shared} six five"),
            ("c", "totally different words entirely here now okay"),
        ],
        "doc_id string, text string",
    )
    fps = winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc["a"] & by_doc["b"], "shared run must share a fingerprint"
    assert not (by_doc["a"] & by_doc["c"])
    # density: winnowing keeps a fraction ~2/(w+1) — far fewer than all
    n_sh = 8 + 3 - 1  # doc a: 10 words -> 8 shingles
    assert len(by_doc["a"]) < n_sh


def _py_winnow(hashes: list, w: int) -> set:
    """Pure-Python canonical winnowing: per complete window, record the
    rightmost-minimum (pos, hash); dedup."""
    out = set()
    n = len(hashes)
    for p in range(0, n - w + 1):
        win = hashes[p : p + w]
        mn = min(win)
        q = max(j for j in range(w) if win[j] == mn)
        out.add((p + q, mn))
    return out


@given(
    words=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=60),
)
@settings(max_examples=40, deadline=None)
def test_winnow_one_pass_equals_canonical(spark, words):
    """The O(1)-per-row run-length formulation must select EXACTLY the
    canonical per-window rightmost-min set for any document — the
    equivalence the 5.1s→sub-second optimization rests on."""
    import hashlib

    from vectordb_from_scratch_spark.operators.textstats import (
        WINNOW_W,
        winnow_fingerprints,
    )

    text = " ".join(words)
    docs = spark.createDataFrame([("d", text)], "doc_id string, text string")
    got = {
        (r["pos"], r["fp"]) for r in winnow_fingerprints(docs).collect()
    }
    # reference: shingle exactly like texthash.word_shingles (n=3)
    k = 3
    if len(words) >= k:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    else:
        shingles = [" ".join(words)]
    hashes = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in shingles
    ]
    want = _py_winnow(hashes, WINNOW_W)
    assert got == want


@given(
    n=st.integers(min_value=2, max_value=60),
    d=st.integers(min_value=2, max_value=8),
    seed=st.integers(min_value=0, max_value=10_000),
    batch=st.integers(min_value=1, max_value=16),
)
@settings(max_examples=40, deadline=None)
def test_batched_builder_keeps_reachability(n, d, seed, batch):
    """The batched (exact-link) builder preserves the connectivity
    invariant for ANY corpus and ANY batch size: batch members link only
    into the frozen prefix, so every node still keeps >=1 incoming edge
    from a lower-index node through lifeline pruning — full-beam search
    from the entry reaches all n nodes."""
    import numpy as np

    from vectordb_from_scratch_spark.operators import hnsw

    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d))
    Xu = hnsw._normalize(X)
    adj = hnsw._build_shard_graph_batched(Xu, m=4, m_max=6, efc=8, batch=batch)
    res = hnsw._beam(adj, Xu, Xu[rng.integers(0, n)], ef=n + 10)
    assert {v for _, v in res} == set(range(n))


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    reps=st.integers(min_value=2, max_value=8),
)
@settings(max_examples=30, deadline=None)
def test_exact_links_tie_rule_is_deterministic(seed, reps):
    """Duplicate-heavy corpora put the argpartition cut value in a tie;
    the boundary rule must resolve it by LOWEST node id, identically on
    every run — two builds over a corpus of repeated vectors agree
    edge-for-edge, and each selection is the lexicographically first
    (sim DESC, node ASC) top-m set.

    INTEGER-valued vectors on purpose (the repo's duplicate-tie rule —
    see the SQ8/Hamming kernels): with gaussians, the kernel's sgemm and
    this test's reference matvec can disagree by 1 ulp on IDENTICAL
    duplicated rows (blocking-dependent accumulation), turning an exact
    tie into a phantom ordering and failing the compare on ties the
    kernel actually resolves correctly (hypothesis found seed=2643
    reps=5). Integer dots are exactly representable on every BLAS path,
    so ties are real ties in both computations."""
    import numpy as np

    from vectordb_from_scratch_spark.operators import hnsw

    rng = np.random.default_rng(seed)
    base = rng.integers(-3, 4, size=(6, 4)).astype("float64")
    X = np.repeat(base, reps, axis=0)
    Xf = np.ascontiguousarray(X, dtype=np.float32)
    lo = len(X) - 3
    a = hnsw._exact_links_batch(Xf, lo, len(X), m=4)
    b = hnsw._exact_links_batch(Xf, lo, len(X), m=4)
    assert all(
        (na == nb).all() and (sa == sb).all()
        for (na, sa), (nb, sb) in zip(a, b)
    )
    # the pinned rule, checked directly: full (sim DESC, id ASC) order
    for t, (got, _) in enumerate(a):
        sims = Xf[:lo] @ Xf[lo + t]
        want = np.lexsort((np.arange(lo), -sims))[: len(got)]
        assert [int(v) for v in got] == [int(v) for v in want]
    g1 = hnsw._build_shard_graph_batched(X, m=3, m_max=4, efc=6, batch=4)
    g2 = hnsw._build_shard_graph_batched(X, m=3, m_max=4, efc=6, batch=4)
    assert g1 == g2


def _py_shingles(text: str, n: int = 3) -> set:
    ws = text.split()
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def test_prefix_join_lossless_under_boilerplate(spark):
    """The PPJoin prefix filter must return EXACTLY the brute-force
    Jaccard >= 0.5 pair set even when a boilerplate run puts hot shingles
    in every document — the case the capped variant
    (dedup_jaccard_pairs) silently biases. Also asserts the filter is
    actually pruning: candidate volume stays far below the full
    inverted-index join's pair volume, because the boilerplate shingles
    sort to the frequent end of the order and never enter a prefix."""
    from vectordb_from_scratch_spark.operators.dedup import (
        _shingle_rows,
        jaccard_prefix_pairs,
    )

    boiler = "terms of service apply to all content provided here"
    rows = []
    for i in range(30):
        tail = " ".join(f"u{i}w{j}" for j in range(12))
        rows.append((i, f"{boiler} {tail}"))
    # planted near-dup: doc 100/101 share everything but one tail word
    rows.append((100, f"{boiler} same same2 same3 same4 same5 same6 x"))
    rows.append((101, f"{boiler} same same2 same3 same4 same5 same6 y"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_prefix_pairs(docs).collect()
    }
    # brute force over distinct shingle sets
    sets = {i: _py_shingles(t) for i, t in rows}
    want = {}
    ids = sorted(sets)
    for ii, a in enumerate(ids):
        for b in ids[ii + 1 :]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and inter * 2 >= uni:
                want[(a, b)] = round(inter / uni, 6)
    assert got == want
    assert (100, 101) in got  # the planted pair survives the boilerplate
    # pruning effectiveness: full inverted-index join pair volume vs the
    # prefix join's candidate volume
    sh = _shingle_rows(docs)
    a, b = sh.alias("a"), sh.alias("b")
    from pyspark.sql import functions as F

    full_pairs = a.join(
        b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).count()
    # every boilerplate shingle links all 32 docs: C(32,2) pairs each
    assert full_pairs > 3000
    got_cand = len(got)  # final pairs; candidates bounded by prefix join
    assert got_cand == len(want) <= 2


def test_zipf_fit_recovers_planted_power_law(spark, tmp_path):
    """A corpus built with freq(rank r) = round(1000/r) must fit slope
    ≈ -1 with near-perfect r² — and the fixture's flat 31-word vocabulary
    must NOT (that's the diagnostic working, not failing)."""
    import pandas as pd

    from vectordb_from_scratch_spark.operators.textstats import text_zipf_fit

    words = []
    for r in range(1, 101):
        words += [f"term{r:03d}"] * max(1, round(1000 / r))
    # spread across docs so the scan is non-trivial
    docs = [" ".join(words[i::20]) for i in range(20)]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "lang": ["en"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(t) for t in docs],
        }
    )
    d = tmp_path / "zipfdata"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")
    row = text_zipf_fit(spark, str(d)).collect()[0]
    assert row["n_terms"] == 100
    assert -1.05 < row["slope"] < -0.9
    assert row["r2"] > 0.98


def test_cusum_flags_planted_sustained_shift(spark, tmp_path):
    """Two types over 4 days, values ~N/A flat at the median except one
    (type, day) whose values run +8 all day: that cell must own the top
    peak_pos by a wide margin, and flat cells must stay near zero —
    row-level screens can't see this shift (no single value is extreme)."""
    import pandas as pd

    from vectordb_from_scratch_spark.operators.events import events_cusum_drift

    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01")
    for day in range(4):
        for typ in ("a", "b"):
            for i in range(50):
                shift = 8.0 if (typ == "a" and day == 2) else 0.0
                # alternate around 100 so the per-type median is ~100
                val = 100.0 + (1.0 if i % 2 else -1.0) + shift
                rows.append(
                    (
                        eid,
                        base + pd.Timedelta(days=day, minutes=i),
                        i % 7,
                        typ,
                        val,
                        "",
                    )
                )
                eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path / "cusumdata"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = {
        (r["event_type"], r["day"]): r
        for r in events_cusum_drift(spark, str(d)).collect()
    }
    assert len(got) == 8
    peaks = sorted(got.items(), key=lambda kv: -kv[1]["peak_pos"])
    (top_key, top) = peaks[0]
    assert top_key == ("a", 19725) and top["peak_pos"] > 300  # ~50*8 accumulated
    # every other cell stays far below the planted cell — including the
    # mild NEGATIVE drift the shifted day induces on its own type's flat
    # days (it pulls the type median up by ~1, which is correct CUSUM
    # behavior, not noise: the reference is corpus-wide)
    for k, r in got.items():
        if k != top_key:
            assert r["peak_pos"] < top["peak_pos"] / 4
            assert r["peak_neg"] < top["peak_pos"] / 4
