"""Sampling primitives: stratified proportions within binomial tolerance,
hash-split determinism and disjointness."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators.sampling import hash_split, stratified_sample
from vectordb_from_scratch_spark.session import load_table


def test_stratified_sample_proportions(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    fractions = {"en": 0.5, "de": 0.2, "es": 0.1, "fr": 0.1, "zh": 0.1}
    sampled = stratified_sample(docs, "lang", fractions)
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, frac in fractions.items():
        rate = got.get(lang, 0) / totals[lang]
        assert abs(rate - frac) < 0.12, (lang, rate, frac)  # binomial tolerance at ~100/stratum
    # seeded: rerun identical
    again = stratified_sample(docs, "lang", fractions)
    assert sorted(r["doc_id"] for r in sampled.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_hash_split_deterministic_and_disjoint(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    s1 = hash_split(docs, "doc_id")
    s2 = hash_split(docs.repartition(7), "doc_id")  # partitioning must not matter
    m1 = {r["doc_id"]: r["split"] for r in s1.collect()}
    m2 = {r["doc_id"]: r["split"] for r in s2.collect()}
    assert m1 == m2
    n_val = sum(1 for v in m1.values() if v == "val")
    assert 0.05 <= n_val / len(m1) <= 0.15  # ~10%


def test_component_split_has_no_cross_split_leakage(spark, sf_oracle):
    """Every near-dup component must land whole in ONE split — the
    property that makes the split safe against eval contamination."""
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.operators.sampling import (
        sampling_component_split,
    )

    split = sampling_component_split(spark, sf_oracle)
    leaks = (
        split.groupBy("grp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert leaks == 0
    # and all three splits are populated at fixture scale
    names = {r["split"] for r in split.select("split").distinct().collect()}
    assert names == {"train", "val", "test"}


def test_weighted_sample_prefers_heavy_docs(spark, sf_oracle):
    """Size-weighted draw: the selected set's mean n_chars must exceed
    the corpus mean (weights ∝ n_chars must bias the draw heavy)."""
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.operators.sampling import sampling_weighted
    from vectordb_from_scratch_spark.session import load_table

    sel = sampling_weighted(spark, sf_oracle)
    mean_sel = sel.agg(F.avg("n_chars")).first()[0]
    mean_all = load_table(spark, sf_oracle, "documents").agg(F.avg("n_chars")).first()[0]
    assert mean_sel > mean_all


def test_domain_mixture_budget_within_one_doc(spark, sf_oracle):
    """Each domain's achieved chars (sum of n_chars·copies) must land
    within one document of its integer budget — the accuracy contract of
    the whole-epochs + hash-prefix-partial fill rule."""
    from vectordb_from_scratch_spark.operators.sampling import (
        MIXTURE_BUDGET_DEN,
        domain_mixture_copies,
        _domain_weight,
    )
    from vectordb_from_scratch_spark.session import load_table

    docs = load_table(spark, sf_oracle, "documents")
    out = domain_mixture_copies(docs).collect()
    assert out and any(r["copies"] != 1 for r in out)  # a real re-mix
    per_dom = docs.groupBy("source").agg(
        F.sum(F.col("n_chars").cast("long")).alias("chars_d"),
        F.max(F.col("n_chars").cast("long")).alias("max_chars"),
    ).withColumn("w_d", _domain_weight(F.col("source"))).collect()
    tot = sum(r["chars_d"] for r in per_dom)
    W = sum(r["w_d"] for r in per_dom)
    B = tot // MIXTURE_BUDGET_DEN
    achieved: dict = {}
    for r in out:
        achieved[r["source"]] = achieved.get(r["source"], 0) + r["n_chars"] * r["copies"]
    for r in per_dom:
        budget = B * r["w_d"] // W
        got = achieved.get(r["source"], 0)
        assert budget - r["max_chars"] < got <= budget + r["max_chars"], (
            r["source"], got, budget, r["max_chars"]
        )


def test_domain_mixture_partitioning_independent(spark, sf_oracle):
    """The copies assignment depends only on content hashes: recomputing
    over an adversarial repartitioning yields the identical mixture."""
    from vectordb_from_scratch_spark.operators.sampling import domain_mixture_copies
    from vectordb_from_scratch_spark.session import load_table

    docs = load_table(spark, sf_oracle, "documents")
    base = {(r["doc_id"], r["copies"]) for r in domain_mixture_copies(docs).collect()}
    shuffled = docs.repartition(7, F.col("n_chars"))
    again = {
        (r["doc_id"], r["copies"])
        for r in domain_mixture_copies(shuffled).collect()
    }
    assert base == again


def test_semantic_prune_contract(spark, sf_oracle):
    """SemDeDup: per cluster exactly ceil(0.1*n) members pruned; every
    pruned member's (redundancy, id) ranks above every kept member's
    under the prune order; first member of each cluster is always kept;
    and the whole assignment is deterministic across repartitionings."""
    import math

    from vectordb_from_scratch_spark.operators import ivf
    from vectordb_from_scratch_spark.operators.dedup import (
        SEMANTIC_KEEP_FRAC,
        semantic_prune,
    )
    from vectordb_from_scratch_spark.session import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    _, assignments = ivf.built_index(spark, sf_oracle)
    rows = semantic_prune(emb, assignments).collect()
    assert rows
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    pruned_any = False
    for cid, members in by_cluster.items():
        n = len(members)
        pruned = [r for r in members if r["action"] == "prune"]
        kept = [r for r in members if r["action"] == "keep"]
        # the chain seed is never pruned, so a singleton prunes nothing
        # (r10: the cap only binds at n=1)
        assert len(pruned) == min(
            math.ceil((1 - SEMANTIC_KEEP_FRAC) * n), n - 1
        ), (cid, n)
        pruned_any = pruned_any or bool(pruned)
        first = min(members, key=lambda r: r["vec_id"])
        assert first["action"] == "keep"  # redundancy -1 can never rank first
        if pruned and kept:
            # prune order is (redundancy DESC, id DESC): no kept member
            # may outrank a pruned one
            worst_kept = max((r["redundancy"], r["vec_id"]) for r in kept)
            best_pruned = min((r["redundancy"], r["vec_id"]) for r in pruned)
            assert best_pruned >= worst_kept or best_pruned[0] >= worst_kept[0] - 1e-9
    assert pruned_any

    again = semantic_prune(
        emb.repartition(7, F.col("label")), assignments
    ).collect()
    assert {(r["vec_id"], r["action"]) for r in again} == {
        (r["vec_id"], r["action"]) for r in rows
    }


def test_semantic_prune_bounded_subshards(spark, sf_oracle):
    """Member-cap enforcement: with max_members forced tiny, every vector
    is still scored exactly once (sub-shards partition each cluster), the
    md5 sub-sharding is deterministic across repartitionings, per-shard
    memory stays bounded (implied by group sizes), and a cluster at or
    below the cap produces the exact unbounded result."""
    import math
    from collections import Counter

    from vectordb_from_scratch_spark.operators import ivf
    from vectordb_from_scratch_spark.operators.dedup import (
        SEMANTIC_KEEP_FRAC,
        semantic_prune,
    )
    from vectordb_from_scratch_spark.session import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    _, assignments = ivf.built_index(spark, sf_oracle)
    cluster_sizes = {
        r["cluster_id"]: r["n"]
        for r in assignments.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    cap = 8  # forces every fixture cluster (~30 members) to split
    rows = semantic_prune(emb, assignments, max_members=cap).collect()

    # partition property: one verdict per vector, clusters fully covered
    assert len(rows) == sum(cluster_sizes.values())
    assert len({r["vec_id"] for r in rows}) == len(rows)
    per_cluster = Counter(r["cluster_id"] for r in rows)
    assert dict(per_cluster) == cluster_sizes

    # prune budget holds per cluster within sub-shard rounding: shard i
    # prunes min(ceil(f*n_i), n_i - 1) — the seed exemption (r10) zeroes
    # singleton shards — so the cluster total is in
    # [max(0, ceil(f*size) - nsub), floor(f*size) + nsub] (md5 shards
    # aren't balanced; each of the <= nsub singleton shards can forgo
    # one prune, and Σceil(f*n_i) <= f*size + nsub regardless of split)
    pruned = Counter(r["cluster_id"] for r in rows if r["action"] == "prune")
    f = 1 - SEMANTIC_KEEP_FRAC
    for cid, size in cluster_sizes.items():
        nsub = math.ceil(size / cap)
        lo = max(0, math.ceil(f * size) - nsub)
        hi = math.floor(f * size) + nsub
        assert lo <= pruned.get(cid, 0) <= hi, (cid, size, pruned.get(cid, 0))

    # deterministic under physical layout changes
    again = semantic_prune(
        emb.repartition(7, F.col("label")), assignments, max_members=cap
    ).collect()
    assert {(r["vec_id"], r["action"], r["redundancy"]) for r in again} == {
        (r["vec_id"], r["action"], r["redundancy"]) for r in rows
    }


def test_dsir_separates_target_like_documents(spark):
    """DSIR log-weights must rank target-vocabulary docs above
    off-target docs, with a mixed doc in between — the selection
    behavior the estimator exists for (the arithmetic itself is
    value-oracled in test_oracle_parity)."""
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.operators.sampling import dsir_log_weights

    tvoc = "alpha beta gamma delta epsilon zeta eta theta"
    ovoc = "uno dos tres cuatro cinco seis siete ocho"
    rows = []
    for i in range(10):
        rows.append((i, "tgt", f"{tvoc} alpha beta {i}x"))
    for i in range(10, 20):
        rows.append((i, "raw", f"{ovoc} uno dos {i}y"))
    rows.append((99, "raw", f"{tvoc} {ovoc}"))  # the mixed doc
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(docs, F.col("lang") == "tgt").collect()
    }
    tgt_min = min(w[i] for i in range(10))
    raw_max = max(w[i] for i in range(10, 20))
    assert tgt_min > w[99] > raw_max
