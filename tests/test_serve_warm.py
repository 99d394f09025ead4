"""The *_prebuilt serve twins' warm-cache contract (VERDICT r3 item 4 /
ADVICE r3): under registry.STRICT_SERVE a cold build cache raises instead
of silently training inside what bench.py times as "serve cost"; after
the registered warmer runs, the serve call succeeds and touches no
training path. Default (lenient) mode still builds on demand — the
driver's correctness harness may invoke a prebuilt query standalone."""

import pytest

from vectordb_from_scratch_spark import registry
from vectordb_from_scratch_spark.operators import hnsw, ivf, lsh, pq, textstats

CASES = [
    ("ivf_search_prebuilt", ivf, "_BUILD_CACHE"),
    ("lsh_search_prebuilt", lsh, "_BUILD_CACHE"),
    ("pq_search_prebuilt", pq, "_BUILD_CACHE"),
    ("ivfpq_search_prebuilt", pq, "_IVFPQ_CACHE"),
    ("hnsw_search_prebuilt", hnsw, "_BUILD_CACHE"),
    ("text_bm25_search_prebuilt", textstats, "_BM25_INDEX_CACHE"),
]


@pytest.fixture
def strict_serve():
    registry.STRICT_SERVE = True
    yield
    registry.STRICT_SERVE = False


@pytest.mark.parametrize("name,mod,cache_attr", CASES)
def test_prebuilt_raises_cold_under_strict(
    spark, sf_small, strict_serve, name, mod, cache_attr
):
    cache = getattr(mod, cache_attr)
    saved = dict(cache)
    cache.clear()
    if cache_attr == "_IVFPQ_CACHE":
        # ivfpq composes pq: its own co-location cache is the guard key
        pq._BUILD_CACHE.clear()
    try:
        with pytest.raises(RuntimeError, match="cold build cache"):
            registry.QUERIES[name](spark, sf_small)
    finally:
        cache.update(saved)


def test_warmers_registered_for_every_prebuilt_query():
    prebuilt = [n for n in registry.QUERIES if n.endswith("_prebuilt")]
    assert prebuilt, "expected prebuilt serve twins to be registered"
    missing = [n for n in prebuilt if n not in registry.WARMERS]
    assert not missing, f"prebuilt queries without a warmer: {missing}"


@pytest.mark.parametrize("name,mod,cache_attr", CASES)
def test_warm_then_serve_does_not_train(
    spark, sf_small, strict_serve, monkeypatch, name, mod, cache_attr
):
    """After the warmer, the timed serve call must complete WITHOUT
    touching any training entry point — monkeypatch them to explode."""
    registry.WARMERS[name](spark, sf_small)

    def boom(*a, **k):
        raise AssertionError("serve path invoked a build/train function")

    monkeypatch.setattr(ivf, "train_centroids", boom)
    monkeypatch.setattr(pq, "train_codebooks", boom)
    monkeypatch.setattr(lsh, "compute_buckets", boom)
    # bm25 serve must read the persisted postings, never re-tokenize documents
    monkeypatch.setattr(textstats, "load_table", boom)
    assert registry.QUERIES[name](spark, sf_small).count() > 0
