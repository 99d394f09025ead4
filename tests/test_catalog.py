"""e2e workflow tests for VectorCatalog — the Spark analog of the
reference's tests-mongo suite (SURVEY.md §5): library/document/chunk CRUD,
error statuses, search on all three index types, cascade deletes, and
persistence across "restarts" (a fresh catalog instance over the same root).

Reference anchors: tests-mongo/test_e2e_mongo.py (CRUD + search + errors),
test_ivf_e2e.py / test_lsh_simhash_e2e.py (workflows), test_persistence.py
(survive restart). Unlike the reference we also assert *correctness* of the
top hit, not just non-emptiness.
"""

from __future__ import annotations

import numpy as np
import pytest

from vectordb_from_scratch_spark.catalog import (
    ConflictError,
    NotFoundError,
    ValidationError,
    VectorCatalog,
)

DIMS = 8
N_CHUNKS = 48


def _vectors(n: int = N_CHUNKS, d: int = DIMS) -> np.ndarray:
    rng = np.random.default_rng(7)
    return rng.standard_normal((n, d)).astype("float32")


def _populate(cat: VectorCatalog, name: str, index_type: str = "flat") -> tuple[str, str, list[str]]:
    lib_id = cat.create_library(name, DIMS, index_type=index_type)
    doc_id = cat.create_document(lib_id, "doc-1", metadata={"topic": "t"})
    vecs = _vectors()
    items = [
        {
            "text": f"chunk {i}",
            "embedding": vecs[i].tolist(),
            "metadata": {"parity": "even" if i % 2 == 0 else "odd"},
        }
        for i in range(len(vecs))
    ]
    ids = cat.add_chunks(lib_id, doc_id, items, ids=[f"c{i:03d}" for i in range(len(vecs))])
    return lib_id, doc_id, ids


@pytest.fixture()
def cat(spark, tmp_path):
    return VectorCatalog(spark, str(tmp_path))


def test_library_crud_and_conflicts(cat):
    lib_id = cat.create_library("alpha", DIMS, metadata={"owner": "x"})
    assert cat.get_library(lib_id)["name"] == "alpha"
    with pytest.raises(ConflictError):
        cat.create_library("alpha", DIMS)  # name globally unique (409)
    with pytest.raises(ValidationError):
        cat.create_library("", DIMS)
    with pytest.raises(ValidationError):
        cat.create_library("beta", 0)
    with pytest.raises(ValidationError):
        cat.create_library("beta", DIMS, index_type="annoy")  # strict, no silent flat fallback

    cat.create_library("Beta", DIMS)
    names = [r["name"] for r in cat.list_libraries()]
    assert names == ["alpha", "Beta"]  # sorted by lower(name) — libraries.py:29

    updated = cat.update_library(lib_id, name="alpha2", dims=999)
    assert updated["name"] == "alpha2"
    assert updated["dims"] == DIMS  # dims silently stripped (mongo_storage.py:78-80)
    with pytest.raises(ConflictError):
        cat.update_library(lib_id, name="Beta")
    with pytest.raises(NotFoundError):
        cat.get_library("nope")


def test_document_crud_and_ownership(cat):
    lib_id = cat.create_library("lib", DIMS)
    doc_id = cat.create_document(lib_id, "title-1")
    with pytest.raises(ConflictError):
        cat.create_document(lib_id, "title-1")  # (library_id, title) unique
    other = cat.create_library("lib2", DIMS)
    cat.create_document(other, "title-1")  # same title OK in another library
    with pytest.raises(NotFoundError):
        cat.get_document(other, doc_id)  # ownership check
    with pytest.raises(ValidationError):
        cat.update_document(lib_id, doc_id, library_id=other)  # forbidden move
    assert cat.update_document(lib_id, doc_id, title="renamed")["title"] == "renamed"
    cat.delete_document(lib_id, doc_id)
    assert cat.list_documents(lib_id) == []


def test_chunk_batch_validation_is_all_or_nothing(cat):
    lib_id = cat.create_library("lib", DIMS)
    doc_id = cat.create_document(lib_id, "d")
    bad = [
        {"text": "ok", "embedding": [0.1] * DIMS},
        {"text": "bad", "embedding": [0.1] * (DIMS + 1)},  # wrong dims
    ]
    with pytest.raises(ValidationError):
        cat.add_chunks(lib_id, doc_id, bad)
    assert cat.list_chunks(lib_id) == []  # nothing written — stronger than chunks.py:43-70

    ids = cat.add_chunks(lib_id, doc_id, [{"text": "t", "embedding": [0.5] * DIMS}])
    chunk = cat.get_chunk(lib_id, ids[0])
    assert chunk["text"] == "t" and len(chunk["embedding"]) == DIMS

    upd = cat.update_chunk(lib_id, ids[0], text="t2")
    assert upd["text"] == "t2"
    with pytest.raises(ValidationError):
        cat.update_chunk(lib_id, ids[0], embedding=[1.0] * (DIMS - 1))
    with pytest.raises(NotFoundError):
        cat.delete_chunks(lib_id, [ids[0], "ghost"])  # validate-all-first (chunks.py:135-145)
    assert cat.list_chunks(lib_id) != []
    cat.delete_chunks(lib_id, ids)
    assert cat.list_chunks(lib_id) == []


def test_flat_search_correctness_filters_hydration(cat):
    lib_id, _, ids = _populate(cat, "flat-lib")
    vecs = _vectors()
    target = 17
    res = cat.search(lib_id, vecs[target].tolist(), k=5)
    assert res[0].chunk_id == ids[target]  # self-query top-1 (exactness, not just non-empty)
    assert res[0].similarity_score == pytest.approx(1.0, abs=1e-5)
    assert len(res) == 5

    res = cat.search(lib_id, vecs[target].tolist(), k=5, metadata_filters={"parity": "even"})
    assert all(int(r.chunk_id[1:]) % 2 == 0 for r in res)

    res = cat.search(lib_id, vecs[target].tolist(), k=3, include_chunk=True)
    assert res[0].chunk is not None and res[0].chunk["text"] == f"chunk {target}"

    with pytest.raises(ValidationError):
        cat.search(lib_id, vecs[target].tolist(), k=0)
    with pytest.raises(ValidationError):
        cat.search(lib_id, vecs[target].tolist(), k=101)  # k capped at 100 (dto.py:58)
    with pytest.raises(ValidationError):
        cat.search(lib_id, [0.1] * (DIMS + 2), k=5)  # 422 dim mismatch
    with pytest.raises(NotFoundError):
        cat.search("ghost", vecs[target].tolist(), k=5)


def test_ivf_and_lsh_search_workflows(cat):
    for index_type in ("ivf", "lsh_simhash"):
        lib_id, _, ids = _populate(cat, f"lib-{index_type}", index_type=index_type)
        vecs = _vectors()
        res = cat.search(lib_id, vecs[5].tolist(), k=5)
        assert res, f"{index_type} search returned nothing"
        assert res[0].chunk_id == ids[5]  # self-query must survive approximation
        assert res[0].similarity_score == pytest.approx(1.0, abs=1e-5)
        assert cat.library_stats(lib_id)["index_built"]


def test_cascade_delete_library(cat):
    lib_id, doc_id, _ = _populate(cat, "doomed", index_type="ivf")
    cat.search(lib_id, _vectors()[0].tolist(), k=3)  # force index build
    keep_id, _, _ = _populate(cat, "keeper")
    cat.delete_library(lib_id)
    with pytest.raises(NotFoundError):
        cat.get_library(lib_id)
    with pytest.raises(NotFoundError):
        cat.get_document(lib_id, doc_id)
    assert cat.list_chunks(keep_id)  # other library untouched
    assert cat._index_meta(lib_id) is None  # derived index dir removed


def test_persistence_across_restart(spark, tmp_path):
    """test_persistence.py analog: a fresh catalog over the same root sees
    all data and serves search without any explicit rebuild step."""
    cat1 = VectorCatalog(spark, str(tmp_path))
    lib_id, _, ids = _populate(cat1, "persisted", index_type="ivf")
    cat1.search(lib_id, _vectors()[3].tolist(), k=3)  # builds index sidecar

    cat2 = VectorCatalog(spark, str(tmp_path))  # "restart"
    assert {r["name"] for r in cat2.list_libraries()} == {"persisted"}
    stats = cat2.library_stats(lib_id)
    assert stats["num_documents"] == 1 and stats["num_chunks"] == N_CHUNKS
    res = cat2.search(lib_id, _vectors()[3].tolist(), k=3)
    assert res[0].chunk_id == ids[3]


def test_index_type_change_triggers_rebuild(cat):
    lib_id, _, ids = _populate(cat, "mutating", index_type="flat")
    cat.update_library(lib_id, index_type="ivf")
    assert cat.get_library(lib_id)["index_type"] == "ivf"
    assert cat._index_meta(lib_id)["type"] == "ivf"  # rebuilt eagerly (vector_db.py:125-135)
    res = cat.search(lib_id, _vectors()[9].tolist(), k=3)
    assert res[0].chunk_id == ids[9]


def test_mutation_maintains_index_incrementally(cat):
    """Chunk mutations on a FRESH index apply as a delta (reference per-row
    semantics, ivf.py:50-89): the index absorbs the new row without going
    stale and without a rebuild. A stale/crashed index still heals via the
    V16 lazy full rebuild (test_stale_fallback_rebuilds below)."""
    lib_id, doc_id, ids = _populate(cat, "stale-lib", index_type="ivf")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=3)
    assert not cat._index_meta(lib_id).get("stale")

    new_vec = (vecs[0] * -1.0).tolist()
    new_id = cat.add_chunks(lib_id, doc_id, [{"text": "new", "embedding": new_vec}], ids=["cNEW"])[0]
    assert not cat._index_meta(lib_id).get("stale")  # delta applied, still fresh
    res = cat.search(lib_id, new_vec, k=3)
    assert res[0].chunk_id == new_id  # fresh row findable without rebuild
    assert not cat._index_meta(lib_id).get("stale")


def test_stale_fallback_rebuilds(cat):
    """V16 lazy ensure still backstops the delta path: a stale sidecar
    (crash between base write and delta) fully rebuilds on next search."""
    lib_id, doc_id, ids = _populate(cat, "crashed-lib", index_type="ivf")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=3)
    meta = cat._index_meta(lib_id)
    meta["stale"] = True  # simulate crash mid-delta
    cat._write_index_meta(lib_id, meta)
    res = cat.search(lib_id, vecs[7].tolist(), k=3)
    assert res[0].chunk_id == ids[7]
    assert not cat._index_meta(lib_id).get("stale")


def test_chunks_scan_prunes_by_library(cat):
    """chunks are written partitionBy(library_id): per-library reads must
    show a PartitionFilters entry on library_id (the Mongo secondary-index
    analog, mongo_storage.py:25-56 — but as directory pruning)."""
    import re

    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark import plans

    lib_id, _, _ = _populate(cat, "prune-lib")
    _populate(cat, "prune-other")  # a second partition that must NOT be read
    corpus = cat.chunks.read().filter(F.col("library_id") == lib_id)
    plan = plans.physical_plan(corpus)
    m = re.search(r"PartitionFilters: \[([^\]]*library_id[^\]]*)\]", plan)
    assert m, f"no library_id partition filter in scan:\n{plan}"


def test_ingest_document_text_end_to_end(cat):
    """The one-call ingest pipeline (chunk → embed → add) must produce
    searchable chunks: text search for a phrase from the document finds a
    chunk of that document at rank 1 with the same provider embedding."""
    lib_id = cat.create_library("ingest-lib", 16, index_type="flat")
    text = (
        "spark shuffles partition data across executors during wide transformations "
        "while narrow transformations stay pipeline local and avoid network traffic "
        "broadcast joins ship the small side to every executor once"
    )
    doc_id, chunk_ids = cat.ingest_document_text(lib_id, "ingest-doc", text)
    assert len(chunk_ids) >= 2  # sliding windows over ~30 words
    listed = cat.list_chunks(lib_id)
    assert {c["id"] for c in listed} == set(chunk_ids)
    assert all(len(c["embedding"]) == 16 for c in listed)
    assert {c["metadata"]["chunk_seq"] for c in listed} == {
        str(i) for i in range(len(chunk_ids))
    }

    res = cat.search_text(lib_id, "broadcast joins ship the small side", k=3)
    assert res and res[0].similarity_score > 0.3
    top = cat.get_chunk(lib_id, res[0].chunk_id)
    assert top["document_id"] == doc_id
    assert "broadcast" in top["text"]


def test_ingest_rejects_empty_text_without_orphan_document(cat):
    """Empty/whitespace text must fail validation BEFORE the document is
    created (an F.sequence(0, -1) crash after create_document would leave
    an orphaned chunkless document behind)."""
    import pytest

    from vectordb_from_scratch_spark.catalog import ValidationError

    lib_id = cat.create_library("empty-ingest-lib", 16, index_type="flat")
    for bad in ("", "   "):
        with pytest.raises(ValidationError):
            cat.ingest_document_text(lib_id, "empty-doc", bad)
    assert cat.list_documents(lib_id) == []


def test_export_import_roundtrip_preserves_search(spark, tmp_path):
    """Export a library (with a built IVFPQ index) and restore it into a
    FRESH catalog: identical search results, and the restored index
    serves immediately — no retrain (train entry points are poisoned
    during the restored search to prove it)."""
    import numpy as np
    import pytest as _pytest

    from vectordb_from_scratch_spark.catalog import ConflictError, VectorCatalog
    from vectordb_from_scratch_spark.operators import ivf as ivf_ops
    from vectordb_from_scratch_spark.operators import pq as pq_ops

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((40, 8)).astype("float32")
    src = VectorCatalog(spark, str(tmp_path / "src"))
    lib = src.create_library("portme", 8, index_type="ivfpq", metadata={"k": "v"})
    doc = src.create_document(lib, "d1")
    ids = src.add_chunks(
        lib,
        doc,
        [{"text": f"c{i}", "embedding": vecs[i].tolist()} for i in range(40)],
        ids=[f"c{i:02d}" for i in range(40)],
    )
    before = [r.chunk_id for r in src.search(lib, vecs[5].tolist(), k=5)]

    snap = str(tmp_path / "snapshot")
    manifest = src.export_library(lib, snap)
    assert manifest["n_chunks"] == 40 and manifest["index"]["type"] == "ivfpq"

    dst = VectorCatalog(spark, str(tmp_path / "dst"))
    new_id = dst.import_library(snap)
    assert new_id == lib  # restore preserves ids
    assert dst.get_library(new_id)["metadata"] == {"k": "v"}
    assert dst.library_stats(new_id)["num_chunks"] == 40

    import vectordb_from_scratch_spark.catalog as catmod

    def boom(*a, **k):
        raise AssertionError("restored index must serve without retraining")

    orig_tc, orig_cb = ivf_ops.train_centroids, pq_ops.train_codebooks
    catmod.ivf_ops.train_centroids = boom
    catmod.pq_ops.train_codebooks = boom
    try:
        after = [r.chunk_id for r in dst.search(new_id, vecs[5].tolist(), k=5)]
    finally:
        catmod.ivf_ops.train_centroids = orig_tc
        catmod.pq_ops.train_codebooks = orig_cb
    assert after == before and after[0] == ids[5]

    # restore is resurrection, not cloning: same id again -> 409
    with _pytest.raises(ConflictError):
        dst.import_library(snap)


def test_import_next_to_live_catalog_keeps_existing_rows(spark, tmp_path):
    """Importing into a catalog that already holds OTHER libraries must
    not disturb them (documents table is rewritten whole; chunks restore
    partition-scoped)."""
    import numpy as np

    from vectordb_from_scratch_spark.catalog import VectorCatalog

    rng = np.random.default_rng(12)
    a = VectorCatalog(spark, str(tmp_path / "a"))
    keep = a.create_library("keepme", 4)
    kd = a.create_document(keep, "kd")
    a.add_chunks(keep, kd, [{"text": "k", "embedding": [1.0, 0, 0, 0]}], ids=["k0"])

    b = VectorCatalog(spark, str(tmp_path / "b"))
    lib = b.create_library("moveme", 4)
    bd = b.create_document(lib, "bd")
    b.add_chunks(lib, bd, [{"text": "m", "embedding": [0, 1.0, 0, 0]}], ids=["m0"])
    snap = str(tmp_path / "snap2")
    b.export_library(lib, snap)

    a.import_library(snap, name="moved")
    assert {r["name"] for r in a.list_libraries()} == {"keepme", "moved"}
    assert a.library_stats(keep)["num_chunks"] == 1
    assert a.library_stats(lib)["num_chunks"] == 1
    assert a.get_chunk(keep, "k0")["text"] == "k"
    assert a.get_chunk(lib, "m0")["text"] == "m"


def test_search_batch_matches_singles_every_index_type(spark, tmp_path):
    """search_batch must return, per query, exactly what N single-query
    searches return — across every index type — while running one job."""
    import numpy as np

    from vectordb_from_scratch_spark.catalog import VectorCatalog

    rng = np.random.default_rng(21)
    vecs = rng.standard_normal((48, 8)).astype("float32")
    cat = VectorCatalog(spark, str(tmp_path))
    for itype in ("flat", "ivf", "lsh_simhash", "pq", "ivfpq", "hnsw", "cascade"):
        lib = cat.create_library(f"batch-{itype}", 8, index_type=itype)
        doc = cat.create_document(lib, "d")
        cat.add_chunks(
            lib,
            doc,
            [{"text": f"c{i}", "embedding": vecs[i].tolist()} for i in range(48)],
            ids=[f"{itype}-{i:02d}" for i in range(48)],
        )
        qs = [vecs[3].tolist(), vecs[17].tolist(), vecs[40].tolist()]
        batch = cat.search_batch(lib, qs, k=4)
        singles = [cat.search(lib, q, k=4) for q in qs]
        assert len(batch) == 3
        for got, want in zip(batch, singles):
            assert [(r.chunk_id, round(r.similarity_score, 9)) for r in got] == [
                (r.chunk_id, round(r.similarity_score, 9)) for r in want
            ], itype
        # self-match sanity: each query's own chunk at rank 1
        assert batch[0][0].chunk_id == f"{itype}-03"
        assert batch[1][0].chunk_id == f"{itype}-17"
        assert batch[2][0].chunk_id == f"{itype}-40"


def test_import_corrupt_snapshot_leaves_catalog_clean(spark, tmp_path):
    """A snapshot failing validation must not commit ANY catalog state:
    the same snapshot, repaired, must then import cleanly (previously a
    phantom library row wedged the retry with ConflictError)."""
    import json
    import os

    import numpy as np
    import pytest as _pytest

    from vectordb_from_scratch_spark.catalog import ValidationError, VectorCatalog

    rng = np.random.default_rng(31)
    src = VectorCatalog(spark, str(tmp_path / "src"))
    lib = src.create_library("fragile", 4)
    doc = src.create_document(lib, "d")
    src.add_chunks(
        lib,
        doc,
        [{"text": f"c{i}", "embedding": rng.standard_normal(4).tolist()} for i in range(6)],
        ids=[f"f{i}" for i in range(6)],
    )
    snap = str(tmp_path / "snap")
    src.export_library(lib, snap)

    # corrupt: manifest claims more chunks than the data holds
    mpath = os.path.join(snap, "manifest.json")
    manifest = json.load(open(mpath))
    manifest["n_chunks"] = 999
    json.dump(manifest, open(mpath, "w"))

    dst = VectorCatalog(spark, str(tmp_path / "dst"))
    with _pytest.raises(ValidationError, match="row counts"):
        dst.import_library(snap)
    assert dst.list_libraries() == []  # nothing committed

    manifest["n_chunks"] = 6
    json.dump(manifest, open(mpath, "w"))
    restored = dst.import_library(snap)  # retry succeeds — not wedged
    assert dst.library_stats(restored)["num_chunks"] == 6


def test_export_import_hnsw_serves_without_rebuild(spark, tmp_path):
    """Snapshot a graph-indexed library and restore it: search results
    identical and the restored graphs serve with no rebuild (the build
    entry point is poisoned during the restored search to prove it)."""
    import numpy as np
    import pytest as _pytest

    from vectordb_from_scratch_spark.catalog import VectorCatalog
    from vectordb_from_scratch_spark.operators import hnsw as hnsw_ops

    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((40, 8)).astype("float32")
    src = VectorCatalog(spark, str(tmp_path / "src"))
    lib = src.create_library("graphport", 8, index_type="hnsw")
    doc = src.create_document(lib, "d1")
    src.add_chunks(
        lib,
        doc,
        [{"text": f"c{i}", "embedding": vecs[i].tolist()} for i in range(40)],
        ids=[f"c{i:02d}" for i in range(40)],
    )
    before = [r.chunk_id for r in src.search(lib, vecs[5].tolist(), k=5)]
    snap = str(tmp_path / "snap")
    manifest = src.export_library(lib, snap)
    assert manifest["index"]["type"] == "hnsw"

    dst = VectorCatalog(spark, str(tmp_path / "dst"))
    new_id = dst.import_library(snap)

    def poisoned(*a, **k):
        raise AssertionError("restored hnsw index must serve without rebuild")

    orig = hnsw_ops.build_graphs
    hnsw_ops.build_graphs = poisoned
    try:
        after = [r.chunk_id for r in dst.search(new_id, vecs[5].tolist(), k=5)]
    finally:
        hnsw_ops.build_graphs = orig
    assert after == before


def test_version_log_seam_is_pluggable(spark, tmp_path):
    """The transaction shim (SCALE.md shortcut #1): every live-version
    read and publish goes through the injected VersionLog — a recording
    implementation sees one publish per table write, the pointer file is
    whatever the log says (no catalog code touches _LATEST directly), and
    catalog semantics are unchanged under the injected log."""
    from vectordb_from_scratch_spark.catalog import FileVersionLog

    published = []

    class RecordingLog(FileVersionLog):
        def commit(self, stage_dir, expect):
            version = super().commit(stage_dir, expect)
            published.append((self.dir.rsplit("/", 1)[-1], version))
            return version

    cat = VectorCatalog(spark, str(tmp_path / "cat"), log_factory=RecordingLog)
    assert isinstance(cat.chunks.log, RecordingLog)
    lib_id, doc_id, ids = _populate(cat, "log-seam")
    # every commit went through the seam: libraries, documents, chunks
    tables = {t for t, _ in published}
    assert tables == {"libraries", "documents", "chunks"}
    # reads resolve through the same log
    assert cat.chunks._latest() == cat.chunks.log.latest()
    res = cat.search(lib_id, _vectors()[0].tolist(), k=1)
    assert res[0].chunk_id == ids[0]
    # a second write publishes a strictly newer version of that table
    n_before = len([v for t, v in published if t == "documents"])
    cat.create_document(lib_id, "doc-2")
    docs = [v for t, v in published if t == "documents"]
    assert len(docs) == n_before + 1 and docs[-1] > docs[-2]


def test_hybrid_search_fuses_legs_and_maintains_postings(spark, tmp_path):
    """Catalog-served hybrid search (BM25 sidecar ⊕ vector index, RRF):

    1. the result equals an INDEPENDENT fusion recomputed in the test —
       lexical leg via the inline tokenizer (`bm25_ranking` over the
       chunks, no sidecar involved) + the vector leg + the RRF formula —
       pinning the persisted postings layout against the direct path;
    2. chunk mutations maintain the postings partition-scoped: an added
       chunk with a query term enters the ranking without rewriting
       untouched term-bucket partitions (inode-asserted), and a delete
       drops it again."""
    import os

    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.functions import embedder
    from vectordb_from_scratch_spark.operators import textstats

    cat = VectorCatalog(spark, str(tmp_path / "cat"))
    lib_id, doc_id, ids = _populate(cat, "hybrid-lib")
    query = "chunk 7"
    k, pool = 5, embedder.RRF_POOL

    got = cat.search_hybrid(lib_id, query, k=k)
    assert len(got) == k

    # independent fusion: inline-tokenizer BM25 + vector leg + RRF math
    docs = (
        cat.chunks.read()
        .filter(F.col("library_id") == lib_id)
        .select(F.col("id").alias("doc_id"), "text")
    )
    terms = tuple(sorted({t for t in query.split(" ") if t}))
    lex = textstats.bm25_ranking(docs, terms, pool).collect()
    vec = cat.search_text(lib_id, query, k=pool)
    fused: dict[str, float] = {}
    for r in lex:
        fused[r["doc_id"]] = fused.get(r["doc_id"], 0.0) + 1.0 / (
            embedder.RRF_K + r["rnk"]
        )
    for rank, sr in enumerate(vec, 1):
        fused[sr.chunk_id] = fused.get(sr.chunk_id, 0.0) + 1.0 / (
            embedder.RRF_K + rank
        )
    want = [
        (cid, round(s, 6))
        for cid, s in sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    ]
    assert [(r.chunk_id, r.similarity_score) for r in got] == want

    # hydration populates the chunk payload
    hydrated = cat.search_hybrid(lib_id, query, k=1, include_chunk=True)
    assert hydrated[0].chunk is not None and hydrated[0].chunk["text"]

    # --- incremental maintenance (append-only segments) ---------------
    def base_inodes():
        post_dir = cat._index_path(lib_id, "bm25_postings")
        return {
            os.path.join(d, f): os.stat(os.path.join(post_dir, d, f)).st_ino
            for d in sorted(os.listdir(post_dir))
            if d.startswith("term_bucket=")
            for f in os.listdir(os.path.join(post_dir, d))
            if f.endswith(".parquet")
        }

    inodes_before = base_inodes()
    (new_id,) = cat.add_chunks(
        lib_id, doc_id, [{"text": "seven 7 7 7", "embedding": _vectors(1)[0].tolist()}]
    )
    res = cat.search_hybrid(lib_id, "7", k=3)
    assert new_id in [r.chunk_id for r in res]  # tf=3 of '7' → lexical hit
    # a delta is append-only: the ENTIRE base postings layout is untouched
    # (new postings live in a segment; the replaced rows die by tombstone)
    assert base_inodes() == inodes_before
    assert len(cat._bm25_segment_dirs(lib_id)) == 1

    cat.delete_chunks(lib_id, [new_id])
    res = cat.search_hybrid(lib_id, "7", k=3)
    assert new_id not in [r.chunk_id for r in res]
    assert base_inodes() == inodes_before  # delete = tombstone only


def test_bm25_segments_fold_at_threshold_and_results_hold(spark, tmp_path):
    """Segment lifecycle: repeated deltas accumulate append-only segments;
    at BM25_MAX_SEGMENTS the resolved view folds into a fresh base and the
    history clears — with the hybrid ranking identical before and after
    the fold, and identical to a from-scratch rebuild (tombstone masking
    and folding must be invisible to the scorer)."""
    cat = VectorCatalog(spark, str(tmp_path / "cat"))
    lib_id, doc_id, ids = _populate(cat, "seg-lib")
    cat.search_hybrid(lib_id, "chunk", k=3)  # builds the sidecar

    # deterministic ids + distinct embeddings: identical embeddings under
    # random uuid ids made the RRF tie-break (id ASC) run-dependent
    extra = _vectors(60)
    last = None
    for i in range(cat.BM25_MAX_SEGMENTS):
        (cid,) = cat.add_chunks(
            lib_id,
            doc_id,
            [{"text": f"pivot {i} pivot", "embedding": extra[48 + i].tolist()}],
            ids=[f"pv{i:02d}"],
        )
        if i == 2:
            cat.update_chunk(lib_id, cid, text="pivot moved pivot pivot")
        if i == 4:
            cat.delete_chunks(lib_id, [cid])
        last = cid
    # make the newest delta the unambiguous lexical winner so its
    # presence in the fused top-k is deterministic, not fusion luck
    cat.update_chunk(lib_id, last, text="pivot pivot pivot pivot winner")
    # a fold fired somewhere in the run: more segment-minting deltas ran
    # than segment dirs remain, and the count is back under the threshold
    meta = cat._bm25_meta(lib_id)
    assert meta["next_seg"] > cat.BM25_MAX_SEGMENTS
    assert len(cat._bm25_segment_dirs(lib_id)) < cat.BM25_MAX_SEGMENTS

    after_fold = [(r.chunk_id, r.similarity_score) for r in cat.search_hybrid(lib_id, "pivot", k=10)]
    assert last in [c for c, _ in after_fold]

    # from-scratch rebuild (stale → lazy) must agree exactly
    cat._invalidate_bm25(lib_id)
    rebuilt = [(r.chunk_id, r.similarity_score) for r in cat.search_hybrid(lib_id, "pivot", k=10)]
    assert after_fold == rebuilt

    # compact_library folds outstanding segments too (the OPTIMIZE analog)
    cat.add_chunks(
        lib_id, doc_id, [{"text": "pivot tail", "embedding": _vectors(1)[0].tolist()}]
    )
    assert len(cat._bm25_segment_dirs(lib_id)) >= 1
    rep = cat.compact_library(lib_id)
    assert rep["bm25_postings"]["segments_after"] == 0
    compacted = [
        (r.chunk_id, r.similarity_score)
        for r in cat.search_hybrid(lib_id, "pivot", k=10)
    ]
    assert [c for c, _ in compacted]  # still serves, fold invisible


def test_export_import_carries_lexical_sidecar(spark, tmp_path):
    """A library whose ONLY sidecar is the lexical index (flat ANN type —
    no ANN meta ever written) must survive export/import with the
    postings + segments intact: the restored library serves hybrid search
    with the same ranking and without a rebuild, and library_stats
    reports the lexical state."""
    cat = VectorCatalog(spark, str(tmp_path / "cat"))
    lib_id, doc_id, _ = _populate(cat, "lex-export")
    before = [
        (r.chunk_id, r.similarity_score)
        for r in cat.search_hybrid(lib_id, "chunk 7", k=5)
    ]
    # mint a segment so the delta history is part of the snapshot too
    cat.add_chunks(
        lib_id, doc_id, [{"text": "chunk 7 extra", "embedding": _vectors(1)[0].tolist()}]
    )
    with_seg = [
        (r.chunk_id, r.similarity_score)
        for r in cat.search_hybrid(lib_id, "chunk 7", k=5)
    ]
    stats = cat.library_stats(lib_id)
    assert stats["lexical_built"] and stats["lexical_segments"] >= 1

    out = str(tmp_path / "snap")
    manifest = cat.export_library(lib_id, out)
    assert manifest["index"] is None and manifest["lexical"] is not None

    cat2 = VectorCatalog(spark, str(tmp_path / "cat2"))
    new_id = cat2.import_library(out)
    assert cat2._bm25_meta(new_id) is not None  # sidecar restored, not rebuilt
    restored = [
        (r.chunk_id, r.similarity_score)
        for r in cat2.search_hybrid(new_id, "chunk 7", k=5)
    ]
    assert restored == with_seg and restored != before


def test_hybrid_search_metadata_filters_restrict_both_legs(spark, tmp_path):
    """metadata_filters make the filtered subset THE corpus for hybrid:
    only matching chunks appear, and the result equals an independent
    fusion where the lexical leg (inline tokenizer, filtered docs — so
    df/n/avgdl are filtered-scope too) and the vector leg (filtered
    search) are recomputed from scratch."""
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.functions import embedder
    from vectordb_from_scratch_spark.operators import textstats

    cat = VectorCatalog(spark, str(tmp_path / "cat"))
    lib_id, _, ids = _populate(cat, "hybrid-filter")
    query, k, pool = "chunk 8", 5, embedder.RRF_POOL
    filt = {"parity": "even"}

    got = cat.search_hybrid(lib_id, query, k=k, metadata_filters=filt)
    assert got and all(int(r.chunk_id[1:]) % 2 == 0 for r in got)

    docs = (
        cat.chunks.read()
        .filter(
            (F.col("library_id") == lib_id)
            & (F.col("metadata")["parity"] == "even")
        )
        .select(F.col("id").alias("doc_id"), "text")
    )
    terms = tuple(sorted({t for t in query.split(" ") if t}))
    lex = textstats.bm25_ranking(docs, terms, pool).collect()
    vec = cat.search_text(lib_id, query, k=pool, metadata_filters=filt)
    fused: dict[str, float] = {}
    for r in lex:
        fused[r["doc_id"]] = fused.get(r["doc_id"], 0.0) + 1.0 / (
            embedder.RRF_K + r["rnk"]
        )
    for rank, sr in enumerate(vec, 1):
        fused[sr.chunk_id] = fused.get(sr.chunk_id, 0.0) + 1.0 / (
            embedder.RRF_K + rank
        )
    want = [
        (cid, round(s, 6))
        for cid, s in sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    ]
    assert [(r.chunk_id, r.similarity_score) for r in got] == want


def test_hybrid_batch_matches_single_queries(spark, tmp_path):
    """Batch-first hybrid: N text queries through one job per leg must
    equal N single search_hybrid calls exactly — fused scores included —
    with and without metadata filters."""
    cat = VectorCatalog(spark, str(tmp_path / "cat"))
    lib_id, _, _ = _populate(cat, "hybrid-batch")
    queries = ["chunk 3", "chunk 11 chunk", "7"]

    batch = cat.search_hybrid_batch(lib_id, queries, k=4)
    singles = [cat.search_hybrid(lib_id, q, k=4) for q in queries]
    assert [
        [(r.chunk_id, r.similarity_score) for r in res] for res in batch
    ] == [[(r.chunk_id, r.similarity_score) for r in res] for res in singles]

    filt = {"parity": "odd"}
    batch_f = cat.search_hybrid_batch(lib_id, queries, k=4, metadata_filters=filt)
    singles_f = [
        cat.search_hybrid(lib_id, q, k=4, metadata_filters=filt) for q in queries
    ]
    assert [
        [(r.chunk_id, r.similarity_score) for r in res] for res in batch_f
    ] == [[(r.chunk_id, r.similarity_score) for r in res] for res in singles_f]
    assert all(
        int(r.chunk_id[1:]) % 2 == 1 for res in batch_f for r in res
    )


def test_concurrent_writers_cas_lose_and_retry(spark, tmp_path):
    """The concurrent-writer contract (the reference's concurrency e2e,
    tests-mongo/test_e2e_mongo.py:523-572, races chunk creates via
    asyncio.gather): two threads race ``add_chunks`` on ONE library
    through a barrier-synchronized log, so BOTH derive their mutation
    from the same live version. Exactly one commit wins the CAS; the
    loser gets CommitConflictError, re-derives on the new live version
    (``_cas_retry``), and both writers' chunks are present afterward —
    the pointer swap can never silently drop a committed version."""
    import threading

    from vectordb_from_scratch_spark.catalog import (
        CommitConflictError,
        FileVersionLog,
    )

    barrier = threading.Barrier(2)
    state = {"race": False, "waited": 0, "conflicts": 0}
    lock = threading.Lock()

    class RacingLog(FileVersionLog):
        def commit(self, stage_dir, expect):
            if state["race"] and self.dir.endswith("chunks"):
                with lock:
                    wait = state["waited"] < 2
                    if wait:
                        state["waited"] += 1
                if wait:
                    barrier.wait(timeout=60)
            try:
                return super().commit(stage_dir, expect)
            except CommitConflictError:
                with lock:
                    state["conflicts"] += 1
                raise

    cat = VectorCatalog(spark, str(tmp_path / "cat"), log_factory=RacingLog)
    lib_id = cat.create_library("race", DIMS)
    doc_id = cat.create_document(lib_id, "doc-1")
    vecs = _vectors(8)
    state["race"] = True
    errors = []

    def writer(tag, lo, hi):
        try:
            cat.add_chunks(
                lib_id,
                doc_id,
                [
                    {"text": f"{tag} {i}", "embedding": vecs[i].tolist()}
                    for i in range(lo, hi)
                ],
                ids=[f"{tag}{i:02d}" for i in range(lo, hi)],
            )
        except Exception as exc:  # surfaced after join
            errors.append(exc)

    t1 = threading.Thread(target=writer, args=("a", 0, 4))
    t2 = threading.Thread(target=writer, args=("b", 4, 8))
    t1.start()
    t2.start()
    t1.join(120)
    t2.join(120)
    state["race"] = False
    assert not errors
    assert state["conflicts"] >= 1, "the race never happened — barrier bug"
    got = {c["id"] for c in cat.list_chunks(lib_id)}
    want = {f"a{i:02d}" for i in range(4)} | {f"b{i:02d}" for i in range(4, 8)}
    assert got == want


def _brute_filtered_topk(vecs, ids, parities, want_parity, q, k):
    """Driver-side ground truth: cosine top-k over the filter-passing
    chunks, tie-break (score DESC, id ASC)."""
    q = np.asarray(q, dtype="float64")
    qn = q / np.linalg.norm(q)
    scored = []
    for i, cid in enumerate(ids):
        if parities[i] != want_parity:
            continue
        v = vecs[i].astype("float64")
        scored.append((float(np.dot(v / np.linalg.norm(v), qn)), cid))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return scored[:k]


@pytest.mark.parametrize(
    "index_type",
    ["ivf", "pq", "ivfpq", "lsh_simhash", "cascade", "hnsw", "hnsw_routed"],
)
def test_filtered_search_serves_through_the_index(spark, tmp_path, index_type, monkeypatch):
    """VERDICT r7 #2 + r8 #1: metadata-filtered search must run the
    indexed path (pre-filtered candidates for the probed tiers,
    filter-at-scoring beams for the graph tiers), not silently forfeit
    the index to a flat scan. With the fixture's full-coverage regime
    (6 clusters ≤ 8 probes; shortlist ≥ passing rows; ef=64 ≥ every
    shard size, so graph beams are exhaustive — the full-beam == exact
    contract under filters) the indexed result EQUALS the filtered flat
    scan for ivf/pq/ivfpq/hnsw/hnsw_routed; lsh's bucket probing is not
    full-coverage, so there the contract is hits-pass-filter + exact
    scores + hits drawn from the brute-force ranking. A monkeypatched
    flat scorer proves the index path actually served the query."""
    from vectordb_from_scratch_spark.operators import knn as knn_ops

    cat = VectorCatalog(spark, str(tmp_path / index_type))
    lib_id, _, ids = _populate(cat, f"filtered-{index_type}", index_type=index_type)
    vecs = _vectors()
    parities = ["even" if i % 2 == 0 else "odd" for i in range(len(vecs))]
    # query = an EVEN chunk's own vector: its exact duplicate passes the
    # filter and shares the query's lsh bucket, so bucket probing always
    # has at least one passing candidate
    q = vecs[0].tolist()
    k = 3  # 24 passing rows >= FILTERED_ANN_MIN_PASS * 3

    flat_calls = []
    orig_topk = knn_ops.topk
    monkeypatch.setattr(
        knn_ops, "topk", lambda *a, **kw: flat_calls.append(1) or orig_topk(*a, **kw)
    )
    got = cat.search(lib_id, q, k=k, metadata_filters={"parity": "even"})
    assert not flat_calls, f"{index_type}: filtered search fell back to the flat scan"
    want = _brute_filtered_topk(vecs, ids, parities, "even", q, k)
    got_pairs = [(r.chunk_id, r.similarity_score) for r in got]
    assert all(int(cid[1:]) % 2 == 0 for cid, _ in got_pairs)
    if index_type == "lsh_simhash":
        # bucket probing may miss distant passing rows; every hit must
        # still score exactly and come from the brute-force ordering
        truth = dict((cid, s) for s, cid in _brute_filtered_topk(
            vecs, ids, parities, "even", q, len(ids)))
        assert got_pairs and all(
            truth[cid] == pytest.approx(score, rel=1e-9) for cid, score in got_pairs
        )
    else:
        assert [c for c, _ in got_pairs] == [c for _, c in want]
        # graph-tier serve output rounds scores to 6dp (search_graphs /
        # routed_search contract) — compare at that grain there
        tol = (
            {"abs": 1e-6}
            if index_type in ("hnsw", "hnsw_routed")
            else {"rel": 1e-9}
        )
        for (cid, score), (wscore, _) in zip(got_pairs, want):
            assert score == pytest.approx(wscore, **tol)

    # selectivity gate: at k=10 only 24 rows pass < 8*10 — the exact
    # scan is the right plan and must be the one that runs
    flat_calls.clear()
    got_flat = cat.search(lib_id, q, k=10, metadata_filters={"parity": "even"})
    assert flat_calls, f"{index_type}: low-selectivity filter should route to flat"
    want10 = _brute_filtered_topk(vecs, ids, parities, "even", q, 10)
    assert [r.chunk_id for r in got_flat] == [c for _, c in want10]


def test_commit_inside_read_write_window_conflicts(spark, tmp_path, monkeypatch):
    """The ADVICE r7 high finding, deterministically: a racer commits
    BETWEEN a mutator's read and its write (not inside commit(), where
    the r7 barrier test raced). Pre-fix, ``write_partition`` re-resolved
    ``expect`` at write time, so the stale frame passed the CAS with the
    racer's version as expect and silently erased the racer's chunks.
    Post-fix the frame carries the pinned version from ``read_pinned``,
    the commit conflicts, ``_cas_retry`` re-derives, and BOTH writers'
    chunks survive."""
    from vectordb_from_scratch_spark.catalog import (
        CommitConflictError,
        FileVersionLog,
        TableStore,
    )

    state = {"armed": False, "conflicts": 0}

    class CountingLog(FileVersionLog):
        def commit(self, stage_dir, expect):
            try:
                return super().commit(stage_dir, expect)
            except CommitConflictError:
                state["conflicts"] += 1
                raise

    cat = VectorCatalog(spark, str(tmp_path / "cat"), log_factory=CountingLog)
    lib_id = cat.create_library("window-race", DIMS)
    doc_id = cat.create_document(lib_id, "doc-1")
    vecs = _vectors(8)

    orig = TableStore.read_pinned

    def hooked(self, version=None):
        out = orig(self, version)
        if state["armed"] and self.dir.endswith("chunks"):
            state["armed"] = False  # one shot; the racer below re-enters
            cat.add_chunks(
                lib_id,
                doc_id,
                [
                    {"text": f"racer {i}", "embedding": vecs[i].tolist()}
                    for i in range(4, 8)
                ],
                ids=[f"r{i:02d}" for i in range(4, 8)],
            )
        return out

    monkeypatch.setattr(TableStore, "read_pinned", hooked)
    state["armed"] = True
    cat.add_chunks(
        lib_id,
        doc_id,
        [{"text": f"victim {i}", "embedding": vecs[i].tolist()} for i in range(4)],
        ids=[f"a{i:02d}" for i in range(4)],
    )
    assert state["conflicts"] >= 1, (
        "the read->write window commit passed the CAS — expect was "
        "re-resolved at write time instead of pinned at read time"
    )
    got = {c["id"] for c in cat.list_chunks(lib_id)}
    want = {f"a{i:02d}" for i in range(4)} | {f"r{i:02d}" for i in range(4, 8)}
    assert got == want


def test_stale_commit_lock_recovers_without_manual_repair(spark, tmp_path):
    """A writer killed inside the FileVersionLog critical section leaves
    its lockfile behind; the next commit must break the dead holder's
    lock and proceed instead of spinning to the 30s timeout and
    demanding manual removal (ADVICE r7)."""
    import os
    import time as _time

    cat = VectorCatalog(spark, str(tmp_path / "cat"))
    lib_id = cat.create_library("stale-lock", DIMS)
    # plant a lock naming a PID that cannot exist (> pid_max default)
    lockfile = cat.libraries.log.lockfile
    with open(lockfile, "w") as f:
        f.write(f"99999999 {_time.time()}")
    t0 = _time.monotonic()
    cat.update_library(lib_id, metadata={"touched": "yes"})
    assert _time.monotonic() - t0 < 20, "stale lock was not broken"
    assert cat.get_library(lib_id)["metadata"]["touched"] == "yes"
    assert not os.path.exists(lockfile)


def test_txn_log_end_to_end_history_and_conflict(spark, tmp_path):
    """The Delta-shaped commit-log adapter (TxnVersionLog) is a REAL
    second VersionLog: full CRUD + search e2e runs against it unchanged
    (proving the catalog holds no hidden pointer-file assumptions),
    ``history()`` replays commits, a fresh catalog instance resolves the
    live version from the log alone, and a stale-expect commit raises
    CommitConflictError leaving the log unchanged."""
    import os

    from vectordb_from_scratch_spark.catalog import (
        CommitConflictError,
        TxnVersionLog,
    )

    cat = VectorCatalog(spark, str(tmp_path / "cat"), log_factory=TxnVersionLog)
    assert isinstance(cat.chunks.log, TxnVersionLog)
    lib_id, doc_id, ids = _populate(cat, "txn-log")
    res = cat.search(lib_id, _vectors()[0].tolist(), k=1)
    assert res[0].chunk_id == ids[0]
    # no mutable pointer anywhere — the commit log IS the source of truth
    assert not os.path.exists(os.path.join(str(tmp_path / "cat"), "chunks", "_LATEST"))
    hist = cat.chunks.log.history()
    assert hist and hist[-1]["version"] == cat.chunks.log.latest()
    assert [h["n"] for h in hist] == sorted(h["n"] for h in hist)
    # mutation continues to work and advances the log
    cat.update_chunk(lib_id, ids[0], text="patched")
    assert cat.get_chunk(lib_id, ids[0])["text"] == "patched"
    # a fresh instance over the same root resolves from the log
    cat2 = VectorCatalog(spark, str(tmp_path / "cat"), log_factory=TxnVersionLog)
    assert {c["id"] for c in cat2.list_chunks(lib_id)} == set(ids)
    # stale expect = CAS conflict; live version untouched, stage removed
    stage = cat2.chunks._stage_dir()
    os.makedirs(stage)
    before = cat2.chunks.log.latest()
    with pytest.raises(CommitConflictError):
        cat2.chunks.log.commit(stage, expect=None)
    assert cat2.chunks.log.latest() == before
    assert not os.path.exists(stage)


def test_concurrent_search_no_interference(spark, tmp_path):
    """VERDICT r10 #5: the reference is a concurrent service — N
    simultaneous callers must each get exactly the serial answer. Eight
    threads drive mixed single/batch searches across two warm index
    types in one SparkSession (Spark schedules concurrently-submitted
    jobs; each thread tags its own FAIR pool — a no-op under local FIFO,
    the real setting on a shared cluster) and every result must equal
    the serial baseline: no interference through the shared plan/index/
    version caches. tools/serve_bench.py measures the same contract at
    20k vectors with q/s + p50/p95 (SCALE.md r11)."""
    from concurrent.futures import ThreadPoolExecutor

    cat = VectorCatalog(spark, str(tmp_path))
    vecs = _vectors()
    libs = {}
    for itype in ("flat", "ivf"):
        lib_id, _, _ = _populate(cat, f"conc-{itype}", index_type=itype)
        cat.search(lib_id, vecs[0].tolist(), k=5)  # warm the lazy index
        libs[itype] = lib_id

    queries = [vecs[i].tolist() for i in (0, 7, 21, 40)]
    expected = {
        (itype, qi): [
            (r.chunk_id, round(r.similarity_score, 9))
            for r in cat.search(libs[itype], q, k=5)
        ]
        for itype, lib in libs.items()
        for qi, q in enumerate(queries)
    }

    def call(task):
        tid, itype, qi = task
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", f"pool{tid}")
        got = [
            (r.chunk_id, round(r.similarity_score, 9))
            for r in cat.search(libs[itype], queries[qi], k=5)
        ]
        return (itype, qi), got

    tasks = [
        (tid, itype, qi)
        for tid in range(8)
        for itype in ("flat", "ivf")
        for qi in (tid % len(queries),)
    ]
    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(call, tasks))
    for key, got in results:
        assert got == expected[key], key
