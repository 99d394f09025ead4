"""Library compaction (the OPTIMIZE analog for the incremental-write path).

Contract under test:
- repeated delta ingests fragment a library's chunk partition (this is
  measured, not assumed — the test asserts growth before compacting);
- ``compact_library`` shrinks the touched library's chunk partition to
  the target file count and each index sidecar to one file per
  partition value;
- search results are IDENTICAL before and after (content is untouched);
- other libraries' chunk partition files keep their inodes (hardlinked
  verbatim, zero bytes copied) and their sidecars are not visited;
- deltas keep working after compaction (the sidecar stays maintainable).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from vectordb_from_scratch_spark.catalog import VectorCatalog

DIMS = 8


def _vecs(n: int, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n, DIMS)).astype("float32")


@pytest.fixture()
def cat(spark, tmp_path):
    return VectorCatalog(spark, str(tmp_path))


def _ingest_batches(cat, lib_id, doc_id, n_batches: int, per_batch: int, tag: str):
    vecs = _vecs(n_batches * per_batch)
    for b in range(n_batches):
        items = [
            {"text": f"{tag} {b}:{i}", "embedding": vecs[b * per_batch + i].tolist()}
            for i in range(per_batch)
        ]
        cat.add_chunks(
            lib_id, doc_id, items,
            ids=[f"{tag}-{b:02d}-{i:02d}" for i in range(per_batch)],
        )
    return vecs


def _search_ids(cat, lib_id, q, k=10):
    return [(r.chunk_id, round(r.similarity_score, 6)) for r in cat.search(lib_id, q, k=k)]


@pytest.mark.parametrize("index_type", ["flat", "ivf", "hnsw"])
def test_compaction_shrinks_files_preserves_search(cat, index_type):
    lib = cat.create_library(f"hot-{index_type}", DIMS, index_type=index_type)
    doc = cat.create_document(lib, "d1")
    vecs = _ingest_batches(cat, lib, doc, n_batches=6, per_batch=8, tag="x")
    q = vecs[3].tolist()
    before_hits = _search_ids(cat, lib, q)

    frag = len(cat.chunks.partition_files(f"library_id={lib}"))
    assert frag > 1, "fixture did not fragment — compaction test is vacuous"

    report = cat.compact_library(lib)
    assert report["chunks"]["files_after"] == 1
    assert report["chunks"]["files_before"] == frag
    assert report["chunks"]["rows"] == 48
    if index_type == "ivf":
        side = report["assignments"]
        assert side["files_after"] <= side["files_before"]
        # one file per cluster partition value
        root = cat._index_path(lib, "assignments")
        for entry in os.listdir(root):
            p = os.path.join(root, entry)
            if os.path.isdir(p) and entry.startswith("cluster_id="):
                files = [f for f in os.listdir(p) if f.endswith(".parquet")]
                assert len(files) == 1, f"{entry}: {files}"

    assert _search_ids(cat, lib, q) == before_hits


def test_compaction_leaves_other_libraries_hardlinked(cat):
    lib_a = cat.create_library("lib-a", DIMS)
    lib_b = cat.create_library("lib-b", DIMS)
    doc_a = cat.create_document(lib_a, "da")
    doc_b = cat.create_document(lib_b, "db")
    _ingest_batches(cat, lib_a, doc_a, n_batches=4, per_batch=6, tag="a")
    vb = _ingest_batches(cat, lib_b, doc_b, n_batches=4, per_batch=6, tag="b")

    b_before = {
        (os.path.basename(f), os.stat(f).st_ino)
        for f in cat.chunks.partition_files(f"library_id={lib_b}")
    }
    cat.compact_library(lib_a)
    b_after = {
        (os.path.basename(f), os.stat(f).st_ino)
        for f in cat.chunks.partition_files(f"library_id={lib_b}")
    }
    assert b_before == b_after, "untouched library's files were rewritten"
    # and lib-b still serves
    assert len(_search_ids(cat, lib_b, vb[0].tolist())) == 10


def test_deltas_still_work_after_compaction(cat):
    lib = cat.create_library("lib-post", DIMS, index_type="ivf")
    doc = cat.create_document(lib, "d1")
    vecs = _ingest_batches(cat, lib, doc, n_batches=3, per_batch=8, tag="p")
    cat.compact_library(lib)
    extra = _vecs(1, seed=99)[0]
    cat.add_chunks(lib, doc, [{"text": "late", "embedding": extra.tolist()}], ids=["late-1"])
    hits = _search_ids(cat, lib, extra.tolist(), k=1)
    assert hits[0][0] == "late-1"
    # second compaction is a no-op-safe idempotent pass
    report = cat.compact_library(lib)
    assert report["chunks"]["files_after"] == 1
    assert _search_ids(cat, lib, extra.tolist(), k=1)[0][0] == "late-1"
