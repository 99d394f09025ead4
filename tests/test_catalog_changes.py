"""Change data feed between TableStore versions (the Delta CDF analog).

Contract under test: ``TableStore.changes`` / ``VectorCatalog.chunk_changes``
classifies exactly the rows the last mutation touched — insert, delete,
update_postimage — and nothing else; a no-op diff is empty; the feed
window matches the N-1 retention that time travel already guarantees.
"""

from __future__ import annotations

import numpy as np
import pytest

from vectordb_from_scratch_spark.catalog import VectorCatalog

DIMS = 8


@pytest.fixture()
def cat(spark, tmp_path):
    return VectorCatalog(spark, str(tmp_path))


def _items(n, seed=5):
    vecs = np.random.default_rng(seed).standard_normal((n, DIMS)).astype("float32")
    return [{"text": f"t{i}", "embedding": vecs[i].tolist()} for i in range(n)]


def test_first_write_is_all_inserts(cat):
    lib = cat.create_library("cdf", DIMS)
    doc = cat.create_document(lib, "d1")
    cat.add_chunks(lib, doc, _items(3), ids=["a", "b", "c"])
    # documents table had a prior version (library create writes no chunks),
    # but the CHUNKS table's first version is all-insert
    feed = {(r["id"], r["_change_type"]) for r in cat.chunk_changes(lib).collect()}
    assert feed == {("a", "insert"), ("b", "insert"), ("c", "insert")}


def test_upsert_feed_classifies_insert_and_update(cat):
    lib = cat.create_library("cdf2", DIMS)
    doc = cat.create_document(lib, "d1")
    cat.add_chunks(lib, doc, _items(3), ids=["a", "b", "c"])
    new = _items(2, seed=9)
    cat.upsert_chunks(lib, doc, new, ids=["b", "d"])  # replace b, insert d
    feed = {(r["id"], r["_change_type"]) for r in cat.chunk_changes(lib).collect()}
    assert feed == {("b", "update_postimage"), ("d", "insert")}
    # postimage carries the NEW content
    row = {r["id"]: r for r in cat.chunk_changes(lib).collect()}
    assert row["b"]["text"] == new[0]["text"]


def test_delete_feed_and_identical_versions_empty(cat):
    lib = cat.create_library("cdf3", DIMS)
    doc = cat.create_document(lib, "d1")
    cat.add_chunks(lib, doc, _items(3), ids=["a", "b", "c"])
    cat.delete_chunks(lib, ["c"])
    feed = {(r["id"], r["_change_type"]) for r in cat.chunk_changes(lib).collect()}
    assert feed == {("c", "delete")}
    # an upsert that rewrites a row with IDENTICAL content is not a change
    chunk = cat.get_chunk(lib, "a")
    cat.upsert_chunks(
        lib, doc,
        [{"text": chunk["text"], "embedding": chunk["embedding"],
          "metadata": chunk["metadata"]}],
        ids=["a"],
    )
    assert cat.chunk_changes(lib).count() == 0
