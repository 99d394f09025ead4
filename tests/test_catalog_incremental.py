"""Incremental index maintenance + partition-scoped TableStore writes.

The scale contract under test:
- a single-chunk mutation must NOT rewrite the whole chunks table — only
  the touched library's partition (untouched partitions are hardlinks of
  the previous version's files: same inode, zero bytes copied);
- a single-chunk mutation on a fresh IVF/LSH index must NOT recompute the
  assignments/buckets table — only the affected cluster / id-hash
  partitions rewrite (untouched partition files keep their inodes);
- the previous table version is retained for lazy readers, older ones GC.

Reference parity: per-row index add/update/remove
(app/core/indexes/ivf.py:50-89, lsh_simhash.py:60-102).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from vectordb_from_scratch_spark.catalog import VectorCatalog

DIMS = 8
N = 48


def _vectors(n: int = N, d: int = DIMS) -> np.ndarray:
    rng = np.random.default_rng(7)
    return rng.standard_normal((n, d)).astype("float32")


def _populate(cat: VectorCatalog, name: str, index_type: str = "flat"):
    lib_id = cat.create_library(name, DIMS, index_type=index_type)
    doc_id = cat.create_document(lib_id, "doc-1")
    vecs = _vectors()
    items = [{"text": f"chunk {i}", "embedding": vecs[i].tolist()} for i in range(N)]
    ids = cat.add_chunks(lib_id, doc_id, items, ids=[f"c{i:03d}" for i in range(N)])
    return lib_id, doc_id, ids


@pytest.fixture()
def cat(spark, tmp_path):
    return VectorCatalog(spark, str(tmp_path))


def _partition_inodes(root: str) -> dict[str, set[tuple[str, int]]]:
    """partition dir name -> {(filename, inode)} for parquet files."""
    out = {}
    for entry in os.listdir(root):
        p = os.path.join(root, entry)
        if os.path.isdir(p) and "=" in entry:
            out[entry] = {
                (f, os.stat(os.path.join(p, f)).st_ino)
                for f in os.listdir(p)
                if f.endswith(".parquet")
            }
    return out


def _latest_version_dir(store) -> str:
    return os.path.join(store.dir, store._latest())


def test_write_partition_drops_stray_rows_outside_values(cat):
    """write_partition must ignore part_df rows for partitions NOT in
    `values`: those partitions were just hardlinked from the current
    version, so appending stray rows would silently duplicate data."""
    lib_a, _, _ = _populate(cat, "stray-a")
    lib_b, _, _ = _populate(cat, "stray-b")
    from pyspark.sql import functions as F

    store = cat.chunks
    cur = store.read()
    before = cur.filter(F.col("library_id") == lib_b).count()
    part_a = cur.filter(F.col("library_id").isin([lib_a, lib_b]))
    # part_df claims to cover only lib_a but carries lib_b rows too
    store.write_partition(part_a, "library_id", [lib_a])
    after = store.read()
    assert after.filter(F.col("library_id") == lib_b).count() == before
    assert after.filter(F.col("library_id") == lib_a).count() == N


def test_chunk_update_rewrites_only_touched_library_partition(cat):
    """TableStore.write_partition: the untouched library's partition files
    in the NEW version are hardlinks (same inode) of the old version's —
    byte-identical by construction, zero data rewritten."""
    lib_a, _, _ = _populate(cat, "lib-a")
    lib_b, _, ids_b = _populate(cat, "lib-b")

    before = _partition_inodes(_latest_version_dir(cat.chunks))
    cat.update_chunk(lib_b, ids_b[0], text="patched")
    after = _partition_inodes(_latest_version_dir(cat.chunks))

    assert after[f"library_id={lib_a}"] == before[f"library_id={lib_a}"]  # hardlinked
    assert after[f"library_id={lib_b}"] != before[f"library_id={lib_b}"]  # rewritten
    assert cat.get_chunk(lib_b, ids_b[0])["text"] == "patched"


def test_tablestore_retains_exactly_previous_version(cat):
    lib_id, _, ids = _populate(cat, "versioned")
    store = cat.chunks
    v1 = store._latest()
    cat.update_chunk(lib_id, ids[0], text="one")
    v2 = store._latest()
    assert os.path.isdir(os.path.join(store.dir, v1))  # N-1 retained
    cat.update_chunk(lib_id, ids[1], text="two")
    versions = {e for e in os.listdir(store.dir) if e.startswith("v")}
    assert versions == {v2, store._latest()}  # v1 GC'd, exactly two kept


def test_ivf_delta_touches_only_affected_cluster_partitions(cat):
    """Single-chunk embedding update on a fresh IVF index: the assignments
    table is NOT recomputed — untouched cluster partitions keep their
    inodes; only the old/new cluster of the touched chunk rewrite."""
    lib_id, _, ids = _populate(cat, "ivf-delta", index_type="ivf")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=3)  # build index
    apath = cat._index_path(lib_id, "assignments")
    before = _partition_inodes(apath)
    assert len(before) >= 3, "need several clusters for the assertion to bite"

    cat.update_chunk(lib_id, ids[5], embedding=(vecs[5] * -1.0).tolist())
    assert not cat._index_meta(lib_id).get("stale")
    after = _partition_inodes(apath)

    changed = {p for p in after if after.get(p) != before.get(p)}
    unchanged = {p for p in after if after.get(p) == before.get(p)}
    assert changed, "the touched chunk's cluster partition must rewrite"
    assert len(changed) <= 2, f"at most old+new cluster may rewrite, got {changed}"
    assert unchanged, "untouched cluster partitions must keep their files"

    # and the index actually reflects the update
    res = cat.search(lib_id, (vecs[5] * -1.0).tolist(), k=3)
    assert res[0].chunk_id == ids[5]


def test_ivf_delta_delete_removes_rows_without_rebuild(cat):
    lib_id, _, ids = _populate(cat, "ivf-del", index_type="ivf")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=3)
    n_before = cat.spark.read.parquet(cat._index_path(lib_id, "assignments")).count()

    cat.delete_chunks(lib_id, [ids[3], ids[4]])
    assert not cat._index_meta(lib_id).get("stale")
    assign = cat.spark.read.parquet(cat._index_path(lib_id, "assignments"))
    assert assign.count() == n_before - 2
    assert assign.filter(assign["id"].isin([ids[3], ids[4]])).count() == 0
    got = {r.chunk_id for r in cat.search(lib_id, vecs[3].tolist(), k=5)}
    assert ids[3] not in got


def test_lsh_delta_touches_only_affected_id_partitions(cat):
    lib_id, _, ids = _populate(cat, "lsh-delta", index_type="lsh_simhash")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=3)  # build buckets
    bpath = cat._index_path(lib_id, "buckets")
    before = _partition_inodes(bpath)
    assert len(before) >= 3

    cat.update_chunk(lib_id, ids[7], embedding=(vecs[7] * -1.0).tolist())
    assert not cat._index_meta(lib_id).get("stale")
    after = _partition_inodes(bpath)
    changed = {p for p in after if after.get(p) != before.get(p)}
    unchanged = {p for p in after if after.get(p) == before.get(p)}
    assert len(changed) == 1, f"exactly the touched id's partition, got {changed}"
    assert unchanged

    res = cat.search(lib_id, (vecs[7] * -1.0).tolist(), k=3)
    assert res[0].chunk_id == ids[7]


def test_delete_document_cascades_via_delta(cat):
    lib_id, doc_id, ids = _populate(cat, "doc-del", index_type="ivf")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=3)
    doc2 = cat.create_document(lib_id, "doc-2")
    extra = cat.add_chunks(
        lib_id, doc2, [{"text": "x", "embedding": vecs[0].tolist()}], ids=["cX"]
    )
    assert not cat._index_meta(lib_id).get("stale")

    cat.delete_document(lib_id, doc_id)  # removes the original 48 chunks
    assert not cat._index_meta(lib_id).get("stale")
    assign = cat.spark.read.parquet(cat._index_path(lib_id, "assignments"))
    assert {r["id"] for r in assign.collect()} == set(extra)
    res = cat.search(lib_id, vecs[0].tolist(), k=3)
    assert [r.chunk_id for r in res] == ["cX"]


def test_tablestore_time_travel_reads_previous_version(cat):
    """The retained N-1 version is readable by name: a snapshot read from
    before a mutation still shows the pre-mutation row."""
    from vectordb_from_scratch_spark.catalog import NotFoundError

    lib_id, _, ids = _populate(cat, "tt-lib")
    store = cat.chunks
    v_before = store._latest()
    cat.update_chunk(lib_id, ids[0], text="mutated")

    old = store.read(version=v_before).filter(f"id = '{ids[0]}'").collect()
    new = store.read().filter(f"id = '{ids[0]}'").collect()
    assert old[0]["text"] == "chunk 0" and new[0]["text"] == "mutated"
    assert v_before in store.versions() and len(store.versions()) == 2

    cat.update_chunk(lib_id, ids[1], text="again")  # v_before GC'd now
    with pytest.raises(NotFoundError):
        store.read(version=v_before)


def test_cascade_search_equals_standalone_operator(cat):
    """The catalog's cascade index (r8, VERDICT r7 #6) must EQUAL the
    standalone quantization.cascade_search funnel on the same corpus —
    same tiers, same global cuts, same (score, id) tie order — while
    serving tiers 1-2 from the PRECOMPUTED sidecar instead of
    re-encoding floats per query."""
    import pandas as pd

    from vectordb_from_scratch_spark.operators import quantization as quant

    lib_id, _, ids = _populate(cat, "cascade-lib", index_type="cascade")
    vecs = _vectors()
    qs = [vecs[3].tolist(), vecs[29].tolist()]
    k = 4
    got = cat.search_batch(lib_id, qs, k=k)
    assert got[0][0].chunk_id == ids[3] and got[1][0].chunk_id == ids[29]

    corpus = cat.chunks.read().filter(f"library_id = '{lib_id}'")
    qpdf = pd.DataFrame(
        {"query_id": range(len(qs)), "query_vec": [[float(x) for x in q] for q in qs]}
    )
    want_rows = quant.cascade_search(
        corpus, qpdf, k=k, prefilter=cat.CASCADE_PREFILTER,
        id_col="id", vec_col="embedding",
    ).collect()
    want = [[] for _ in qs]
    for r in sorted(want_rows, key=lambda r: (r["query_id"], r["rank"])):
        want[int(r["query_id"])].append((r["id"], round(float(r["score"]), 9)))
    assert [
        [(r.chunk_id, round(r.similarity_score, 9)) for r in res] for res in got
    ] == want
    meta = cat._index_meta(lib_id)
    assert meta["type"] == "cascade" and meta["n"] == N


def test_cascade_delta_touches_only_affected_id_partitions(cat):
    """Per-chunk mutation on a cascade index re-encodes only the touched
    id's partition (bits/codes are per-row functions of the embedding) —
    the LSH/PQ partition-scoped contract, checked at the inode level."""
    lib_id, _, ids = _populate(cat, "cascade-delta", index_type="cascade")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=3)  # build funnel sidecar
    fpath = cat._index_path(lib_id, "funnel")
    before = _partition_inodes(fpath)
    assert len(before) >= 3

    cat.update_chunk(lib_id, ids[7], embedding=(vecs[7] * -1.0).tolist())
    assert not cat._index_meta(lib_id).get("stale")
    after = _partition_inodes(fpath)
    changed = {p for p in after if after.get(p) != before.get(p)}
    unchanged = {p for p in after if after.get(p) == before.get(p)}
    assert len(changed) == 1, f"exactly the touched id's partition, got {changed}"
    assert unchanged

    res = cat.search(lib_id, (vecs[7] * -1.0).tolist(), k=3)
    assert res[0].chunk_id == ids[7]

    # delete removes rows from the sidecar without a rebuild
    cat.delete_chunks(lib_id, [ids[7]])
    assert not cat._index_meta(lib_id).get("stale")
    funnel = cat.spark.read.parquet(fpath)
    assert funnel.filter(f"id = '{ids[7]}'").count() == 0
    res = cat.search(lib_id, vecs[8].tolist(), k=3)
    assert res[0].chunk_id == ids[8]


def test_pq_search_finds_self_match(cat):
    """PQ-indexed library: a stored vector's own embedding must return it
    at rank 1 (ADC shortlist + exact rerank — self-similarity is 1.0)."""
    lib_id, _, ids = _populate(cat, "pq-lib", index_type="pq")
    vecs = _vectors()
    res = cat.search(lib_id, vecs[11].tolist(), k=3)
    assert res[0].chunk_id == ids[11]
    meta = cat._index_meta(lib_id)
    assert meta["type"] == "pq" and meta["m"] == 8  # DIMS=8 → 8 subspaces


def test_pq_delta_touches_only_affected_id_partitions(cat):
    """Per-chunk mutation on a PQ index re-encodes only the touched id's
    partition against the unchanged codebooks — the same partition-scoped
    contract as LSH buckets."""
    lib_id, _, ids = _populate(cat, "pq-delta", index_type="pq")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=3)  # build codes
    cpath = cat._index_path(lib_id, "codes")
    books_before = cat.spark.read.parquet(
        cat._index_path(lib_id, "codebooks")
    ).count()
    before = _partition_inodes(cpath)
    assert len(before) >= 3

    cat.update_chunk(lib_id, ids[7], embedding=(vecs[7] * -1.0).tolist())
    assert not cat._index_meta(lib_id).get("stale")
    after = _partition_inodes(cpath)
    changed = {p for p in after if after.get(p) != before.get(p)}
    unchanged = {p for p in after if after.get(p) == before.get(p)}
    assert len(changed) == 1, f"exactly the touched id's partition, got {changed}"
    assert unchanged
    # codebooks untouched by the delta
    assert (
        cat.spark.read.parquet(cat._index_path(lib_id, "codebooks")).count()
        == books_before
    )

    res = cat.search(lib_id, (vecs[7] * -1.0).tolist(), k=3)
    assert res[0].chunk_id == ids[7]


def test_pq_train_index_retrains(cat):
    lib_id, _, ids = _populate(cat, "pq-train", index_type="pq")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=1)
    cat.train_index(lib_id)  # explicit retrain must leave a fresh index
    assert not cat._index_meta(lib_id).get("stale")
    res = cat.search(lib_id, vecs[5].tolist(), k=1)
    assert res[0].chunk_id == ids[5]


def test_pq_single_chunk_library_has_no_phantom_codes(cat):
    """A 1-chunk library trains fewer codes than requested; meta must
    record the ACTUAL codebook size so reads never zero-fill phantom
    codes that a later delta could argmax into."""
    lib_id = cat.create_library("pq-tiny", DIMS, index_type="pq")
    doc_id = cat.create_document(lib_id, "d")
    v = _vectors(1)[0]
    (cid,) = cat.add_chunks(
        lib_id, doc_id, [{"text": "only", "embedding": v.tolist()}], ids=["c0"]
    )
    res = cat.search(lib_id, v.tolist(), k=1)
    assert res[0].chunk_id == cid
    meta = cat._index_meta(lib_id)
    books, _ = cat._read_pq(lib_id)
    assert meta["k"] == books.shape[1]  # actual, not requested
    # delta against the tiny codebooks stays consistent
    cat.update_chunk(lib_id, cid, embedding=(v * -1.0).tolist())
    res = cat.search(lib_id, (v * -1.0).tolist(), k=1)
    assert res[0].chunk_id == cid


def test_pq_train_index_validates_and_uses_samples(cat):
    import pytest as _pytest

    from vectordb_from_scratch_spark.catalog import ValidationError

    lib_id, _, ids = _populate(cat, "pq-sample", index_type="pq")
    vecs = _vectors()
    with _pytest.raises(ValidationError):
        cat.train_index(lib_id, sample_vectors=[[1.0, 2.0]])  # wrong dims
    cat.train_index(lib_id, sample_vectors=[v.tolist() for v in vecs[:16]])
    assert not cat._index_meta(lib_id).get("stale")
    res = cat.search(lib_id, vecs[3].tolist(), k=1)
    assert res[0].chunk_id == ids[3]


def test_ivfpq_search_finds_self_match(cat):
    """IVFPQ-indexed library: probe → ADC over cluster-partitioned codes
    → exact rerank must return a stored vector's own embedding at rank 1
    (48 vecs / 6 clusters with 8 probes covers every cluster, so the only
    approximation is PQ's, and the exact rerank undoes it for self)."""
    lib_id, _, ids = _populate(cat, "ivfpq-lib", index_type="ivfpq")
    vecs = _vectors()
    res = cat.search(lib_id, vecs[11].tolist(), k=3)
    assert res[0].chunk_id == ids[11]
    meta = cat._index_meta(lib_id)
    assert meta["type"] == "ivfpq" and meta["m"] == 8 and meta["n_clusters"] == 6


def test_ivfpq_delta_touches_only_affected_cluster_partitions(cat):
    """Per-chunk mutation on an IVFPQ index re-assigns + re-encodes only
    the delta rows and rewrites only the affected CLUSTER partitions of
    the co-located codes table; centroids and codebooks stay untouched."""
    lib_id, _, ids = _populate(cat, "ivfpq-delta", index_type="ivfpq")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=3)  # build the IVFADC layout
    cpath = cat._index_path(lib_id, "ivfpq_codes")
    books_before = cat.spark.read.parquet(
        cat._index_path(lib_id, "codebooks")
    ).count()
    cent_before = cat.spark.read.parquet(
        cat._index_path(lib_id, "centroids")
    ).count()
    before = _partition_inodes(cpath)
    assert len(before) >= 3

    cat.update_chunk(lib_id, ids[7], embedding=(vecs[7] * -1.0).tolist())
    assert not cat._index_meta(lib_id).get("stale")
    after = _partition_inodes(cpath)
    changed = {p for p in after if after.get(p) != before.get(p)}
    unchanged = {p for p in after if after.get(p) == before.get(p)}
    # old cluster + new cluster at most (equal when the flip stays home)
    assert 1 <= len(changed) <= 2, f"only affected clusters may rewrite, got {changed}"
    assert unchanged, "untouched cluster partitions must keep their files"
    assert (
        cat.spark.read.parquet(cat._index_path(lib_id, "codebooks")).count()
        == books_before
    )
    assert (
        cat.spark.read.parquet(cat._index_path(lib_id, "centroids")).count()
        == cent_before
    )

    res = cat.search(lib_id, (vecs[7] * -1.0).tolist(), k=3)
    assert res[0].chunk_id == ids[7]


def test_ivfpq_delete_removes_rows_without_rebuild(cat):
    lib_id, _, ids = _populate(cat, "ivfpq-del", index_type="ivfpq")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=1)
    n_before = cat.spark.read.parquet(
        cat._index_path(lib_id, "ivfpq_codes")
    ).count()
    cat.delete_chunks(lib_id, [ids[3]])
    assert not cat._index_meta(lib_id).get("stale")
    codes = cat.spark.read.parquet(cat._index_path(lib_id, "ivfpq_codes"))
    assert codes.count() == n_before - 1
    assert codes.filter(codes["id"] == ids[3]).count() == 0
    res = cat.search(lib_id, vecs[3].tolist(), k=1)
    assert res[0].chunk_id != ids[3]


def test_ivfpq_train_index_validates_and_uses_samples(cat):
    import pytest as _pytest

    from vectordb_from_scratch_spark.catalog import ValidationError

    lib_id, _, ids = _populate(cat, "ivfpq-sample", index_type="ivfpq")
    vecs = _vectors()
    with _pytest.raises(ValidationError):
        cat.train_index(lib_id, sample_vectors=[[1.0, 2.0]])  # wrong dims
    cat.train_index(lib_id, sample_vectors=[v.tolist() for v in vecs[:16]])
    assert not cat._index_meta(lib_id).get("stale")
    res = cat.search(lib_id, vecs[3].tolist(), k=1)
    assert res[0].chunk_id == ids[3]


def test_ivfpq_non_cosine_metric_falls_back_to_flat(cat):
    """ADVICE r3: an ANN-indexed library must not silently answer an l2
    query with cosine scores — the metric routes to the exact scan."""
    lib_id, _, ids = _populate(cat, "ivfpq-metric", index_type="ivfpq")
    vecs = _vectors()
    res = cat.search(lib_id, vecs[9].tolist(), k=1, metric="l2")
    assert res[0].chunk_id == ids[9]
    # l2 self-distance is 0 → knn.topk's l2 score convention applies


def test_hnsw_search_finds_self_match(cat):
    """HNSW-indexed library: the sharded graph search must return a
    stored vector's own embedding at rank 1 (self-similarity is maximal
    and the per-shard beam starts from a connected graph)."""
    lib_id, _, ids = _populate(cat, "hnsw-lib", index_type="hnsw")
    vecs = _vectors()
    res = cat.search(lib_id, vecs[11].tolist(), k=3)
    assert res[0].chunk_id == ids[11]
    meta = cat._index_meta(lib_id)
    assert meta["type"] == "hnsw" and meta["shards"] >= 2


def test_hnsw_delta_rebuilds_only_affected_shards(cat):
    """Graph-index delta: a per-chunk mutation rebuilds only the graphs
    of the shards whose membership changed; untouched shard partitions
    keep their files (inode-level), and search stays correct."""
    lib_id, _, ids = _populate(cat, "hnsw-delta", index_type="hnsw")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=3)  # build the graph sidecar
    gpath = cat._index_path(lib_id, "graph")
    before = _partition_inodes(gpath)
    assert len(before) >= 3

    cat.update_chunk(lib_id, ids[7], embedding=(vecs[7] * -1.0).tolist())
    assert not cat._index_meta(lib_id).get("stale")
    after = _partition_inodes(gpath)
    changed = {p for p in after if after.get(p) != before.get(p)}
    unchanged = {p for p in after if after.get(p) == before.get(p)}
    assert changed == {f"shard={_shard_of(ids[7])}"}
    assert unchanged, "untouched shard partitions must keep their files"

    res = cat.search(lib_id, (vecs[7] * -1.0).tolist(), k=3)
    assert res[0].chunk_id == ids[7]


def _shard_of(chunk_id: str) -> int:
    import hashlib

    from vectordb_from_scratch_spark.operators import hnsw

    return int(hashlib.md5(chunk_id.encode()).hexdigest()[:15], 16) % hnsw.SHARDS


def test_hnsw_delete_removes_rows_without_rebuild(cat):
    lib_id, _, ids = _populate(cat, "hnsw-del", index_type="hnsw")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=1)
    g = cat.spark.read.parquet(cat._index_path(lib_id, "graph"))
    n_before = g.count()
    cat.delete_chunks(lib_id, [ids[3]])
    assert not cat._index_meta(lib_id).get("stale")
    g2 = cat.spark.read.parquet(cat._index_path(lib_id, "graph"))
    assert g2.count() == n_before - 1
    assert g2.filter(g2["id"] == ids[3]).count() == 0
    # no dangling adjacency: every neighbor id must still be a node
    node_ids = {r["id"] for r in g2.select("id").collect()}
    for r in g2.select("neighbors").collect():
        assert set(r["neighbors"]) <= node_ids
    res = cat.search(lib_id, vecs[3].tolist(), k=1)
    assert res[0].chunk_id != ids[3]


def test_hnsw_routed_search_finds_self_match(cat):
    """hnsw_routed library: IVF routing + bounded cluster graphs through
    the service surface. A stored vector's own embedding must come back
    at rank 1 (its cluster is its nearest centroid, so the router always
    probes the graph that holds it)."""
    lib_id, _, ids = _populate(cat, "hnswr-lib", index_type="hnsw_routed")
    vecs = _vectors()
    res = cat.search(lib_id, vecs[11].tolist(), k=3)
    assert res[0].chunk_id == ids[11]
    meta = cat._index_meta(lib_id)
    assert meta["type"] == "hnsw_routed"
    assert meta["n_clusters"] >= 2 and meta["nsub"]


def test_hnsw_routed_all_probes_full_ef_equals_exact(cat, monkeypatch):
    """The exactness invariant THROUGH the catalog path: probing every
    cluster with an exhaustive beam must equal the flat exact scan —
    same ids, same order — proving routing+graphs lose nothing beyond
    the probe/ef approximation knobs."""
    from vectordb_from_scratch_spark import catalog as cat_mod

    lib_id, _, ids = _populate(cat, "hnswr-exact", index_type="hnsw_routed")
    flat_id, _, flat_ids = _populate(cat, "hnswr-exact-flat", index_type="flat")
    vecs = _vectors()
    monkeypatch.setattr(cat_mod, "ROUTED_N_PROBES", 10_000)
    monkeypatch.setattr(cat_mod, "ROUTED_EF", 10_000)
    for qi in (0, 17, 33):
        routed = cat.search(lib_id, vecs[qi].tolist(), k=5)
        exact = cat.search(flat_id, vecs[qi].tolist(), k=5)
        assert [r.chunk_id for r in routed] == [r.chunk_id for r in exact]
        for a, b in zip(routed, exact):
            assert abs(a.similarity_score - b.similarity_score) < 1e-6


def test_hnsw_routed_bounded_subshards_preserve_catalog_semantics(cat, monkeypatch):
    """Force the member cap to split clusters into md5 sub-shards (the
    100 TB skew defense) and re-assert both contracts: self-match through
    the routed serve path, and all-probes + full-ef == exact — the
    union of a cluster's sub-graphs is the cluster, so the split must be
    invisible to probe semantics even through the service surface."""
    from vectordb_from_scratch_spark import catalog as cat_mod

    monkeypatch.setattr(cat_mod, "ROUTED_MAX_MEMBERS", 6)
    lib_id, _, ids = _populate(cat, "hnswr-bounded", index_type="hnsw_routed")
    flat_id, _, _ = _populate(cat, "hnswr-bounded-flat", index_type="flat")
    vecs = _vectors()
    res = cat.search(lib_id, vecs[5].tolist(), k=3)
    assert res[0].chunk_id == ids[5]
    meta = cat._index_meta(lib_id)
    assert any(int(v) > 1 for v in meta["nsub"].values()), "cap must split"
    monkeypatch.setattr(cat_mod, "ROUTED_N_PROBES", 10_000)
    monkeypatch.setattr(cat_mod, "ROUTED_EF", 10_000)
    for qi in (3, 29):
        routed = cat.search(lib_id, vecs[qi].tolist(), k=5)
        exact = cat.search(flat_id, vecs[qi].tolist(), k=5)
        assert [r.chunk_id for r in routed] == [r.chunk_id for r in exact]


def test_hnsw_routed_delta_rebuilds_only_affected_shards(cat):
    """Incremental maintenance under frozen centroids + nsub: a one-chunk
    update rebuilds exactly the composite shards its old and new
    embeddings map to; every other shard partition keeps its files
    (inode-level), and the updated vector is immediately findable."""
    from vectordb_from_scratch_spark.operators import ivf as ivf_ops

    lib_id, _, ids = _populate(cat, "hnswr-delta", index_type="hnsw_routed")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=1)  # build the sidecars
    gpath = cat._index_path(lib_id, "routed_graph")
    before = _partition_inodes(gpath)
    assert len(before) >= 2

    new_vec = (vecs[7] * -1.0).tolist()
    centroids, _, nsub = cat._read_hnsw_routed(lib_id)
    expected = {
        f"shard={r['shard']}"
        for r in cat._routed_shard_of(
            ivf_ops.assign(
                cat._delta_df([(ids[7], new_vec), (ids[7], vecs[7].tolist())]),
                centroids, id_col="id", vec_col="embedding",
            ),
            nsub,
        ).select("shard").distinct().collect()
    }
    cat.update_chunk(lib_id, ids[7], embedding=new_vec)
    assert not cat._index_meta(lib_id).get("stale")
    after = _partition_inodes(gpath)
    changed = {p for p in after if after.get(p) != before.get(p)}
    assert changed == expected
    assert {p for p in after if after.get(p) == before.get(p)}, (
        "untouched shard partitions must keep their files"
    )
    res = cat.search(lib_id, new_vec, k=3)
    assert res[0].chunk_id == ids[7]


def test_hnsw_routed_delete_removes_rows_without_rebuild(cat):
    lib_id, _, ids = _populate(cat, "hnswr-del", index_type="hnsw_routed")
    vecs = _vectors()
    cat.search(lib_id, vecs[0].tolist(), k=1)
    g = cat.spark.read.parquet(cat._index_path(lib_id, "routed_graph"))
    n_before = g.count()
    cat.delete_chunks(lib_id, [ids[3]])
    assert not cat._index_meta(lib_id).get("stale")
    g2 = cat.spark.read.parquet(cat._index_path(lib_id, "routed_graph"))
    assert g2.count() == n_before - 1
    assert g2.filter(g2["id"] == ids[3]).count() == 0
    node_ids = {r["id"] for r in g2.select("id").collect()}
    for r in g2.select("neighbors").collect():
        assert set(r["neighbors"]) <= node_ids
    res = cat.search(lib_id, vecs[3].tolist(), k=1)
    assert res[0].chunk_id != ids[3]
