"""vectordb_from_scratch_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of lucas-oma/vectorDB_from_scratch.

The reference (/root/reference) is a from-scratch vector database: a
Library → Document → Chunk hierarchy, three vector indexes (flat exact k-NN,
IVF k-means, SimHash LSH), MongoDB persistence. This package re-expresses all
of that Spark-first:

- entities are DataFrames/tables (``schemas``, ``catalog``)
- similarity kernels are Column expressions (``functions.linalg``)
- flat k-NN is a scored scan + top-k (``operators.knn``)
- IVF is KMeans + a partition-pruned probe join (``operators.ivf``)
- LSH is a seeded-hyperplane key computation + bucket semi-join
  (``operators.lsh``)
- plus the LLM-data-pipeline extensions: dedup, text analysis, event
  windows, multimodal plumbing (``operators.dedup/textstats/events/
  multimodal``) and relational coverage (``operators.tpch``).

Everything is DataFrame-in → DataFrame-out; no RDDs in the hot path.
"""

__version__ = "0.1.0"
