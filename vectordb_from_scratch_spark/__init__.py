"""vectordb_from_scratch_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of lucas-oma/vectorDB_from_scratch.

The reference (/root/reference) is a from-scratch vector database: a
Library → Document → Chunk hierarchy, three vector indexes (flat exact k-NN,
IVF k-means, SimHash LSH), MongoDB persistence. This package re-expresses all
of that Spark-first:

- entities are DataFrames/tables (``catalog``: CRUD, search dispatch,
  versioned storage, lazy index rebuild)
- similarity kernels are Column expressions + Arrow matmuls
  (``functions.linalg``, ``operators.knn``)
- IVF is sampled driver-side Lloyd's + an Arrow assignment pass + a
  partition-pruned probe join (``operators.ivf``)
- LSH is a seeded-hyperplane key computation + bucket semi-join
  (``operators.lsh``)
- embedding generation is a pluggable bounded-batch provider
  (``functions.embedder``)
- plus the LLM-data-pipeline extensions: dedup families + duplicate
  clustering (``operators.dedup``, ``operators.pipeline``), text
  analysis + fuzzy matching (``operators.textstats``), event windows /
  sessionization / hypertable rollups / JSON props
  (``operators.events``), as-of + range joins (``operators.temporal``),
  skew-safe shapes (``operators.skew``), sketches
  (``operators.sketches``), sampling/splits (``operators.sampling``),
  multimodal plumbing (``operators.multimodal``), relational coverage
  (``operators.tpch``, ``operators.catalog_ops``), streaming twins +
  stateful ops (``streaming``), format connectors (``sources``), and
  plan introspection (``plans``).

Everything is DataFrame-in → DataFrame-out; no RDDs anywhere. Python
runs only inside Arrow-batched kernels at BLAS boundaries.
"""

__version__ = "0.1.0"
