"""Similarity / vector-math kernels as pure Column expressions (JVM-side,
whole-stage-codegen — no Python in the hot path).

Reference parity (SURVEY.md §2.1 V1-V4):
- cosine:    reference ``app/core/similarity_metrics.py:16-32`` — A·B/(|A||B|),
             0.0 when either norm is 0, higher-is-better.
- l2:        ``similarity_metrics.py:35-43`` — raw distance, lower-is-better.
- manhattan: ``similarity_metrics.py:46-54`` — raw distance, lower-is-better.
- normalize: ``app/core/indexing.py:16-22`` — unit-normalize unless zero
             vector (left unchanged).

All kernels compute in DOUBLE regardless of the storage type (the driver
tables store ARRAY<FLOAT>); float→double widening is exact, and double
accumulation keeps the DuckDB-oracle hash comparisons stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ — fold in element order (matches a sequential NumPy/DuckDB
    accumulation closely enough for 6-decimal rounding)."""
    a, b = _as_double(a), _as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column | str) -> Column:
    v = _as_double(v)
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity with the reference's zero-vector rule: if either
    norm is 0 the score is 0.0 (``similarity_metrics.py:29-30``)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))


def dot_prenormalized(a: Column | str, b: Column | str) -> Column:
    """Cosine on vectors already unit-normalized at ingest — plain dot
    product, the trick the reference uses everywhere (``ivf.py:101,117``,
    ``lsh_simhash.py:124``): normalize once, score many."""
    return dot(a, b)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = _as_double(a), _as_double(b)
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def manhattan_distance(a: Column | str, b: Column | str) -> Column:
    a, b = _as_double(a), _as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def normalize(v: Column | str) -> Column:
    """Unit-normalize; zero vectors pass through unchanged
    (reference ``app/core/indexing.py:19-21``)."""
    v = _as_double(v)
    n = l2_norm(v)
    return F.when(n == 0.0, v).otherwise(F.transform(v, lambda x: x / n))


#: Metric registry mirroring the reference's SimilarityMetric ABC
#: (``app/core/similarity_metrics.py:6-13``): name → (column builder,
#: higher_is_better). Distances are returned RAW; ordering negates them,
#: exactly like the reference heap (``flat.py:60-70``).
METRICS: dict[str, tuple] = {
    "cosine": (cosine, True),
    "l2": (l2_distance, False),
    "manhattan": (manhattan_distance, False),
}


# --- the cross-engine integer lattice (r10) ----------------------------------
# Registry-free home for the quantization shared by the IVF grid trainer
# (operators/ivf.py) and the LSH lattice keys (operators/lsh.py): unit
# vectors snap to floor(u * KQ_GRID + 0.5), making dots / sums / squared
# norms integer-valued float64 below 2^53 — exact in any summation order,
# in NumPy and DuckDB alike. floor(x+0.5), not round(): np.round is
# half-even while Spark/DuckDB round() is half-up (the SQ8 discipline).

KQ_GRID = 8192  # 2^13: quantization lattice for unit coordinates

#: training-set cap that keeps every lattice sum exact (see the bounds in
#: operators/ivf.py): m <= KQ_SAMPLE members of (KQ_GRID+1)-amplitude
#: vectors keep squared-norm sums under 2^53
KQ_SAMPLE = 8192


def quantize_units_np(X, grid: int = KQ_GRID):
    """(n, d) float64 → integer-valued float64 on the lattice."""
    import numpy as np

    X = X.astype("float64")
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    U = X / np.where(norms == 0, 1.0, norms)
    return np.floor(U * grid + 0.5)
