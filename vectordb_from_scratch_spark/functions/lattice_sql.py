"""Registry-free home for the integer-lattice k-means oracle SQL
(the functions/minhash.py precedent): operators/ivf.py builds its own
query oracles from this, and operators/pq.py embeds the same chain in the
composed IVFPQ oracle — without either importing the other mid-registry.
Constants mirror the reference's IVF defaults (app/core/indexes/ivf.py)."""

from __future__ import annotations

from vectordb_from_scratch_spark.functions import linalg
from vectordb_from_scratch_spark.functions.texthash import hash60_sql

IVF_N_CLUSTERS = 64  # reference ivf.py:22
IVF_N_PROBES = 8  # reference default is 1 (ivf.py:23); 8 hits recall>=0.9
IVF_TRAIN_ITERS = 20  # reference ivf.py:23


def kmeans_grid_sql(
    iters: int = IVF_TRAIN_ITERS,
    k: int = IVF_N_CLUSTERS,
    grid: int = linalg.KQ_GRID,
    sample: int = linalg.KQ_SAMPLE,
    include_base: bool = True,
) -> str:
    """The CTE prefix that replays :func:`kmeans_grid` + the full-corpus
    assignment in DuckDB, ending at ``afin(vec_id, cluster_id)`` and
    ``c{iters}(cluster_id, c)`` — every step integer-exact, so the replay
    is a hash-equality proof of the whole training loop (the SGNS/PCA
    unrolled-oracle discipline applied to Lloyd's; VERDICT r9 #2).
    Precondition: corpus has ≥ k vectors (both fixtures do); Spark's
    early exit fires only at an exact fixed point, which this fixed
    unroll reproduces by construction."""
    g = float(grid)
    parts = [] if not include_base else [
        "raw AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        "unit AS (SELECT vec_id, CASE WHEN sqrt(list_dot_product(e, e)) = 0"
        " THEN e ELSE list_transform(e, x -> x / sqrt(list_dot_product(e, e)))"
        " END AS u FROM raw)",
        f"qv AS MATERIALIZED (SELECT vec_id,"
        f" list_transform(u, x -> floor(x * {g} + 0.5)) AS q FROM unit)",
        f"drw AS MATERIALIZED (SELECT vec_id, q,"
        f" row_number() OVER (ORDER BY {hash60_sql('vec_id::VARCHAR')},"
        f" vec_id) - 1 AS rk FROM qv)",
        f"trn AS MATERIALIZED (SELECT * FROM drw WHERE rk < {sample})",
        "tn AS (SELECT count(*) AS n FROM trn)",
    ]
    parts.append(
        f"c0 AS MATERIALIZED (SELECT rk AS cluster_id, q AS c"
        f" FROM trn WHERE rk < {k})"
    )
    for t in range(iters):
        parts += [
            f"a{t} AS MATERIALIZED (SELECT vec_id, q, cluster_id FROM ("
            f"SELECT t.vec_id, t.q, c.cluster_id,"
            f" row_number() OVER (PARTITION BY t.vec_id"
            f" ORDER BY list_dot_product(t.q, c.c) DESC, c.cluster_id ASC)"
            f" AS rn FROM trn t CROSS JOIN c{t} c) WHERE rn = 1)",
            f"s{t} AS MATERIALIZED (SELECT cluster_id, dim, sum(val) AS sv"
            f" FROM (SELECT cluster_id, generate_subscripts(q, 1) AS dim,"
            f" unnest(q) AS val FROM a{t}) GROUP BY cluster_id, dim)",
            f"w{t} AS MATERIALIZED (SELECT s.cluster_id,"
            f" list(floor(s.sv * {g} / n.nrm + 0.5) ORDER BY s.dim) AS c"
            f" FROM s{t} s JOIN (SELECT cluster_id, sqrt(sum(sv * sv)) AS nrm"
            f" FROM s{t} GROUP BY cluster_id) n USING (cluster_id)"
            f" WHERE n.nrm > 0 GROUP BY s.cluster_id)",
            f"c{t + 1} AS MATERIALIZED (SELECT cluster_id, c FROM w{t}"
            f" UNION ALL SELECT g.cluster_id, t.q AS c FROM ("
            f"SELECT r.range AS cluster_id FROM range({k}) r"
            f" EXCEPT SELECT cluster_id FROM w{t}) g JOIN trn t"
            f" ON t.rk = ({t} * {k} + g.cluster_id) % (SELECT n FROM tn))",
        ]
    parts.append(
        f"afin AS MATERIALIZED (SELECT vec_id, cluster_id FROM ("
        f"SELECT d.vec_id, c.cluster_id,"
        f" row_number() OVER (PARTITION BY d.vec_id"
        f" ORDER BY list_dot_product(d.q, c.c) DESC, c.cluster_id ASC) AS rn"
        f" FROM drw d CROSS JOIN c{iters} c) WHERE rn = 1)"
    )
    return ",\n".join(parts)


#: LSH hyperplane coordinate amplitude: lattice ints in [-127, 127]
#: (mirrored by operators/lsh.py H_AMP)
LSH_H_AMP = 127


def lsh_keys_sql(
    n_tables: int, n_bits: int, dims: int = 64, seed: int = 42
) -> str:
    """CTE prefix replaying :func:`hyperplanes` + :func:`_keys_matrix` in
    DuckDB, ending at ``lkeys(vec_id, table_id, key)`` — exact because
    every projection is integer arithmetic on the shared lattices (r10).
    ``dims`` is a literal (the fixture is d=64); reuses the kmeans oracle's
    quantization CTEs (raw/unit/qv)."""
    g = float(linalg.KQ_GRID)
    hexpr = hash60_sql(f"'lsh|{seed}|' || t || '|' || b || '|' || j")
    return f"""
raw AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
unit AS (SELECT vec_id, CASE WHEN sqrt(list_dot_product(e, e)) = 0 THEN e
              ELSE list_transform(e, x -> x / sqrt(list_dot_product(e, e)))
         END AS u FROM raw),
qv AS MATERIALIZED (SELECT vec_id,
        list_transform(u, x -> floor(x * {g} + 0.5)) AS q FROM unit),
pl AS MATERIALIZED (
  SELECT r1.range AS t, r2.range AS b, r3.range AS j,
         ({hexpr} % {2 * LSH_H_AMP + 1}) - {LSH_H_AMP} AS h
  FROM range({n_tables}) r1, range({n_bits}) r2, range({dims}) r3),
vx AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(q, 1) - 1 AS j, unnest(q) AS val
  FROM qv),
proj AS MATERIALIZED (
  SELECT v.vec_id, p.t, p.b, sum(v.val * p.h) AS pr
  FROM vx v JOIN pl p ON p.j = v.j GROUP BY 1, 2, 3),
lkeys AS MATERIALIZED (
  SELECT vec_id, t::INT AS table_id,
         sum(CASE WHEN pr > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT AS key
  FROM proj GROUP BY vec_id, t)"""
