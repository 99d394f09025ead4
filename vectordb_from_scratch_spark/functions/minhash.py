"""MinHash parameters + DuckDB SQL fragments, registry-free.

Shared by ``operators/dedup.py`` (which also builds the Spark-side twins)
and ``operators/pipeline.py`` (whose oracle SQL embeds the same signature
CTEs). Living here — below the registry import graph — these fragments
are importable from ANY entry module without a cycle: importing
``operators.dedup`` first used to crash, because registry's module-load
chain reaches ``pipeline``, which needs these fragments while ``dedup``
is still partially initialized.

Parameters are sized so ``(a*h + b)`` never overflows signed 64-bit in
either engine: h is folded to 30 bits, a,b < 2^30, modulus 2^31 - 1.
"""

from __future__ import annotations

from vectordb_from_scratch_spark.functions import texthash

NUM_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = NUM_HASHES // N_BANDS
MOD = 2147483647  # 2^31 - 1
H_BITS = 1 << 30

SHINGLE_N = 3


def minhash_params(num_hashes: int = NUM_HASHES, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) with a ∈ [1, 2^30), b ∈ [0, 2^30) from the same
    LCG as texthash.affine_params — literals inlined into both engines."""
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % ((1 << 61) - 1)
        a = (state % (H_BITS - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % ((1 << 61) - 1)
        b = state % H_BITS
        params.append((a, b))
    return params


PARAMS = minhash_params()

#: DuckDB rendering of the distinct 3-shingle set of `text`
SH_SQL = f"list_distinct({texthash.word_shingles_sql('text', SHINGLE_N)})"
#: DuckDB rendering of the folded 30-bit shingle hash
H30_SQL = f"({texthash.hash60_sql('s')} % {H_BITS})"


def minhash_sig_sql() -> str:
    mh = ",\n       ".join(
        f"min(({a} * h + {b}) % {MOD}) AS mh{i}" for i, (a, b) in enumerate(PARAMS)
    )
    return f"""
sh  AS (SELECT doc_id, unnest({SH_SQL}) AS s FROM documents),
hh  AS (SELECT doc_id, {H30_SQL} AS h FROM sh),
sig AS (SELECT doc_id,
       {mh}
       FROM hh GROUP BY doc_id)"""


def bands_sql() -> str:
    parts = []
    for band in range(N_BANDS):
        cols = "||'|'||".join(
            f"CAST(mh{band * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        parts.append(f"SELECT doc_id, {band} AS band_id, {cols} AS band_key FROM sig")
    return " UNION ALL ".join(parts)
