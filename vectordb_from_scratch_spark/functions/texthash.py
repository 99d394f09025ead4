"""Cross-engine deterministic text hashing.

MinHash / SimHash / fingerprinting need a hash function that produces the
SAME values in Spark and in the DuckDB oracle, so the driver's value-hash
comparison can confirm them. ``xxhash64``/``hash`` differ across engines;
``md5`` does not. We take the first 15 hex chars of md5 (60 bits — fits a
signed BIGINT in both engines) as the base hash, then derive the k MinHash
permutations with a seeded affine map modulo a Mersenne prime.

Spark:  conv(substr(md5(s), 1, 15), 16, 10)::bigint
DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^61 - 1: affine MinHash permutations mod this stay in
#: signed-64 range even after (a*h + b).
MERSENNE61 = (1 << 61) - 1


def hash60(c: Column | str) -> Column:
    """60-bit deterministic hash of a string column (md5-based)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash60_sql(expr: str) -> str:
    """DuckDB-side rendering of :func:`hash60` for oracle SQL."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def affine_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for MinHash permutations
    h_i(x) = (a_i * x + b_i) mod MERSENNE61. Derived from a simple seeded
    LCG so both Spark and the SQL oracle can inline the same literals."""
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % MERSENNE61
        a = (state % (MERSENNE61 - 1)) + 1  # a != 0
        state = (state * 6364136223846793005 + 1442695040888963407) % MERSENNE61
        b = state % MERSENNE61
        params.append((a, b))
    return params


def words(c: Column | str) -> Column:
    """Whitespace tokenization, empty tokens dropped — identical to DuckDB
    ``list_filter(string_split(s, ' '), w -> w != '')``."""
    c = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(c, " "), lambda w: w != "")


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """n-word shingles (space-joined) as an array<string>. Documents shorter
    than n words produce a single shingle of the whole text, so every doc
    gets at least one shingle (keeps MinHash total)."""
    ws = words(c)
    k = F.size(ws)
    joined = F.array_join(ws, " ")
    shingled = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
    )
    return F.when(k >= n, shingled).otherwise(F.array(joined))


def word_shingles_sql(expr: str, n: int = 3) -> str:
    """DuckDB rendering of :func:`word_shingles`."""
    ws = f"list_filter(string_split({expr}, ' '), w -> w != '')"
    return (
        f"CASE WHEN len({ws}) >= {n} "
        f"THEN list_transform(range(1, len({ws}) - {n} + 2), "
        f"i -> array_to_string({ws}[i:i+{n - 1}], ' ')) "
        f"ELSE [array_to_string({ws}, ' ')] END"
    )
