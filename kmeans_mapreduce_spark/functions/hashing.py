"""Portable deterministic hashing — identical in Spark and DuckDB.

The LLM-pipeline operators (minhash, simhash, LSH, fingerprints) need a
hash both engines compute bit-identically so the DuckDB oracle can
replay them. Engine-native hashes differ (Spark murmur3/xxhash64 vs
DuckDB's internal), so we standardize on **md5 hex → first 15 nibbles →
int64** (60 bits, always non-negative, fits BIGINT):

- Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)::long``
- DuckDB: ``('0x' || substr(md5(s), 1, 15))::BIGINT``

Seeded variants prefix the payload with ``{seed}:``. md5 here is a
*fingerprint*, not security. At cluster scale this stays JVM-side
(Catalyst ``Md5``/``Conv`` expressions inside codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_NIBBLES = 15
HASH_SPACE = 16 ** HASH_NIBBLES  # 2^60

# Universal-hash family for minhash: member j is (a_j*h + b_j) mod P
# over the md5-derived base hash h — ONE md5 per input, the family
# members are integer multiply-add (Carter–Wegman). P = 2^31−1 (prime)
# keeps a*h + b < 2^62: no int64 overflow in Spark or DuckDB.
MINHASH_P = 2_147_483_647


def hash_family(n: int, p: int = MINHASH_P) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) parameter lists — a fixed LCG walk, so both
    engines (and every test run) see identical constants."""
    x = 0x9E3779B97F4A7C15
    a, b = [], []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a.append(x % (p - 1) + 1)
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b.append(x % p)
    return a, b


def h64(col: Column) -> Column:
    """60-bit non-negative hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, HASH_NIBBLES), 16, 10).cast("long")


def h64_seeded(col: Column, seed: int) -> Column:
    """Seeded variant: independent hash family member per seed.

    Uses NULL-propagating ``concat`` (not ``concat_ws``, which SKIPS
    null operands and would hash the bare seed string into a real
    value) so a NULL input hashes to NULL on both engines — matching
    :func:`h64_seeded_sql`, whose ``||`` propagates NULL."""
    return h64(F.concat(F.lit(str(seed)), F.lit(":"), col))


def h64_sql(expr: str) -> str:
    """DuckDB twin of :func:`h64`."""
    return f"('0x' || substr(md5({expr}), 1, {HASH_NIBBLES}))::BIGINT"


def h64_seeded_sql(expr: str, seed: int) -> str:
    return h64_sql(f"'{seed}' || ':' || {expr}")
