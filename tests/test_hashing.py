"""Cross-engine hashing contract: the Spark portable hashes and their
DuckDB SQL renderings must agree bit-for-bit — every oracle-checked
MinHash/SimHash/sampling operator rests on this pair."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.functions.hashing import (
    portable_hash32,
    portable_hash64,
    sql_hash32,
    sql_hash64,
)

SAMPLES = ["", "a", "the quick brown fox", "héllo wörld", "0", "12345", "x" * 500]


def _spark_vals(spark, fn, seed):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    return [r.h for r in df.select(fn(F.col("s"), seed=seed).alias("h")).collect()]


def _duck_vals(duck, render, seed):
    out = []
    for s in SAMPLES:
        lit = "'" + s.replace("'", "''") + "'"
        out.append(duck.execute(f"SELECT {render(lit, seed)} AS h").fetchone()[0])
    return out


def test_hash32_matches_duckdb(spark, duck):
    for seed in (0, 7, 123):
        assert _spark_vals(spark, portable_hash32, seed) == _duck_vals(duck, sql_hash32, seed)


def test_hash64_matches_duckdb(spark, duck):
    for seed in (0, 7, 123):
        assert _spark_vals(spark, portable_hash64, seed) == _duck_vals(duck, sql_hash64, seed)


def test_ranges(spark):
    v32 = _spark_vals(spark, portable_hash32, 0)
    v64 = _spark_vals(spark, portable_hash64, 0)
    assert all(0 <= v < 2**32 for v in v32)
    assert all(0 <= v < 2**60 for v in v64)  # 15 hex digits
    assert len(set(v32)) == len(SAMPLES) and len(set(v64)) == len(SAMPLES)
