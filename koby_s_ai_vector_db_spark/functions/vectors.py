"""Vector expressions over array<float|double> columns.

All of these are Catalyst higher-order functions — they evaluate JVM-side
(no Python round-trip), so a dot product over a billion rows is a map-only
stage. This replaces the reference's numpy/FAISS math:

  - L2 normalize: core/utils.py:126-135  (norms[norms == 0] = 1e-10 guard)
  - inner product == cosine on normalized vectors: embed_pdfs.py:227-228

Everything computes in DOUBLE regardless of input float width so results are
reproducible across engines (the DuckDB oracle casts to DOUBLE[] the same way).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return F.transform(c, lambda x: x.cast("double"))


def l2_norm(v: Column | str) -> Column:
    """sqrt(sum(x^2)) — sequential left-fold, same order as numpy/DuckDB."""
    return F.sqrt(F.aggregate(_as_double(v), F.lit(0.0), lambda acc, x: acc + x * x))


def l2_normalize(v: Column | str) -> Column:
    """v / ||v||, substituting 1e-10 ONLY when the norm is exactly 0 —
    the reference's guard (core/utils.py:132: norms[norms == 0] = 1e-10).
    A greatest(norm, 1e-10) clamp would mis-normalize vectors with
    0 < ||v|| < 1e-10, which the reference normalizes correctly."""
    vd = _as_double(v)
    norm = F.sqrt(F.aggregate(vd, F.lit(0.0), lambda acc, x: acc + x * x))
    safe = F.when(norm == 0.0, F.lit(1e-10)).otherwise(norm)
    return F.transform(vd, lambda x: x / safe)


def dot(a: Column | str, b: Column | str) -> Column:
    """Inner product via zip_with + fold — JVM-side, codegen-friendly."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine for *unnormalized* inputs (pgvector path,
    supabase_schema.sql:167). Prefer normalize-at-write + dot()."""
    return dot(a, b) / (
        F.greatest(l2_norm(a), F.lit(1e-10)) * F.greatest(l2_norm(b), F.lit(1e-10))
    )


# DuckDB-dialect renderings of the same math (sequential left-fold, DOUBLE
# accumulation) used to build oracle_sql() strings.
def sql_norm(expr: str) -> str:
    return f"sqrt(list_sum(list_transform({expr}, x -> (x::DOUBLE)*(x::DOUBLE))))"


def sql_normalize(expr: str) -> str:
    norm = sql_norm(expr)
    return (
        f"list_transform({expr}, x -> (x::DOUBLE) / "
        f"(CASE WHEN {norm} = 0 THEN 1e-10 ELSE {norm} END))"
    )
