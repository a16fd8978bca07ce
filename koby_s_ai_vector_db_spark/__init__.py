"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference RAG application (itsparsh10/Koby-s-Ai-Vector-DB).

The reference is a single-node Python app (FAISS + Supabase + Django); this
package re-expresses every computation it performs — chunking, embedding
normalization, exact/approximate top-k vector search, lexical overlap scoring,
score fusion, and the full analytics/mutation query set — as idiomatic
PySpark DataFrame / SQL / Structured Streaming programs designed for
1000-executor, 100 TB scale.

Layout:
    sources/    table loaders, explicit schemas, derived views (feedback)
    functions/  column-level expression helpers (vectors, text, hashing)
    operators/  the SURVEY.md §2 operator inventory as (spark, sf_dir) fns
    pipelines/  batch ingestion (chunk → embed → normalize → parquet index)
    streaming/  Structured Streaming analogues of the activity analytics
    plans/      plan-inspection helpers (explain, shuffle audit)
"""

from koby_s_ai_vector_db_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
