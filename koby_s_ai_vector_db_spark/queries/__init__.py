"""Side-effect imports: every submodule registers its queries on import."""

from koby_s_ai_vector_db_spark.queries import (  # noqa: F401
    analytics_q,
    chunker_q,
    dedup_q,
    fusion_q,
    ingest_q,
    lexical_q,
    mutations_q,
    relational_q,
    sources_q,
    streaming_q,
    text_q,
    vector_q,
)
