"""Side-effect imports: every submodule registers its queries on import.

Registration order is only the fallback ordering: the per-round driver
verification window (first 50 registry entries) is chosen explicitly by
`registry._PRIORITY`, which surfaces the named queries to the front of
`queries()` regardless of module import order — see the rationale there.
"""

from koby_s_ai_vector_db_spark.queries import (  # noqa: F401
    vector_q,
    sources_q,
    streaming_q,
    text_q,
    rollup_q,
    dedup_q,
    fusion_q,
    mutations_q,
    chunker_q,
    ingest_q,
    analytics_q,
    lexical_q,
    relational_q,
    corpus_q,
    asof_q,
    range_q,
    hybrid_q,
    sketch_q,
    training_q,
    selection_q,
    graph_q,
)
