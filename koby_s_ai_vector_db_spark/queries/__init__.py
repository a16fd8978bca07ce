"""Side-effect imports: every submodule registers its queries on import.

Import order IS registration order, and downstream correctness tooling
checks the first 50 registry entries per round — so modules whose queries
most need fresh verification this round register first:

  1. vector_q / sources_q / streaming_q / text_q (21 entries): had no
     driver correctness row in round 2 (fell past entry #50).
  2. rollup_q: new in round 3 (no prior driver row).
  3. dedup_q / fusion_q / mutations_q: operators changed in round 3
     (map-side LSH sketch, star-contraction CC, bucket cap, NULL-sentinel
     confinement) — keep them inside the window. The window cuts inside
     mutations_q: m6_flip_catalog_status / s9_upsert_users land at #51-52,
     acceptable because their r2 driver rows are green and their
     registered projections are unchanged since (the sentinel confinement
     moved library internals only).
  4. chunker_q / ingest_q / analytics_q / lexical_q / relational_q: all
     green in round 2 and unchanged — they cycle outside the window.
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
)
