"""Side-effect imports: every submodule registers its queries on import.

Import order IS registration order, and downstream correctness tooling
checks the first 50 registry entries per round — so modules whose queries
most need fresh verification this round register first:

  1. vector_q / sources_q / streaming_q / text_q (21 entries): had no
     driver correctness row in round 2 (fell past entry #50).
  2. dedup_q / fusion_q / mutations_q (23 entries): operators changed in
     round 3 (map-side LSH sketch, star-contraction CC, bucket cap,
     NULL-sentinel confinement) — keep them inside the window.
  3. chunker_q / ingest_q fill the window to #52 (t6/t7 cycle out).
  4. analytics_q / lexical_q / relational_q: all green in round 2 and
     untouched this round — they cycle outside the window.
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
