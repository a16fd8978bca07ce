"""Side-effect imports: every submodule registers its queries on import."""

from koby_s_ai_vector_db_spark.queries import (  # noqa: F401
    chunker_q,
    lexical_q,
    vector_q,
)
