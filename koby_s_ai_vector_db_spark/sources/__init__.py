from koby_s_ai_vector_db_spark.sources.tables import (
    FEEDBACK_SQL,
    NOW_TS,
    load_table,
    load_tables,
    feedback_view,
)

__all__ = ["load_table", "load_tables", "feedback_view", "FEEDBACK_SQL", "NOW_TS"]
