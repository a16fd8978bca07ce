"""Library operators keep reference NULL semantics; sentinels live only in
registered query projections (the oracle edge). Guards the round-3 fix for
the round-2 contract divergence: active sessions must report NULL
logout_time (session_models.py null=True), document rows in fusion output
must report NULL rating/usage_count/contribution_id (absent dict keys in
enhanced_search.py) — so library consumers computing session age or
averaging ratings never see magic values."""

from __future__ import annotations

import pyspark.sql.functions as F

from koby_s_ai_vector_db_spark.operators.mutations import sessions_from_events
from koby_s_ai_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_DIRS

SF_DIR = SF_DIRS["t1"]


def test_active_sessions_have_null_logout(spark):
    sessions = sessions_from_events(load_table(spark, SF_DIR, "events"))
    bad = sessions.filter(
        (F.col("is_active") == "active") & F.col("logout_time").isNotNull()
    ).count()
    assert bad == 0
    # and inactive sessions DO have a logout time
    missing = sessions.filter(
        (F.col("is_active") == "inactive") & F.col("logout_time").isNull()
    ).count()
    assert missing == 0
    assert sessions.filter(F.col("is_active") == "active").count() > 0


def test_fusion_document_rows_have_null_contribution_fields(spark):
    from koby_s_ai_vector_db_spark.operators.fusion import (
        enhanced_sources,
        fusion_metadata,
        prioritize_results,
    )
    from koby_s_ai_vector_db_spark.queries.fusion_q import _inputs

    qtext, vec, vec_doc, lex = _inputs(spark, SF_DIR)
    meta = fusion_metadata(qtext, vec, lex)

    pri = prioritize_results(vec, lex, meta)
    docs_rows = pri.filter(F.col("source_type") == "original_document")
    assert docs_rows.filter(F.col("rating").isNotNull()).count() == 0
    assert docs_rows.filter(F.col("usage_count").isNotNull()).count() == 0
    # contribution rows keep their real values
    contribs = pri.filter(F.col("source_type") == "user_contribution")
    assert contribs.filter(F.col("rating").isNull()).count() == 0

    src = enhanced_sources(vec_doc, lex)
    faiss_rows = src.filter(F.col("source_type") == "original_document")
    assert faiss_rows.filter(F.col("contribution_id").isNotNull()).count() == 0
