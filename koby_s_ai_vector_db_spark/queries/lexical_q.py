"""Lexical search queries (Q3–Q6) over the derived feedback view.

The fixture set has no feedback table; both engines derive it from
`documents` with identical deterministic SQL (sources/tables.py). Fixture
text is drawn from a small vocabulary, so token-overlap scores are dense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.operators.lexical import (
    contribution_search,
    keyword_search,
    list_contributions,
)
from koby_s_ai_vector_db_spark.registry import register
from koby_s_ai_vector_db_spark.sources.tables import feedback_cte, feedback_view, load_table

QUERY = "spark join merge window"
KEYWORD = "vector"

# Query tokens inlined as a literal (the Spark side does the same via
# F.lit); document text tokenized with the same \s+ regex split as Spark's
# _tokens — not string_split(' '), which diverges on runs of whitespace.
_QTOK = ", ".join(f"'{t}'" for t in sorted(set(QUERY.lower().split())))

_Q3_ORACLE = feedback_cte(
    f"""
, cand AS (
    SELECT *, row_number() OVER (ORDER BY rating DESC, id ASC) AS _rn
    FROM feedback WHERE status = 'approved' AND rating >= 0.0
),
scored AS (
    SELECT id, question, answer, rating, usage_count,
        CASE WHEN instr(lower(question), '{QUERY}') > 0
                  OR instr(lower(answer), '{QUERY}') > 0 THEN 1.0
             ELSE len(list_intersect(
                      [{_QTOK}],
                      list_filter(string_split_regex(lower(question) || ' ' || lower(answer),
                                                     '\\s+'), t -> t <> '')
                  ))::DOUBLE / {len(set(QUERY.split()))}
        END AS similarity_score
    FROM cand WHERE _rn <= 100
)
SELECT id, question, answer, rating, usage_count, similarity_score
FROM scored WHERE similarity_score > 0
ORDER BY similarity_score DESC, rating DESC, id ASC
LIMIT 5
"""
)


@register("q3_contribution_search", _Q3_ORACLE)
def q3_contribution_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 (supabase_utils.py:280-312): substring short-circuit + token
    overlap over a rating-top-100 candidate cap, ties pinned by id."""
    return contribution_search(feedback_view(spark, sf_dir), QUERY, limit=5)


_Q4_ORACLE = feedback_cte(
    f"""
, recent AS (
    SELECT *, row_number() OVER (ORDER BY created_at DESC, id ASC) AS _rn
    FROM feedback WHERE status = 'approved'
)
SELECT id, question, answer, question_type, rating, created_at
FROM recent
WHERE _rn <= 200
  AND instr(lower(question) || ' ' || lower(answer), '{KEYWORD}') > 0
"""
)


@register("q4_keyword_search", _Q4_ORACLE)
def q4_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (supabase_utils.py:362-365): containment over recent-200 approved."""
    return keyword_search(feedback_view(spark, sf_dir), KEYWORD)


_Q5_ORACLE = feedback_cte(
    """
, filtered AS (
    SELECT id, question, answer, status, rating, created_at,
           row_number() OVER (ORDER BY created_at DESC, id ASC) AS _rn,
           count(*) OVER () AS total_count
    FROM feedback
    WHERE status = 'pending'
      AND (lower(question) LIKE '%data%' OR lower(answer) LIKE '%data%')
)
SELECT id, question, answer, status, rating, created_at, total_count
FROM filtered WHERE _rn BETWEEN 21 AND 40
"""
)


@register("q5_ilike_pagination", _Q5_ORACLE)
def q5_ilike_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 (supabase_utils.py:383-397): ILIKE + page-2 offset window + count."""
    return list_contributions(
        feedback_view(spark, sf_dir),
        status_filter="pending",
        page=2,
        per_page=20,
        search_query="data",
    )


_Q6_ORACLE = """
WITH sessions AS (
    SELECT user_id,
           concat('user_', user_id) AS user_name,
           concat('user_', user_id, '@example.com') AS user_email,
           min(ts) AS login_time,
           max(ts) AS last_activity,
           count(*) AS n_events
    FROM events GROUP BY user_id
),
hits AS (
    SELECT *, row_number() OVER (ORDER BY login_time DESC, user_id ASC) AS _rn
    FROM sessions
    WHERE lower(user_name) LIKE '%7%' OR lower(user_email) LIKE '%7%'
)
SELECT user_id, user_name, user_email, login_time, last_activity, n_events
FROM hits WHERE _rn BETWEEN 1 AND 20
"""


@register("q6_session_search", _Q6_ORACLE)
def q6_session_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 (views.py:1710-1767): OR-icontains user search + recency
    pagination, over per-user session rollups of the events log."""
    events = load_table(spark, sf_dir, "events")
    sessions = events.groupBy("user_id").agg(
        F.min("ts").alias("login_time"),
        F.max("ts").alias("last_activity"),
        F.count("*").alias("n_events"),
    ).select(
        "user_id",
        F.concat(F.lit("user_"), F.col("user_id")).alias("user_name"),
        F.concat(F.lit("user_"), F.col("user_id"), F.lit("@example.com")).alias("user_email"),
        "login_time",
        "last_activity",
        "n_events",
    )
    from koby_s_ai_vector_db_spark.functions.ranking import global_top_n

    hits = sessions.filter(
        F.lower("user_name").like("%7%") | F.lower("user_email").like("%7%")
    )
    return global_top_n(hits, [F.desc("login_time"), F.asc("user_id")], 20)
