"""Text-analysis + multimodal queries (north-star pillars), oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.operators.text_analysis import (
    BPE_RE,
    LANG_ORDER,
    PROFILES,
    PUNCT_RE,
    STOPWORDS_EN,
    detect_lang,
    fingerprints,
    quality_score,
    token_counts,
)
from koby_s_ai_vector_db_spark.registry import register
from koby_s_ai_vector_db_spark.sources.multimodal import (
    binary_features,
    decode_media,
    media_table,
)
from koby_s_ai_vector_db_spark.sources.tables import load_table

_W_DUCK = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"


def _hits(words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_W_DUCK}, t -> list_contains([{arr}], t)))"


_LANG_CASE = " ".join(
    "WHEN "
    + " AND ".join(
        f"s_{lang} >= s_{other}" for other in LANG_ORDER if other != lang
    )
    + f" THEN '{lang}'"
    for lang in LANG_ORDER
)
_SCORES = ", ".join(f"{_hits(words)} AS s_{lang}" for lang, words in PROFILES.items())
_TOTAL = " + ".join(f"s_{lang}" for lang in LANG_ORDER)

_LANG_ORACLE = f"""
WITH s AS (SELECT doc_id, lang, {_SCORES} FROM documents)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN {_TOTAL} = 0 THEN 'und' {_LANG_CASE} END AS detected_lang,
       s_en
FROM s
"""


@register("ta_lang_id", _LANG_ORACLE)
def ta_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-profile argmax with CASE-order
    tie-break (fixture text is one shared vocabulary, so the heuristic and
    the fixture's `lang` label are independent — both are emitted)."""
    docs = load_table(spark, sf_dir, "documents")
    from koby_s_ai_vector_db_spark.operators.text_analysis import lang_scores

    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        detect_lang("text").alias("detected_lang"),
        lang_scores("text")["en"].alias("s_en"),
    )


_STOP_ARR = ", ".join(f"'{w}'" for w in STOPWORDS_EN)

# Shared pieces: the per-doc feature CTE (carries lang for the percentile
# gate below) and the composite formula, identical term order to the
# Spark expression in operators/text_analysis.py::quality_score.
_QUALITY_T_CTE = f"""t AS (
    SELECT doc_id, lang,
           len({_W_DUCK})::DOUBLE AS n_tok,
           length(text)::DOUBLE AS n_chars,
           (length(text)::DOUBLE
            - length(regexp_replace(text, '{PUNCT_RE}', '', 'g'))::DOUBLE)
               / greatest(length(text)::DOUBLE, 1.0) AS punct,
           len(list_filter({_W_DUCK}, t -> list_contains([{_STOP_ARR}], t)))::DOUBLE AS stop_hits,
           list_sum(list_transform({_W_DUCK}, t -> length(t)))::DOUBLE AS tok_len_sum
    FROM documents
)"""

_QUALITY_EXPR = """0.25 * least(n_tok / 50.0, 1.0)
           + 0.25 * (1.0 - punct)
           + 0.25 * least(stop_hits / greatest(n_tok, 1.0) * 5.0, 1.0)
           + 0.25 * least(tok_len_sum / greatest(n_tok, 1.0) / 8.0, 1.0)"""

_QUALITY_ORACLE = f"""
WITH {_QUALITY_T_CTE}
SELECT doc_id,
       round({_QUALITY_EXPR}, 6) AS quality
FROM t
"""


@register("ta_quality_score", _QUALITY_ORACLE)
def ta_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality: token volume, punctuation, stopword ratio, mean
    token length — map-only expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.round(quality_score("text"), 6).alias("quality"))


_TOKENS_ORACLE = f"""
SELECT doc_id,
       len({_W_DUCK}) AS ws_tokens,
       len(regexp_extract_all(lower(text), '{BPE_RE}')) AS bpe_tokens
FROM documents
"""


@register("ta_token_count", _TOKENS_ORACLE)
def ta_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    ws, bpe = token_counts("text")
    return docs.select("doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


_FP_ORACLE = """
WITH fp AS (
    SELECT doc_id,
           list_filter([('0x' || substr(md5(substr(text, i, 8)), 1, 8))::BIGINT
                        for i in range(1, greatest(length(text) - 7, 0) + 1)],
                       h -> h % 8 = 0) AS f
    FROM documents
)
SELECT doc_id, len(f) AS n_fp, list_min(f) AS min_fp, list_max(f) AS max_fp
FROM fp
"""


@register("ta_fingerprint", _FP_ORACLE)
def ta_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mod-sampled rolling fingerprints (char 8-grams, keep h%8==0):
    position-independent document signatures for plagiarism/near-dup
    pre-screening."""
    from koby_s_ai_vector_db_spark.functions.partitioning import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    fp = fingerprints("text")
    return docs.select(
        "doc_id",
        F.size(fp).alias("n_fp"),
        F.array_min(fp).alias("min_fp"),
        F.array_max(fp).alias("max_fp"),
    )


_MM_KIND = "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"

_MM_FEATURES_ORACLE = f"""
SELECT doc_id AS media_id,
       {_MM_KIND} AS kind,
       octet_length(encode(text)) AS byte_len,
       md5(text) AS content_md5,
       upper(substr(hex(encode(text)), 1, 8)) AS header_hex
FROM documents
"""


@register("mm_binary_features", _MM_FEATURES_ORACLE)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: JVM-side features over an opaque binary column (byte
    length, md5, header hex) — binary payloads flow through Catalyst
    without a Python hop."""
    docs = load_table(spark, sf_dir, "documents")
    return binary_features(media_table(docs))


_MM_DECODE_ORACLE = f"""
SELECT doc_id AS media_id,
       {_MM_KIND} AS kind,
       octet_length(encode(text)) AS byte_len,
       CAST(octet_length(encode(text)) % 640 AS INT) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height,
       CAST(CASE WHEN {_MM_KIND} = 'video'
                 THEN octet_length(encode(text)) % 100 ELSE 1 END AS INT) AS n_frames,
       true AS ok
FROM documents
"""


@register("mm_decode", _MM_DECODE_ORACLE)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode via mapInPandas: Arrow-batched binary payloads
    through Python, partition-parallel. Pixel decode is import-gated
    (sources/multimodal.py — no imaging libs in this container); the
    deterministic byte-level fake keeps schema, batching and the oracle
    check real."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(media_table(docs))


# ---------------------------------------------------------------------------
# Corpus curation: the end-to-end training-data pipeline — exact dedup +
# quality gate composed over the planted-duplicate corpus (dedup_q.DOCS_DD).
# Reasons are prioritized deterministically: duplicate > low_quality > kept.
# ---------------------------------------------------------------------------
_QUALITY_EXPR_DUCK = f"""
round(0.25 * least(len({_W_DUCK})::DOUBLE / 50.0, 1.0)
    + 0.25 * (1.0 - (length(text)::DOUBLE
                     - length(regexp_replace(text, '{PUNCT_RE}', '', 'g'))::DOUBLE)
                    / greatest(length(text)::DOUBLE, 1.0))
    + 0.25 * least(len(list_filter({_W_DUCK}, t -> list_contains([{_STOP_ARR}], t)))::DOUBLE
                   / greatest(len({_W_DUCK})::DOUBLE, 1.0) * 5.0, 1.0)
    + 0.25 * least(list_sum(list_transform({_W_DUCK}, t -> length(t)))::DOUBLE
                   / greatest(len({_W_DUCK})::DOUBLE, 1.0) / 8.0, 1.0), 6)
"""


def _curate_oracle() -> str:
    from koby_s_ai_vector_db_spark.queries.dedup_q import DOCS_DD_SQL

    return f"""
WITH docs_dd AS ({DOCS_DD_SQL}),
scored AS (
    SELECT doc_id, text, {_QUALITY_EXPR_DUCK} AS quality,
           min(doc_id) OVER (PARTITION BY md5(text)) AS canonical
    FROM docs_dd
),
tagged AS (
    SELECT doc_id, quality,
           CASE WHEN doc_id <> canonical THEN 'duplicate'
                WHEN quality < 0.5 THEN 'low_quality'
                ELSE 'kept' END AS reason
    FROM scored
)
SELECT reason, count(*) AS n, round(avg(quality), 6) AS avg_quality
FROM tagged GROUP BY reason
"""


@register("curate_corpus", _curate_oracle())
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data curation pipeline end-to-end: exact dedup (keep
    the canonical min-id copy per text hash) + quality gate, with
    per-reason counts. At 100 TB: the dedup window is partitioned by the
    16-byte text hash (bounded groups), quality is map-only, the final
    rollup is a 3-row aggregate — one shuffle total."""
    from pyspark.sql import Window

    from koby_s_ai_vector_db_spark.functions.partitioning import spread
    from koby_s_ai_vector_db_spark.queries.dedup_q import _docs_dd

    # spread(): quality_score's regex/token map is CPU-bound and runs
    # BEFORE the md5 window's exchange can parallelize it (§9 convention;
    # round-11 A/B on the neardup sibling measured 5.4 -> 3.0 s at sf1).
    docs = spread(_docs_dd(spark, sf_dir))
    w = Window.partitionBy(F.md5("text"))
    tagged = (
        docs.withColumn("quality", F.round(quality_score("text"), 6))
        .withColumn("canonical", F.min("doc_id").over(w))
        .withColumn(
            "reason",
            F.when(F.col("doc_id") != F.col("canonical"), F.lit("duplicate"))
            .when(F.col("quality") < 0.5, F.lit("low_quality"))
            .otherwise(F.lit("kept")),
        )
    )
    return tagged.groupBy("reason").agg(
        F.count("*").alias("n"), F.round(F.avg("quality"), 6).alias("avg_quality")
    )


def _curate_neardup_oracle() -> str:
    # The dedup_groups recursive-CTE transitive closure, composed with the
    # quality gate: canonical = min id reachable through MinHash near-dup
    # pairs (exact copies included — Jaccard 1), else self.
    from koby_s_ai_vector_db_spark.queries.dedup_q import (
        DOCS_DD_SQL,
        _MINHASH_ORACLE,
    )

    return f"""
WITH RECURSIVE pairs AS ({_MINHASH_ORACLE.strip()}),
edges AS (
    SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
    UNION
    SELECT doc_id_b AS src, doc_id_a AS dst FROM pairs
),
reach(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
groups AS (
    SELECT src AS doc_id, least(src, min(dst)) AS group_id
    FROM reach GROUP BY src
),
dd AS ({DOCS_DD_SQL}),
scored AS (
    SELECT d.doc_id, {_QUALITY_EXPR_DUCK} AS quality,
           coalesce(g.group_id, d.doc_id) AS canonical
    FROM dd d LEFT JOIN groups g ON d.doc_id = g.doc_id
),
tagged AS (
    SELECT doc_id, quality,
           CASE WHEN doc_id <> canonical THEN 'near_duplicate'
                WHEN quality < 0.5 THEN 'low_quality'
                ELSE 'kept' END AS reason
    FROM scored
)
SELECT reason, count(*) AS n, round(avg(quality), 6) AS avg_quality
FROM tagged GROUP BY reason
"""


@register("curate_corpus_neardup", _curate_neardup_oracle())
def curate_corpus_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation with NEAR-dup awareness: MinHash-LSH pairs → star-contraction
    groups → keep only each group's min-id canonical, then the quality
    gate — the full `signature → block → verify → group → curate` chain
    a 100 TB pipeline runs, as one query. The groups side is bounded by
    documents having at least one near-dup (join strategy left to
    Catalyst: broadcast at fixture scale, sort-merge at corpus scale);
    quality is map-only; final rollup is a 3-row aggregate."""
    from koby_s_ai_vector_db_spark.functions.partitioning import spread
    from koby_s_ai_vector_db_spark.queries.dedup_q import (
        _docs_dd,
        _neardup_groups_memo,
    )

    # spread() for the quality map (round-11 A/B: sf1 5.4 -> 3.0 s).
    docs = spread(_docs_dd(spark, sf_dir))
    groups = _neardup_groups_memo(spark, sf_dir)
    tagged = (
        docs.join(groups, "doc_id", "left")
        .withColumn("canonical", F.coalesce("group_id", F.col("doc_id")))
        .withColumn("quality", F.round(quality_score("text"), 6))
        .withColumn(
            "reason",
            F.when(F.col("doc_id") != F.col("canonical"), F.lit("near_duplicate"))
            .when(F.col("quality") < 0.5, F.lit("low_quality"))
            .otherwise(F.lit("kept")),
        )
    )
    return tagged.groupBy("reason").agg(
        F.count("*").alias("n"), F.round(F.avg("quality"), 6).alias("avg_quality")
    )


def _curate_bm25_oracle() -> str:
    # Near-dup groups (recursive-CTE transitive closure, as in
    # curate_corpus_neardup) + per-doc BM25 relevance over the SAME dd
    # corpus, argmax per multi-member group.
    from koby_s_ai_vector_db_spark.operators.corpus import BM25_B, BM25_K1
    from koby_s_ai_vector_db_spark.queries.corpus_q import BM25_QUERIES
    from koby_s_ai_vector_db_spark.queries.dedup_q import (
        DOCS_DD_SQL,
        _MINHASH_ORACLE,
    )

    values = ", ".join(f"({qid}, '{txt}')" for qid, txt in BM25_QUERIES)
    k1, b = BM25_K1, BM25_B
    return f"""
WITH RECURSIVE pairs AS ({_MINHASH_ORACLE.strip()}),
edges AS (
    SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
    UNION
    SELECT doc_id_b AS src, doc_id_a AS dst FROM pairs
),
reach(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
groups AS (
    SELECT src AS doc_id, least(src, min(dst)) AS group_id
    FROM reach GROUP BY src
),
dd AS ({DOCS_DD_SQL}),
q(query_id, query_text) AS (VALUES {values}),
words AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS w
    FROM dd
),
post AS (SELECT doc_id, unnest(w) AS term FROM words),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM post GROUP BY doc_id, term),
dl AS (SELECT doc_id, len(w)::DOUBLE AS dl FROM words),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
df_t AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
qt AS (
    SELECT query_id, unnest(list_distinct(list_filter(
        string_split_regex(lower(query_text), '\\s+'), t -> t <> ''))) AS term
    FROM q
),
scored AS (
    SELECT qt.query_id, tf.doc_id,
           round(sum(ln(1 + (stats.n_docs - df_t.df + 0.5) / (df_t.df + 0.5))
               * (tf.tf * ({k1} + 1))
               / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl))), 6) AS score
    FROM tf JOIN qt USING (term)
            JOIN dl ON dl.doc_id = tf.doc_id
            JOIN df_t ON df_t.term = tf.term
            CROSS JOIN stats
    GROUP BY qt.query_id, tf.doc_id
),
rel AS (SELECT doc_id, round(sum(score), 6) AS relevance FROM scored GROUP BY doc_id),
members AS (
    SELECT d.doc_id, coalesce(g.group_id, d.doc_id) AS group_id
    FROM dd d LEFT JOIN groups g ON d.doc_id = g.doc_id
),
multi AS (
    SELECT group_id, count(*) AS n_members FROM members
    GROUP BY group_id HAVING count(*) >= 2
),
cand AS (
    SELECT m.group_id, m.doc_id, coalesce(r.relevance, 0.0) AS relevance
    FROM members m JOIN multi USING (group_id) LEFT JOIN rel r USING (doc_id)
),
win AS (
    SELECT group_id, doc_id, relevance,
           row_number() OVER (PARTITION BY group_id
                              ORDER BY relevance DESC, doc_id ASC) AS rn
    FROM cand
)
SELECT w.group_id, w.doc_id AS kept_doc_id, w.relevance, mu.n_members
FROM win w JOIN multi mu USING (group_id) WHERE rn = 1
"""


@register("curate_corpus_bm25", _curate_bm25_oracle())
def curate_corpus_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation with a BM25 keep-decision: near-dup groups keep their most
    RELEVANT member (summed BM25 against the curation query set) instead
    of the arbitrary min-id canonical — the production form of "when
    collapsing near-duplicates, keep the best copy". Emits one row per
    multi-member group: (group_id, kept_doc_id, relevance, n_members).

    Plan shape: the group side reuses the memoized MinHash pair/groups
    subtree (one signature build per session); BM25 relevance is the
    postings-vs-broadcast-query-terms join aggregated per doc; the
    argmax is a WindowGroupLimit-able row_number over groups bounded by
    docs that HAVE a near-dup."""
    from pyspark.sql import Window

    from koby_s_ai_vector_db_spark.operators.corpus import bm25_scores
    from koby_s_ai_vector_db_spark.queries.dedup_q import (
        _docs_dd,
        _neardup_groups_memo,
    )

    docs = _docs_dd(spark, sf_dir)
    groups = _neardup_groups_memo(spark, sf_dir)
    from koby_s_ai_vector_db_spark.queries.corpus_q import bm25_queries_df

    queries = bm25_queries_df(spark)
    # The per-doc relevance table is memo-persisted (round 11): its
    # lineage is the whole tokenize→postings→BM25 pipeline over the dd
    # corpus, re-run per call for a (doc_id, relevance) table of bounded
    # width — the in-session analogue of the relevance column a curation
    # pipeline materializes before the keep-decision.
    from koby_s_ai_vector_db_spark.functions.caching import memo_persist

    rel = memo_persist(
        spark,
        ("curate_bm25_rel", sf_dir),
        lambda: bm25_scores(docs, queries)
        .groupBy("doc_id")
        .agg(F.round(F.sum("score"), 6).alias("relevance")),
    )
    members = docs.join(groups, "doc_id", "left").select(
        "doc_id", F.coalesce("group_id", F.col("doc_id")).alias("group_id")
    )
    multi = (
        members.groupBy("group_id")
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    cand = (
        members.join(multi, "group_id")
        .join(rel, "doc_id", "left")
        .withColumn("relevance", F.coalesce("relevance", F.lit(0.0)))
    )
    w = Window.partitionBy("group_id").orderBy(
        F.desc("relevance"), F.asc("doc_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "group_id",
            F.col("doc_id").alias("kept_doc_id"),
            "relevance",
            "n_members",
        )
    )


_MM_DEC_CTE = f"""
WITH dec AS (
    SELECT doc_id AS media_id,
           {_MM_KIND} AS kind,
           octet_length(encode(text)) AS byte_len,
           CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
           CAST(CASE WHEN {_MM_KIND} = 'video'
                     THEN octet_length(encode(text)) % 100 ELSE 1 END AS BIGINT) AS n_frames
    FROM documents
)"""

_MM_RESIZE_ORACLE = _MM_DEC_CTE + """
, pct AS (
    SELECT *, least(least((64 * 1000) // greatest(width, 1),
                          (64 * 1000) // greatest(height, 1)), 1000) AS p
    FROM dec
)
SELECT media_id, kind, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       CAST((width * p) // 1000 AS INT) AS out_w,
       CAST((height * p) // 1000 AS INT) AS out_h
FROM pct
"""


@register("mm_resize", _MM_RESIZE_ORACLE)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize: integer floor-scale-to-fit geometry through the
    Arrow-batched mapInPandas stage (pixel resample import-gated)."""
    from koby_s_ai_vector_db_spark.sources.multimodal import resize_media

    docs = load_table(spark, sf_dir, "documents")
    return resize_media(decode_media(media_table(docs)))


_MM_FRAMES_ORACLE = _MM_DEC_CTE + """
SELECT media_id,
       CAST(unnest(range(0, n_frames, 10)) AS INT) AS frame_idx,
       CAST(unnest(range(0, n_frames, 10)) * (byte_len // n_frames) AS BIGINT) AS frame_off,
       CAST((media_id * 31 + unnest(range(0, n_frames, 10))) % 997 AS INT) AS frame_sig
FROM dec WHERE kind = 'video' AND n_frames > 0
"""


@register("mm_frames", _MM_FRAMES_ORACLE)
def mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling: every 10th frame with byte offsets and
    a deterministic frame signature; non-video rows pruned JVM-side before
    the Python hop."""
    from koby_s_ai_vector_db_spark.sources.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(decode_media(media_table(docs)))


# --- Gopher-style repetition filter ---------------------------------------
_GOPHER_ORACLE = f"""
WITH words AS (SELECT doc_id, {_W_DUCK} AS w FROM documents),
wb AS (
    SELECT doc_id, w, [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS bg
    FROM words WHERE len(w) >= 1
),
stats AS (
    SELECT doc_id,
           len(w) AS n_tokens,
           round(list_max(list_transform(list_distinct(w),
                 t -> len(list_filter(w, x -> x = t)))) * 1.0 / len(w), 6) AS top_token_frac,
           CASE WHEN len(w) >= 2 THEN
               round(list_max(list_transform(list_distinct(bg),
                     t -> len(list_filter(bg, x -> x = t)))) * 1.0 / len(bg), 6)
           ELSE 0.0 END AS top_bigram_frac,
           round(list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w), 6) AS mean_word_len
    FROM wb
)
SELECT doc_id, n_tokens, top_token_frac, top_bigram_frac, mean_word_len,
       (top_token_frac <= 0.14 AND top_bigram_frac <= 0.08) AS keep
FROM stats
"""


@register("ta_gopher_repetition", _GOPHER_ORACLE)
def ta_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality rules (Rae et al. 2021 §A1.1):
    per-doc most-frequent-token / most-frequent-bigram mass fractions and
    the keep/drop gate. Map-only — one projection over the scan, zero
    shuffles (operators/text_analysis.py::gopher_repetition)."""
    from koby_s_ai_vector_db_spark.operators.text_analysis import (
        gopher_repetition,
    )

    docs = load_table(spark, sf_dir, "documents")
    cols = gopher_repetition("text")
    out = docs.filter(F.expr("size(array_remove(split(lower(text), '\\\\s+'), '')) >= 1"))
    for name, col in cols.items():
        out = out.withColumn(name, col)
    return out.select(
        "doc_id", "n_tokens", "top_token_frac", "top_bigram_frac",
        "mean_word_len", "keep",
    )


# --- PII scrub over planted identifiers -----------------------------------
# The fixture vocabulary has no PII, so the query PLANTS deterministic
# emails/phones (identically in both engines) and the operator scrubs
# them: docs get an email unless doc_id % 3 = 0, a phone when
# doc_id % 2 = 0, and a second email when doc_id % 15 = 0.
_PII_PLANT_DUCK = """
text
|| (CASE WHEN doc_id % 3 <> 0
         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@' || source || '.example.com'
         ELSE '' END)
|| (CASE WHEN doc_id % 2 = 0
         THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE '' END)
|| (CASE WHEN doc_id % 15 = 0 THEN ' alt admin@corp.example.org' ELSE '' END)
"""

_PII_ORACLE = f"""
WITH planted AS (SELECT doc_id, {_PII_PLANT_DUCK} AS txt FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(txt, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(txt, '\\b555-[0-9]{{4}}\\b')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(txt, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}', '<EMAIL>', 'g'),
                      '\\b555-[0-9]{{4}}\\b', '<PHONE>', 'g') AS clean_text
FROM planted
"""


@register("ta_pii_scrub", _PII_ORACLE)
def ta_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: plant deterministic emails/phones, then scrub with
    engine-portable regexes and count removals — map-only JVM
    expressions, no UDF (operators/text_analysis.py::pii_scrub)."""
    from koby_s_ai_vector_db_spark.operators.text_analysis import pii_scrub

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 != 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@"),
                    F.col("source"),
                    F.lit(".example.com"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 15 == 0, F.lit(" alt admin@corp.example.org")
            ).otherwise(""),
        ).alias("txt"),
    )
    cols = pii_scrub(F.col("txt"))
    return planted.select(
        "doc_id", cols["n_emails"].alias("n_emails"),
        cols["n_phones"].alias("n_phones"),
        cols["clean_text"].alias("clean_text"),
    )


# --- per-language quality percentile gate ------------------------------------
# Data-selection step: instead of one global quality cutoff (which mostly
# filters whole LANGUAGES because quality features are language-biased),
# pick each language's own P20 cutoff and keep its top 80%. Ranking and
# gating run on int64-quantized scores (qq = round(quality*1e6)) so the
# percentile choice and every comparison are bit-identical cross-engine.
GATE_PCT = 0.2

_QGATE_ORACLE = f"""
WITH {_QUALITY_T_CTE},
scored AS (
    SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(round(({_QUALITY_EXPR}) * 1000000) AS BIGINT) AS qq
    FROM t
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY lang ORDER BY qq, doc_id) AS rn,
           count(*) OVER (PARTITION BY lang) AS n
    FROM scored
),
cut AS (
    SELECT lang, qq AS cut_qq FROM ranked
    WHERE rn = CAST(ceil({GATE_PCT} * n) AS BIGINT)
)
SELECT s.lang, CAST(min(c.cut_qq) AS BIGINT) AS cutoff_q6,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN s.qq >= c.cut_qq THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN s.qq >= c.cut_qq THEN s.n_tok ELSE 0 END) AS BIGINT)
           AS kept_tokens
FROM scored s JOIN cut c USING (lang)
GROUP BY s.lang
"""


def quality_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized compact quality projection (doc_id, lang, n_tok, qq) —
    ~40 B/row vs multi-KB text. Shared by quality_percentile_gate and
    curriculum_order (training_q): every consumer re-reads the persisted
    projection instead of re-running the regex-heavy score over text.
    Catalyst prunes an unused Window rather than sharing its input, so
    without the persist each consumer pass would be a full text scan."""
    from koby_s_ai_vector_db_spark.functions.caching import memo_persist
    from koby_s_ai_vector_db_spark.operators.dedup import words_expr
    from koby_s_ai_vector_db_spark.operators.text_analysis import quality_score

    return memo_persist(
        spark,
        ("qgate_scored", sf_dir),
        lambda: load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "lang",
            F.size(words_expr("text")).cast("long").alias("n_tok"),
            F.round(quality_score("text") * 1000000).cast("long").alias("qq"),
        ),
    )


@register("quality_percentile_gate", _QGATE_ORACLE)
def quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language P20 quality cutoff (rank-based percentile_disc on the
    quantized score) and the keep statistics under it. Plan: one map-only
    score projection, one per-lang window rank (shuffle on lang), one
    broadcast-size cutoff table joined back, one groupBy(lang) — the
    corpus crosses the wire once; window partitions are per-language, so
    skew follows the language mix, which the rank window tolerates
    (row_number spills; no collect)."""
    from pyspark.sql import Window

    scored = quality_scored(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("qq", "doc_id")
    ranked = scored.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("lang"))
    )
    cut = ranked.filter(
        F.col("rn") == F.ceil(F.lit(GATE_PCT) * F.col("n"))
    ).select("lang", F.col("qq").alias("cut_qq"))
    kept = F.col("qq") >= F.col("cut_qq")
    return (
        scored.join(F.broadcast(cut), "lang")
        .groupBy("lang")
        .agg(
            F.min("cut_qq").cast("long").alias("cutoff_q6"),
            F.count("*").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


# --- unigram entropy quality filter -------------------------------------------
# The information-theoretic member of the quality-filter family: boilerplate
# and keyword-stuffed documents have low token entropy relative to their
# length, natural prose sits near the vocabulary ceiling ln(n_unique).
# Entropy is in NATS (ln, not log2) so both engines evaluate the same
# libm call; the normalized column divides by the per-doc ceiling.
# Scale shape: explode → two map-side-combined aggregations keyed by doc
# — the same plan as ta_token_count, no joins, no windows over text.
_ENTROPY_ORACLE = f"""
WITH words AS (
    SELECT doc_id, unnest({_W_DUCK}) AS w FROM documents
),
cnt AS (
    SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
),
terms AS (
    SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM cnt
),
agg AS (
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tok,
           CAST(count(*) AS BIGINT) AS n_unique,
           CAST(sum(CAST(round(CAST(c AS DOUBLE) / n
                               * ln(CAST(n AS DOUBLE) / c) * 1000000000000)
                         AS BIGINT)) AS BIGINT) AS ent_q
    FROM terms GROUP BY doc_id
)
SELECT doc_id, n_tok, n_unique,
       round(CAST(ent_q AS DOUBLE) / CAST(1000000000000 AS DOUBLE), 6)
         AS entropy,
       CASE WHEN n_unique > 1
            THEN round(CAST(ent_q AS DOUBLE) / CAST(1000000000000 AS DOUBLE)
                       / ln(CAST(n_unique AS DOUBLE)), 6)
            ELSE CAST(0.0 AS DOUBLE) END AS norm_entropy
FROM agg
"""


@register("ta_entropy", _ENTROPY_ORACLE)
def ta_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram token entropy (nats) and its normalization
    by the ln(n_unique) ceiling — low normalized entropy flags repeated
    boilerplate, near-1 is natural prose. Explode plus two
    map-side-combined per-doc aggregations; no text ever crosses a
    second time."""
    from pyspark.sql import Window

    from koby_s_ai_vector_db_spark.operators.dedup import words_expr

    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select("doc_id", F.explode(words_expr("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    # Terms are int64-quantized (1e-12 grain) BEFORE the sum: integer
    # addition is order-independent, so Spark's arbitrary partial-agg
    # order and DuckDB's scan order cannot diverge at the driver hash
    # (the repo's standing quantize-before-compare convention).
    n = F.sum("c").over(Window.partitionBy("doc_id")).cast("double")
    term_q = F.round(
        F.col("c").cast("double") / n * F.log(n / F.col("c"))
        * F.lit(1_000_000_000_000.0)
    ).cast("long")
    agg = cnt.select("doc_id", F.col("c"), term_q.alias("term_q")).groupBy(
        "doc_id"
    ).agg(
        F.sum("c").cast("long").alias("n_tok"),
        F.count("*").alias("n_unique"),
        F.sum("term_q").cast("long").alias("ent_q"),
    )
    ent = F.col("ent_q").cast("double") / F.lit(1_000_000_000_000.0)
    return agg.select(
        "doc_id",
        "n_tok",
        "n_unique",
        F.round(ent, 6).alias("entropy"),
        F.when(
            F.col("n_unique") > 1,
            F.round(ent / F.log(F.col("n_unique").cast("double")), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("norm_entropy"),
    )


# Tokenizer fertility report: bytes-per-token per (lang, source) — the
# standard pre-training audit for how expensively each corpus slice
# tokenizes (a high bytes/token slice under-trains per byte; the metric
# drives per-source budget and tokenizer-vocab decisions). Prebuilt in
# round 10, registered into a round-11 free slot; plan pin in
# tests/test_plans.py, sf1 probe in BASELINE.md (round-10 section).

_FERTILITY_ORACLE = f"""
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(sum(len({_W_DUCK})) AS BIGINT) AS ws_tokens,
       CAST(sum(len(regexp_extract_all(lower(text), '{BPE_RE}'))) AS BIGINT)
           AS bpe_tokens,
       CAST(round(1000000.0 * sum(octet_length(encode(text)))
                  / greatest(sum(len(regexp_extract_all(lower(text),
                                                        '{BPE_RE}'))), 1))
            AS BIGINT) AS bytes_per_bpe_q6,
       CAST(round(1000000.0 * sum(octet_length(encode(text)))
                  / greatest(sum(len({_W_DUCK})), 1))
            AS BIGINT) AS bytes_per_ws_q6
FROM documents
GROUP BY lang, source
"""


@register("tok_fertility_report", _FERTILITY_ORACLE)
def tok_fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) tokenizer fertility: document/byte/token
    totals and the q6-quantized bytes-per-token ratios for both the
    whitespace and the BPE-ish counters (the ta_token_count
    expressions, so the two views cannot drift). Map-only JVM regex
    counting (spread across cores pre-shuffle per the §9 convention),
    one partial+final groupBy on (lang, source) — the output is
    vocabulary-of-slices sized, never corpus sized. The ratio folds the
    same double expression on both engines then quantizes to int64."""
    from koby_s_ai_vector_db_spark.functions.partitioning import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    ws, bpe = token_counts("text")
    per = docs.select(
        "lang",
        "source",
        F.octet_length("text").cast("long").alias("b"),
        ws.cast("long").alias("wt"),
        bpe.cast("long").alias("bt"),
    )
    agg = per.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("b").cast("long").alias("total_bytes"),
        F.sum("wt").cast("long").alias("ws_tokens"),
        F.sum("bt").cast("long").alias("bpe_tokens"),
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "total_bytes",
        "ws_tokens",
        "bpe_tokens",
        F.round(
            1000000.0
            * F.col("total_bytes")
            / F.greatest(F.col("bpe_tokens"), F.lit(1))
        )
        .cast("long")
        .alias("bytes_per_bpe_q6"),
        F.round(
            1000000.0
            * F.col("total_bytes")
            / F.greatest(F.col("ws_tokens"), F.lit(1))
        )
        .cast("long")
        .alias("bytes_per_ws_q6"),
    )
