"""Data-selection queries: DSIR importance scores + Gumbel resampling,
CCNet-style perplexity buckets, token-budget corpus mixing, and the
end-to-end pretraining-corpus pipeline.

The model-targeted selection tier of the training-data pipeline
(operators/selection.py). The reference's only quality signal is the
token-overlap answer scorer (core/supabase_utils.py:250-367); these are
the published-pipeline "keep what looks like the target" forms. The
fixture's `source = 'src0'` documents stand in for the curated target /
LM-training domain (a Wikipedia-like reference corpus).

Every oracle here is ASSEMBLED from shared renderers
(`lm_oracle_ctes`/`ppl_scored_ctes`/`mix_oracle_sql`/`dsir_oracle_sql`,
plus corpus_q's `stratified_sample_oracle_case` and CONTAM constants) —
the standalone queries and the composed pipeline provably run the same
SQL fragments, so a smoothing/rounding tweak cannot desync them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.functions.hashing import sql_hash32
from koby_s_ai_vector_db_spark.operators.corpus import (
    stratified_sample_oracle_case,
)
from koby_s_ai_vector_db_spark.operators.selection import (
    DSIR_BUCKETS,
    DSIR_SEED,
    GUMBEL_SEED,
    dsir_oracle_sql,
    dsir_scores,
    gumbel_topk_sample,
    lm_oracle_ctes,
    lm_perplexity,
    mix_oracle_sql,
    perplexity_buckets,
    ppl_scored_ctes,
    token_budget_mix_summary,
)
from koby_s_ai_vector_db_spark.registry import register
from koby_s_ai_vector_db_spark.sources.tables import load_table

TARGET_SOURCE = "src0"
_LM_PRED = f"source = '{TARGET_SOURCE}'"

# The tokenized-documents CTE every oracle starts from.
_WORDS_CTE = """words AS (
    SELECT doc_id, lang, source,
           list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS w
    FROM documents
)"""

_DSIR_ORACLE = dsir_oracle_sql(
    _LM_PRED, carry_cols=("lang", "source")
)


def _dsir_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The memo-persisted per-doc DSIR score table shared by dsir_score
    and dsir_sample — built once per (application, sf_dir)."""
    from koby_s_ai_vector_db_spark.functions.caching import memo_persist

    docs = load_table(spark, sf_dir, "documents")
    return memo_persist(
        spark,
        ("dsir_scored", sf_dir),
        lambda: dsir_scores(
            docs,
            target=F.col("source") == TARGET_SOURCE,
            carry_cols=("lang", "source"),
            n_buckets=DSIR_BUCKETS,
            seed=DSIR_SEED,
        ),
    )


@register("dsir_score", _DSIR_ORACLE)
def dsir_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance score of every document against the src0 target
    domain: hashed unigram+bigram log-likelihood ratio. The model is a
    1024-bucket table built by two map-side-combined aggregates and
    broadcast back; the only corpus-sized shuffle is the per-doc score
    sum (operators/selection.py::dsir_scores). The score table is
    memo-persisted and shared with dsir_sample."""
    return _dsir_scored(spark, sf_dir)


_PPL_ORACLE = f"""
WITH {_WORDS_CTE},
{lm_oracle_ctes("words", _LM_PRED)},
{ppl_scored_ctes("words", carry_cols=("lang",), emit_nll=True)},
cuts AS (
    SELECT round(quantile_cont(ppl, {1.0 / 3.0!r}), 6) AS t_head,
           round(quantile_cont(ppl, {2.0 / 3.0!r}), 6) AS t_mid
    FROM scored
)
SELECT doc_id, lang, n_events, nll, ppl,
       CASE WHEN ppl <= t_head THEN 'head'
            WHEN ppl <= t_mid THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored CROSS JOIN cuts
"""


@register("ccnet_ppl_buckets", _PPL_ORACLE)
def ccnet_ppl_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing: per-document perplexity under an
    add-one bigram LM trained on the src0 subset, split head/middle/tail
    at the corpus 1/3 and 2/3 percentiles. LM tables are broadcast;
    scoring is map-only explode + one per-doc aggregation; thresholds
    are a 1-row percentile aggregate (operators/selection.py)."""
    from koby_s_ai_vector_db_spark.functions.caching import memo_persist

    docs = load_table(spark, sf_dir, "documents")
    lm = docs.filter(F.col("source") == TARGET_SOURCE)
    # The threshold aggregate and the bucket join both consume the
    # per-doc scores; persist so the corpus-sized scoring pipeline runs
    # once, not twice (at 100 TB: materialize the score table).
    scored = memo_persist(
        spark,
        ("ccnet_scored", sf_dir),
        lambda: lm_perplexity(docs, lm, carry_cols=("lang",)),
    )
    return perplexity_buckets(scored)


# Mixture spec: en-heavy with deliberate repeat (epochs > 1) and
# downsample (epochs < 1) regimes at sf0.01 token counts; 'fr' is
# intentionally absent → weight 0 → dropped from the mix.
MIX_WEIGHTS = {"en": 0.45, "de": 0.3, "zh": 0.15, "es": 0.1}
MIX_BUDGET = 20_000
MIX_SEED = 23

_MIX_CASE = (
    "CASE "
    + " ".join(
        f"WHEN lang = '{s}' THEN {w!r}" for s, w in sorted(MIX_WEIGHTS.items())
    )
    + " ELSE 0.0 END"
)

_MIXBUDGET_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang,
           len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''))::BIGINT AS n_tokens
    FROM documents
),
{mix_oracle_sql("toks", _MIX_CASE, MIX_BUDGET, MIX_SEED)}
"""


@register("mix_token_budget", _MIXBUDGET_ORACLE)
def mix_token_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing audit: per-language available vs target
    vs achieved tokens with the epoch (repeat) factor — epochs > 1 means
    the stratum repeats, < 1 downsamples, weight-0 strata drop. Copy
    counts are map-only after one broadcast per-stratum aggregate
    (operators/selection.py::token_budget_mix)."""
    docs = load_table(spark, sf_dir, "documents")
    return token_budget_mix_summary(
        docs, MIX_WEIGHTS, MIX_BUDGET, strata_col="lang", seed=MIX_SEED,
        cache_key=("mixbudget", sf_dir),
    )


# --- end-to-end pretraining-corpus pipeline ---------------------------------
# The full composition a pretraining corpus build runs, value-checked in
# ONE oracle: stratified sample → exact dedup → 3-gram benchmark
# decontamination → perplexity gate (drop the least-fluent tail third) →
# token-budget mixing with repeats. Each stage is an already-oracled
# operator; like curate_training_mix this query's value is checking the
# COMPOSITION end-to-end on both engines — cross-stage wiring bugs
# (wrong survivor set feeding the LM gate, thresholds computed over the
# wrong population, mixing over pre-gate token counts) are exactly what
# single-stage oracles cannot catch.
PIPE_BUDGET = 10_000


def _pipe_oracle() -> str:
    # Import inside the builder: corpus_q is a sibling queries module
    # (top-level import would be circular through queries/__init__).
    from koby_s_ai_vector_db_spark.queries.corpus_q import (
        CONTAM_MOD,
        CONTAM_N,
        SAMPLE_DEFAULT,
        SAMPLE_RATES,
        SAMPLE_SEED,
    )

    assert CONTAM_N == 3, "gram templates below are written for n=3"
    sample_case = stratified_sample_oracle_case(
        SAMPLE_RATES, "lang", SAMPLE_DEFAULT
    )
    h = sql_hash32("CAST(doc_id AS VARCHAR)", seed=SAMPLE_SEED)
    return f"""
WITH sampled AS (
    SELECT doc_id, text, lang FROM documents
    WHERE {h} % 1000000
          < CAST(round({sample_case} * 1000000) AS BIGINT)
),
deduped AS (
    SELECT min(doc_id) AS doc_id, min(lang) AS lang, text
    FROM sampled GROUP BY text
),
words_all AS (
    SELECT doc_id, source,
           list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS w
    FROM documents
),
b_post AS (
    SELECT DISTINCT g FROM (
        SELECT unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                     for i in range(1, len(w) - 1)])) AS g
        FROM words_all WHERE doc_id % {CONTAM_MOD} = 0 AND len(w) >= {CONTAM_N}
    )
),
d_words AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS w
    FROM deduped
),
contaminated AS (
    SELECT DISTINCT dp.doc_id FROM (
        SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                             for i in range(1, len(w) - 1)])) AS g
        FROM d_words WHERE len(w) >= {CONTAM_N}
    ) dp JOIN b_post USING (g)
    WHERE dp.doc_id % {CONTAM_MOD} <> 0
),
surv AS (
    SELECT doc_id, lang, w, len(w)::BIGINT AS n_tokens FROM d_words
    WHERE doc_id % {CONTAM_MOD} <> 0
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
),
{lm_oracle_ctes("words_all", _LM_PRED)},
{ppl_scored_ctes("surv", carry_cols=("lang", "n_tokens"), emit_nll=False)},
cuts AS (
    SELECT round(quantile_cont(ppl, {1.0 / 3.0!r}), 6) AS t_head,
           round(quantile_cont(ppl, {2.0 / 3.0!r}), 6) AS t_mid
    FROM scored
),
gated AS (
    SELECT s.doc_id, s.lang, s.n_tokens FROM scored s CROSS JOIN cuts
    WHERE s.ppl <= cuts.t_mid
),
{mix_oracle_sql("gated", _MIX_CASE, PIPE_BUDGET, MIX_SEED)}
"""


@register("curate_pretrain_pipeline", _pipe_oracle())
def curate_pretrain_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pretraining corpus build, stage-composed and value-checked
    end-to-end: per-language stratified sample → exact dedup → 3-gram
    benchmark decontamination → bigram-LM perplexity gate dropping the
    tail third → token-budget mixing with repeats. Plan: one map-only
    sample filter, one dedup shuffle, one broadcast postings join,
    map-only LM scoring over broadcast model tables, one per-doc
    aggregation (persisted — thresholds and mixing both consume it),
    then per-stratum bounded aggregates."""
    from koby_s_ai_vector_db_spark.functions.caching import memo_persist
    from koby_s_ai_vector_db_spark.operators.corpus import (
        ngram_contamination,
        stratified_sample,
    )
    from koby_s_ai_vector_db_spark.operators.dedup import words_expr
    from koby_s_ai_vector_db_spark.queries.corpus_q import (
        CONTAM_MOD,
        CONTAM_N,
        SAMPLE_DEFAULT,
        SAMPLE_RATES,
        SAMPLE_SEED,
    )

    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_sample(
        docs.select("doc_id", "text", "lang"),
        SAMPLE_RATES,
        strata_col="lang",
        default_rate=SAMPLE_DEFAULT,
        seed=SAMPLE_SEED,
    )
    deduped = sampled.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.min("lang").alias("lang")
    )
    bench = docs.filter(F.col("doc_id") % CONTAM_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    flagged = (
        ngram_contamination(deduped, bench, n=CONTAM_N)
        .filter(F.col("doc_id") % CONTAM_MOD != 0)
        .select("doc_id")
        .distinct()
    )
    surv = (
        deduped.filter(F.col("doc_id") % CONTAM_MOD != 0)
        .join(flagged, "doc_id", "left_anti")
        .withColumn("n_tokens", F.size(words_expr("text")).cast("long"))
    )
    lm = docs.filter(F.col("source") == TARGET_SOURCE)
    scored = memo_persist(
        spark,
        ("pipe_scored", sf_dir),
        lambda: lm_perplexity(surv, lm, carry_cols=("lang", "n_tokens")),
    )
    gated = perplexity_buckets(scored).filter(F.col("bucket") != "tail")
    return token_budget_mix_summary(
        gated,
        MIX_WEIGHTS,
        PIPE_BUDGET,
        strata_col="lang",
        seed=MIX_SEED,
        tokens_col="n_tokens",
        cache_key=("pipe_mix", sf_dir),
    )


# --- DSIR resampling (the "R") ----------------------------------------------
# Gumbel-top-k draw of DSIR_K docs with P ∝ exp(score/τ), derandomized
# via the portable hash so both engines draw the identical sample.
DSIR_K = 64
DSIR_TAU = 5.0

_DSIR_SAMPLE_ORACLE = f"""
WITH scored AS ({_DSIR_ORACLE}),
keyed AS (
    SELECT doc_id, lang, source, n_feat, score,
           round(score / {DSIR_TAU}
                 - ln(-ln(({sql_hash32("CAST(doc_id AS VARCHAR)", seed=GUMBEL_SEED)} % 1000000 + 0.5) / 1000000.0)),
                 6) AS skey
    FROM scored
)
SELECT doc_id, lang, source, n_feat, score, skey,
       row_number() OVER (ORDER BY skey DESC, doc_id ASC) AS rank
FROM keyed
QUALIFY rank <= {DSIR_K}
"""


@register("dsir_sample", _DSIR_SAMPLE_ORACLE)
def dsir_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance RESAMPLING: Gumbel-top-k draw of 64 documents
    with P ∝ exp(score/5), derandomized through the portable md5 hash.
    Map-only key computation over the memoized score table, then
    orderBy+limit = TakeOrderedAndProject; the rank window runs on the
    64-row result (operators/selection.py::gumbel_topk_sample)."""
    return gumbel_topk_sample(
        _dsir_scored(spark, sf_dir), k=DSIR_K, tau=DSIR_TAU
    )


# --- temperature-scaled mixture weights --------------------------------------
# The other canonical mixing policy next to the explicit-weight
# token_budget_mix above: multilingual pretraining corpora (XLM-R,
# mT5 style) draw strata with probability p_i ∝ (tokens_i)^alpha,
# alpha < 1 flattening the natural distribution so low-resource strata
# are upsampled without hand-tuned weights. Everything is a per-stratum
# scalar pipeline: one map-side-combined aggregate per stratum, then
# arithmetic over a handful of rows — no second pass over the corpus.
TEMP_ALPHA = 0.3
TEMP_BUDGET = 50_000

_TEMP_ORACLE = f"""
WITH toks AS (
    SELECT lang,
           len(list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> ''))::BIGINT AS n_tokens
    FROM documents
),
strata AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS avail_tokens
    FROM toks GROUP BY lang
),
w AS (
    SELECT lang, n_docs, avail_tokens,
           CAST(round(pow(CAST(avail_tokens AS DOUBLE),
                          CAST({TEMP_ALPHA!r} AS DOUBLE)) * 1000000)
                AS BIGINT) AS wq
    FROM strata
),
tot AS (
    SELECT CAST(sum(avail_tokens) AS BIGINT) AS tot_tokens,
           CAST(sum(wq) AS BIGINT) AS tot_w
    FROM w
)
SELECT lang, n_docs, avail_tokens,
       round(CAST(avail_tokens AS DOUBLE) / tot_tokens, 6) AS p_raw,
       round(CAST(wq AS DOUBLE) / tot_w, 6) AS p_temp,
       round(CAST(wq AS DOUBLE) / tot_w * CAST({TEMP_BUDGET} AS DOUBLE), 2)
         AS target_tokens,
       round(CAST(wq AS DOUBLE) / tot_w * CAST({TEMP_BUDGET} AS DOUBLE)
             / CAST(avail_tokens AS DOUBLE), 6) AS epochs
FROM w CROSS JOIN tot
"""


@register("mix_temperature", _TEMP_ORACLE)
def mix_temperature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixing (p_i ∝ tokens_i^alpha,
    alpha=0.3): per-language natural share, flattened share, token
    target under the budget and the implied epoch factor. One
    map-side-combined per-stratum aggregate, then scalar arithmetic over
    |strata| rows — the weights derive from the data, not a hand-written
    table (contrast mix_token_budget). wq is INT64-quantized (1e-6
    grain) before the totals so both the cross-engine pow() ulp AND the
    sum's addition order are out of the driver hash — a rounded-double
    sum would still be order-dependent (the ta_entropy lesson)."""
    from koby_s_ai_vector_db_spark.operators.dedup import words_expr

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.size(words_expr("text")).cast("long").alias("n_tokens")
    )
    strata = toks.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("avail_tokens"),
    )
    from pyspark.sql import Window

    w = strata.withColumn(
        "wq",
        F.round(
            F.pow(F.col("avail_tokens").cast("double"), F.lit(TEMP_ALPHA))
            * 1_000_000
        ).cast("long"),
    )
    # Totals via a window over the |strata|-row aggregate — NOT a second
    # aggregate subtree, which Catalyst would plan as a second full scan
    # of the corpus (no subtree reuse across the crossJoin). Integer
    # sums, so window row order cannot matter.
    wt = Window.partitionBy()
    w = w.withColumn("tot_tokens", F.sum("avail_tokens").over(wt)).withColumn(
        "tot_w", F.sum("wq").over(wt)
    )
    budget = F.lit(TEMP_BUDGET).cast("double")
    share = F.col("wq").cast("double") / F.col("tot_w")
    return w.select(
        "lang",
        "n_docs",
        "avail_tokens",
        F.round(
            F.col("avail_tokens").cast("double") / F.col("tot_tokens"), 6
        ).alias("p_raw"),
        F.round(share, 6).alias("p_temp"),
        F.round(share * budget, 2).alias("target_tokens"),
        F.round(
            share * budget / F.col("avail_tokens").cast("double"), 6
        ).alias("epochs"),
    )


# --- round-9 prebuild (NOT registered: the round-8 window is full) -----------
# Per-source token-budget selection (VERDICT r07 item 6): each provenance
# source gets a token budget proportional to its spec weight; docs are
# admitted in deterministic hash order until the source's budget is spent
# (greedy prefix — running total INCLUDING the doc must fit). Differs from
# mix_token_budget (an epochs/copies SUMMARY per stratum) in that this
# SELECTS the actual doc set and audits it (kept_id_sum is the set
# checksum). Parity: tests/test_prebuilt_r9.py.
TOKB_TOTAL = 50_000
TOKB_SEED = 41
_TOKB_W = {f"src{i}": (i % 4) + 1 for i in range(20)}
TOKB_BUDGETS = {
    s: TOKB_TOTAL * w // sum(_TOKB_W.values()) for s, w in _TOKB_W.items()
}
# Bucket = high bits of the 32-bit portable hash → 4096 buckets; bucket
# order is hash order, so bucket-prefix + boundary-bucket resolution
# reproduces the global per-source (h, doc_id) cumsum exactly.
TOKB_BUCKET_SHIFT = 20


def _tokb_budget_case(col: str) -> str:
    return (
        "CASE "
        + " ".join(
            f"WHEN {col} = '{s}' THEN {b}"
            for s, b in sorted(TOKB_BUDGETS.items())
        )
        + " ELSE 0 END"
    )


def _tokb_oracle() -> str:
    h = sql_hash32("CAST(doc_id AS VARCHAR)", seed=TOKB_SEED)
    return f"""
WITH toks AS (
    SELECT doc_id, source,
           len(list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> ''))::BIGINT AS n_tok,
           {h} AS h
    FROM documents
),
sel AS (
    SELECT *, sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM toks
),
kept AS (SELECT * FROM sel WHERE cum <= ({_tokb_budget_case('source')})),
avail AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_avail,
           CAST(sum(n_tok) AS BIGINT) AS tokens_avail
    FROM toks GROUP BY 1
),
ka AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_tok) AS BIGINT) AS kept_tokens,
           CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
    FROM kept GROUP BY 1
)
SELECT a.source,
       CAST(({_tokb_budget_case('a.source')}) AS BIGINT) AS budget_tokens,
       a.n_avail, a.tokens_avail,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(coalesce(k.kept_id_sum, 0) AS BIGINT) AS kept_id_sum
FROM avail a LEFT JOIN ka k USING (source)
"""


def _tokb_budget_col(src_col: str):
    col = None
    for s, b in sorted(TOKB_BUDGETS.items()):
        col = (
            F.when(F.col(src_col) == s, b)
            if col is None
            else col.when(F.col(src_col) == s, b)
        )
    return col.otherwise(0).cast("long")


@register("tok_source_budget", _tokb_oracle())
def tok_source_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe greedy-prefix selection: the oracle's per-source window
    cumsum would be |sources| tasks each sorting its whole source at
    100 TB, so the engine runs the two-phase form — (source, hash-bucket)
    token sums (map-side combined), a cumulative window over the ≤4096-row
    bucket table, whole buckets below the budget admit in bulk, and ONLY
    the single boundary bucket per source resolves per-doc (a window over
    one bucket's rows). Bucket order extends hash order, so the result is
    exactly the oracle's global cumsum prefix."""
    from pyspark.sql import Window

    from koby_s_ai_vector_db_spark.functions.caching import memo_persist
    from koby_s_ai_vector_db_spark.functions.hashing import portable_hash32
    from koby_s_ai_vector_db_spark.functions.partitioning import (
        CHEAP_MAP_BYTES_PER_TASK,
        spread,
    )
    from koby_s_ai_vector_db_spark.operators.dedup import words_expr

    # Byte-capped spread (round 14, VERDICT r13 item 5): the tokenize+
    # hash projection is cheap per byte, and an uncapped spread baked a
    # 32-wide layout into this PERSISTED cache — beyond AQE's coalescing
    # — so the three downstream consumers paid 3×32 near-empty task
    # scans per call (steady 2.9 s -> 0.7-0.9 s at width 4-8; scaling
    # ratio 0.77 at 8-vs-32 cores). No-op at scale.
    proj = memo_persist(
        spark,
        ("tokb_proj", sf_dir),
        lambda: spread(
            load_table(spark, sf_dir, "documents"),
            bytes_per_task=CHEAP_MAP_BYTES_PER_TASK,
        ).select(
            "doc_id",
            "source",
            F.size(words_expr("text")).cast("long").alias("n_tok"),
            portable_hash32(
                F.col("doc_id").cast("string"), seed=TOKB_SEED
            ).alias("h"),
        ),
    ).withColumn("bucket", F.shiftright("h", TOKB_BUCKET_SHIFT))

    ba = proj.groupBy("source", "bucket").agg(
        F.sum("n_tok").alias("btok"),
        F.count("*").alias("bn"),
        F.sum("doc_id").alias("bid_sum"),
    )
    wb = Window.partitionBy("source").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    bc = (
        ba.withColumn("cum", F.sum("btok").over(wb))
        .withColumn("base", F.col("cum") - F.col("btok"))
        .withColumn("budget", _tokb_budget_col("source"))
    )
    whole = bc.filter(F.col("cum") <= F.col("budget")).groupBy("source").agg(
        F.sum("bn").alias("n_kept"),
        F.sum("btok").alias("kept_tokens"),
        F.sum("bid_sum").alias("kept_id_sum"),
    )
    boundary = bc.filter(
        (F.col("base") < F.col("budget")) & (F.col("cum") > F.col("budget"))
    ).select("source", "bucket", "base", "budget")
    wd = Window.partitionBy("source", "bucket").orderBy("h", "doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    bres = (
        proj.join(F.broadcast(boundary), ["source", "bucket"])
        .withColumn("dcum", F.sum("n_tok").over(wd))
        .filter(F.col("base") + F.col("dcum") <= F.col("budget"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_tok").alias("kept_tokens"),
            F.sum("doc_id").alias("kept_id_sum"),
        )
    )
    kept = (
        whole.unionByName(bres)
        .groupBy("source")
        .agg(
            F.sum("n_kept").alias("n_kept"),
            F.sum("kept_tokens").alias("kept_tokens"),
            F.sum("kept_id_sum").alias("kept_id_sum"),
        )
    )
    # avail folds over the (source, bucket) aggregate instead of a second
    # pass over the per-doc projection: sum(bn)=count(*), sum(btok)=
    # sum(n_tok) exactly (round-13, guide §2.3 aggregate-before-shuffle);
    # one fewer corpus-sized aggregation per call.
    avail = ba.groupBy("source").agg(
        F.sum("bn").alias("n_avail"),
        F.sum("btok").cast("long").alias("tokens_avail"),
    )
    return (
        avail.withColumn("budget_tokens", _tokb_budget_col("source"))
        .join(F.broadcast(kept), "source", "left")
        .select(
            "source",
            "budget_tokens",
            "n_avail",
            "tokens_avail",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
            F.coalesce("kept_id_sum", F.lit(0)).cast("long").alias("kept_id_sum"),
        )
    )
