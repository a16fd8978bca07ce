"""Streaming selection gate: score arriving documents against FROZEN
selection models and append survivors to the curated-corpus sink.

The batch selection tier (operators/selection.py) fits its models on the
input corpus; a stream must not — re-fitting per micro-batch would make
a document's score depend on arrival order and batch boundaries. The
production shape is: train the DSIR λ table and the bigram LM ONCE on a
reference corpus (`dsir_model`, `lm_model`), then apply them per
micro-batch (`dsir_apply`, `lm_apply`) and keep documents passing fixed
thresholds. Frozen models make the stream exactly batch-equivalent: the
stream's final sink contents equal one batch scoring of all the data
with the same models (asserted in tests/test_streaming_ingest.py),
regardless of how the files were micro-batched.

Thresholds are FIXED values, not corpus percentiles — a stream has no
finite corpus to take a percentile over; production derives the cut
from the reference corpus offline (e.g. its ppl tertile) and pins it,
which is what the defaults model.

Same failure semantics as the other ingest streams
(streaming/index_ingest.py): parquet-append per micro-batch under the
stream checkpoint; replay would double-append, so production routes
through a transactional table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.operators.selection import (
    dsir_apply,
    lm_apply,
)

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def select_batch(
    batch: DataFrame,
    dsir_lam: DataFrame,
    lm: tuple,
    min_score: float,
    max_ppl: float,
) -> DataFrame:
    """The pure gate: score one batch of documents against the frozen
    models, keep rows with DSIR score ≥ min_score AND perplexity ≤
    max_ppl. Used identically by the stream (per micro-batch) and the
    batch-equivalence oracle (whole corpus at once). Documents with < 2
    tokens have no LM events and are dropped (no fluency evidence)."""
    scored = dsir_apply(batch, dsir_lam, carry_cols=("lang", "source"))
    ppl = lm_apply(batch, lm).select("doc_id", "n_events", "ppl")
    return (
        batch.select("doc_id", "text")
        .join(scored, "doc_id")
        .join(ppl, "doc_id")
        .filter((F.col("score") >= min_score) & (F.col("ppl") <= max_ppl))
        .select("doc_id", "lang", "source", "n_feat", "score", "ppl", "text")
    )


def stream_select_documents(
    spark: SparkSession,
    source_glob: str,
    sink_path: str,
    checkpoint: str,
    dsir_lam: DataFrame,
    lm: tuple,
    min_score: float = 0.0,
    max_ppl: float = 40.0,
) -> "object":
    """Start the selection stream: arriving document files are scored
    against the frozen models and survivors appended to ``sink_path``.
    Returns the StreamingQuery (availableNow trigger — callers
    `awaitTermination()`)."""
    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_glob)
    )

    def absorb(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        select_batch(batch, dsir_lam, lm, min_score, max_ppl).write.mode(
            "append"
        ).parquet(sink_path)

    return (
        docs.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
