"""Batch-equivalence: the streaming pipelines must produce exactly the
rows their batch twins produce (SURVEY §7.6). Finite fixture → one
availableNow pass → complete-mode memory sink → compare multisets."""

from __future__ import annotations

import uuid

from koby_s_ai_vector_db_spark.sources.tables import load_table
from koby_s_ai_vector_db_spark.streaming.live import (
    read_events_stream,
    sliding_live_users,
    user_session_windows,
)
from tests.conftest import SF_DIRS

SF_DIR = SF_DIRS["t1"]


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_sliding_live_users_stream_equals_batch(spark):
    batch = sliding_live_users(load_table(spark, SF_DIR, "events"))
    name = f"s_live_{uuid.uuid4().hex[:8]}"
    stream = _run_stream(spark, sliding_live_users(read_events_stream(spark, SF_DIR)), name)
    assert _rows(stream) == _rows(batch)
    assert len(_rows(batch)) > 0


def test_session_windows_stream_equals_batch(spark):
    batch = user_session_windows(load_table(spark, SF_DIR, "events"))
    name = f"s_sess_{uuid.uuid4().hex[:8]}"
    stream = _run_stream(
        spark, user_session_windows(read_events_stream(spark, SF_DIR)), name
    )
    assert _rows(stream) == _rows(batch)
    assert len(_rows(batch)) > 0


def test_streaming_exact_dedup_equals_batch(spark, tmp_path):
    """The dedup state table built incrementally over two forced
    microbatches must equal the batch GROUP BY bit-for-bit — min/count
    are arrival-order independent."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.streaming.dedup import (
        DOCS_SCHEMA,
        streaming_exact_dedup,
    )

    docs = load_table(spark, SF_DIR, "documents")
    # Plant exact duplicates across the two halves so dedup state must
    # merge hashes seen in DIFFERENT microbatches.
    dd = docs.unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
    )
    src = str(tmp_path / "docs_split")
    dd.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/half=0")
    dd.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/half=1")

    stream_in = (
        spark.readStream.schema(DOCS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .load(src)
    )
    name = f"s_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_exact_dedup(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "dedup state was never exercised across batches"

    stream_out = spark.sql(f"SELECT * FROM {name}")
    batch = streaming_exact_dedup(dd)
    assert _rows(stream_out) == _rows(batch)
    assert batch.filter("n_copies > 1").count() > 0  # planted dups found


def test_streaming_sketch_dedup_equals_batch(spark, tmp_path):
    """The SimHash sketch catalog built over two forced microbatches must
    equal the batch GROUP BY — and sketch-identical near-dups arriving in
    DIFFERENT batches must collapse into one state row."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.streaming.dedup import (
        DOCS_SCHEMA,
        streaming_sketch_dedup,
    )

    docs = load_table(spark, SF_DIR, "documents")
    # Exact text copies under new ids: same sketch, different id. The odd
    # offset flips parity, so each copy lands in the OPPOSITE half from its
    # original and the state merge is genuinely cross-microbatch.
    dd = docs.unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1_000_001
        )
    )
    src = str(tmp_path / "docs_sketch_split")
    dd.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/half=0")
    dd.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/half=1")

    stream_in = (
        spark.readStream.schema(DOCS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .load(src)
    )
    name = f"s_sketch_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_sketch_dedup(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "sketch state was never exercised across batches"

    stream_out = spark.sql(f"SELECT * FROM {name}")
    batch = streaming_sketch_dedup(dd)
    assert _rows(stream_out) == _rows(batch)
    # A planted copy and its original differ by parity, so they landed in
    # different microbatches yet share a sketch row.
    assert stream_out.filter("n_copies > 1").count() > 0


def test_docs_stream_reader_dedup_equals_batch(spark):
    """The production docs-stream entry point (read_docs_stream over the
    fixture glob) feeds streaming_exact_dedup to the same state table the
    batch form computes."""
    from koby_s_ai_vector_db_spark.streaming.dedup import (
        read_docs_stream,
        streaming_exact_dedup,
    )

    name = f"s_docsrd_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_exact_dedup(read_docs_stream(spark, SF_DIR))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_out = spark.sql(f"SELECT * FROM {name}")
    batch = streaming_exact_dedup(load_table(spark, SF_DIR, "documents"))
    assert _rows(stream_out) == _rows(batch)
    assert stream_out.count() > 0


def test_stateful_asof_enrich_equals_batch(spark, tmp_path):
    """Streaming temporal join (streaming/temporal.py): over a
    TIME-PARTITIONED source (each batch newer than the last — the append-
    log shape) the stateful enrichment must equal the batch asof_join
    exactly, including state carried across the batch boundary."""
    import time as _time

    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.operators.asof import asof_join
    from koby_s_ai_vector_db_spark.queries.asof_q import _updates
    from koby_s_ai_vector_db_spark.streaming.temporal import (
        NO_MATCH,
        stateful_asof_enrich,
        tag_streams,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    upd = _updates(spark, SF_DIR).select(
        "user_id",
        F.unix_micros(F.col("upd_ts").cast("timestamp")).alias("up_ts"),
        F.col("o_totalprice").alias("price"),
    )

    tagged = tag_streams(ev, upd.withColumnRenamed("up_ts", "ts_us"))
    cut = tagged.agg(F.expr("percentile(ts_us, 0.5)")).head()[0]
    src = str(tmp_path / "tagged_split")
    tagged.filter(F.col("ts_us") < cut).coalesce(1).write.parquet(f"{src}/half=0")
    _time.sleep(0.1)  # distinct mtimes → file-source processes halves in order
    tagged.filter(F.col("ts_us") >= cut).coalesce(1).write.parquet(f"{src}/half=1")

    stream_in = (
        spark.readStream.schema(tagged.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .load(src)
    )
    name = f"s_asof_{uuid.uuid4().hex[:8]}"
    q = (
        stateful_asof_enrich(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "temporal state was never exercised across batches"

    stream_out = spark.sql(f"SELECT * FROM {name}")
    batch = asof_join(
        ev, upd, ["user_id"], "ts_us", "up_ts",
        how="left", matched_ts_col="matched_ts", assume_deduped=True,
    ).select(
        "event_id", "user_id", "ts_us",
        F.coalesce("price", F.lit(NO_MATCH)).alias("price"),
        F.coalesce("matched_ts", F.lit(-1)).alias("matched_ts"),
    )
    assert _rows(stream_out) == _rows(batch)
    # Non-degenerate: some events precede any update, most are enriched.
    assert stream_out.filter(f"price = {NO_MATCH}").count() > 0
    assert stream_out.filter(f"price != {NO_MATCH}").count() > 0


def test_emit_first_seen_bounded_passthrough(spark, tmp_path):
    """dropDuplicatesWithinWatermark forwards exactly one row per content
    hash; which physical row survives is arrival-dependent, so assert the
    hash set and the one-per-hash contract, not ids."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.streaming.dedup import (
        DOCS_SCHEMA,
        emit_first_seen,
    )

    docs = load_table(spark, SF_DIR, "documents")
    dd = docs.unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
    )
    src = str(tmp_path / "docs_dup")
    dd.coalesce(1).write.parquet(src)

    stream_in = (
        spark.readStream.schema(DOCS_SCHEMA)
        .format("parquet")
        .load(src)
        .withColumn("ingest_ts", F.timestamp_micros(F.col("doc_id")))
    )
    name = f"s_first_{uuid.uuid4().hex[:8]}"
    q = (
        emit_first_seen(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(f"SELECT md5(text) AS h FROM {name}")
    got_hashes = sorted(r.h for r in out.collect())
    want_hashes = sorted(
        r.h for r in dd.select(F.md5("text").alias("h")).distinct().collect()
    )
    assert got_hashes == want_hashes  # one row per hash, none missing


def test_stateful_user_stats_across_batches(spark, tmp_path):
    """applyInPandasWithState carries per-user state across microbatches:
    the fixture is split into two files, maxFilesPerTrigger=1 forces (at
    least) two batches, and the LAST update emitted per user must equal
    the batch aggregate over the whole fixture."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.streaming.live import (
        EVENTS_SCHEMA,
        stateful_user_stats,
    )

    ev = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_split")
    # Write the normalized (schema-driven) events so the stream schema below
    # matches regardless of which fixture vintage (ns-as-long vs native µs)
    # is on disk. Cast ts to timestamp_ntz explicitly: under a legacy-nanos
    # fixture load_table yields TIMESTAMP (LTZ), and writing that while
    # DECLARING timestamp_ntz in readStream would only stay value-correct
    # because the session tz is pinned UTC — make the written physical type
    # match the declared schema instead of relying on that.
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/half=0")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/half=1")

    stream_in = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .load(src)
    )
    name = f"s_state_{uuid.uuid4().hex[:8]}"
    q = (
        stateful_user_stats(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "state was never exercised across batches"

    # Latest update per user (n_events is monotone within a user).
    updates = spark.sql(f"SELECT * FROM {name}")
    w_latest = updates.groupBy("user_id").agg(
        F.max_by(
            F.struct("n_events", "n_purchases", "n_errors", "last_seen_us"), "n_events"
        ).alias("s")
    ).select("user_id", "s.*")

    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("last_seen_us"),
    )
    assert _rows(w_latest) == _rows(batch)
    assert len(_rows(batch)) > 0


def test_click_attribution_bucketed_equals_direct(spark):
    """The bucketed batch form (a19's plan — per-user candidates bounded
    to same-and-adjacent windows) must emit exactly the direct interval
    join's rows: a click in [p - window, p] falls in the purchase's own
    or previous window-width bucket, never elsewhere."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.streaming.live import (
        click_attribution,
        click_attribution_bucketed,
    )

    ev = load_table(spark, SF_DIR, "events")
    p = ev.filter(F.col("event_type") == "purchase")
    c = ev.filter(F.col("event_type") == "click")
    direct = _rows(click_attribution(p, c))
    bucketed = _rows(click_attribution_bucketed(p, c))
    assert bucketed == direct
    assert len(direct) > 0


def test_click_attribution_stream_equals_batch(spark):
    """True stream-stream interval join (two filtered streams over the
    events source, watermarked both sides, append mode) must emit exactly
    the batch twin's rows."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.streaming.live import (
        apply_watermark,
        click_attribution,
    )

    ev = load_table(spark, SF_DIR, "events")
    batch = click_attribution(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )

    s1 = apply_watermark(
        read_events_stream(spark, SF_DIR).filter(F.col("event_type") == "purchase")
    )
    s2 = apply_watermark(
        read_events_stream(spark, SF_DIR).filter(F.col("event_type") == "click")
    )
    name = f"s_attrib_{uuid.uuid4().hex[:8]}"
    q = (
        click_attribution(s1, s2)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream = spark.sql(f"SELECT * FROM {name}")
    assert _rows(stream) == _rows(batch)
    assert len(_rows(batch)) > 0


def test_streaming_kmv_sketch_equals_batch(spark, tmp_path):
    """The stateful KMV synopsis converges to the batch kmv_sample over
    everything seen, across a forced multi-batch run — truncation to k
    per microbatch loses nothing (k-min is monotone)."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.functions.hashing import portable_hash64
    from koby_s_ai_vector_db_spark.operators.sketches import kmv_sample
    from koby_s_ai_vector_db_spark.streaming.dedup import streaming_kmv_sketch

    ev = load_table(spark, SF_DIR, "events")
    hashed = ev.select(
        "event_type",
        "event_id",
        portable_hash64(F.col("user_id").cast("string"), seed=7).alias("h"),
    )
    src = str(tmp_path / "kmv_split")
    hashed.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        f"{src}/half=0"
    )
    hashed.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        f"{src}/half=1"
    )
    stream_in = (
        spark.readStream.schema("event_type string, event_id bigint, h bigint")
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .load(src)
    )
    name = f"s_kmv_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_kmv_sketch(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "state was never exercised across batches"

    # Each microbatch re-emits the group's FULL refreshed synopsis; with
    # availableNow the final state is the union's k-min, and because the
    # synopsis only shrinks hash-wise, the distinct (group, h) pairs that
    # are <= the group's final k-th hash form exactly the batch sample.
    updates = spark.sql(f"SELECT * FROM {name}")
    batch = kmv_sample(ev, F.col("user_id").cast("string"), ["event_type"])
    got = {
        (r.event_type, r.h)
        for r in updates.groupBy("event_type")
        .agg(F.collect_set("h").alias("hs"))
        .select("event_type", F.explode("hs").alias("h"))
        .join(
            batch.groupBy("event_type").agg(F.max("h").alias("kth")),
            "event_type",
        )
        .where(F.col("h") <= F.col("kth"))
        .select("event_type", "h")
        .collect()
    }
    want = {(r.event_type, r.h) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_streaming_hll_registers_equal_batch(spark, tmp_path):
    """The HLL register build is a plain groupBy-max, so it runs AS a
    streaming aggregation with no custom state: the complete-mode
    register table after consuming a forced multi-batch stream is
    bit-identical to the batch build — the per-day stored-rollup story
    (a22_hll_daily_merge) holds on a live ingest stream too."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.operators.sketches import hll_registers

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "event_id", F.col("user_id").cast("string").alias("k")
    )
    src = str(tmp_path / "hll_split")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        f"{src}/half=0"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        f"{src}/half=1"
    )
    stream_in = (
        spark.readStream.schema("event_type string, event_id bigint, k string")
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .load(src)
    )
    name = f"s_hll_{uuid.uuid4().hex[:8]}"
    q = (
        hll_registers(stream_in, F.col("k"), ["event_type"])
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "registers were never updated across batches"

    got = _rows(spark.sql(f"SELECT * FROM {name}"))
    want = _rows(hll_registers(ev, F.col("k"), ["event_type"]))
    assert got == want and len(want) > 0


def test_streaming_cm_and_qh_cells_equal_batch(spark, tmp_path):
    """The other two sketch builds are also plain streaming aggregations
    (count-min: groupBy-count; quantile histogram: groupBy-count over
    integer buckets) — complete-mode cell tables over a forced
    multi-batch stream are bit-identical to the batch builds. With the
    HLL and KMV tests above, every member of the mergeable-sketch family
    is proven streaming-maintainable."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.operators.sketches import cm_cells, qh_cells

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    src = str(tmp_path / "sk_split")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        f"{src}/half=0"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        f"{src}/half=1"
    )
    stream_in = (
        spark.readStream.schema("event_id bigint, event_type string, value double")
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .load(src)
    )
    for label, build in (
        ("cm", lambda df: cm_cells(df, F.col("event_type"))),
        ("qh", lambda df: qh_cells(df, "value", ["event_type"])),
    ):
        name = f"s_{label}_{uuid.uuid4().hex[:8]}"
        q = (
            build(stream_in)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        assert n_batches >= 2, f"{label}: cells never updated across batches"
        got = _rows(spark.sql(f"SELECT * FROM {name}"))
        want = _rows(build(ev))
        assert got == want and len(want) > 0, label


def test_click_attribution_state_bounded_under_hot_user(spark, tmp_path):
    """Watermark eviction must bound stream-stream join state even when
    one user is 100×-skewed (VERDICT r11 item 8): the batch twin buckets
    its interval join, the streaming path intentionally keeps the raw
    interval condition BECAUSE Spark derives the state-eviction bound
    from it — this test pins that the bound is real. 12 hour-slices
    arrive as 12 micro-batches; by the last batch the watermark has
    passed all but ~the last slice, so total retained state must be a
    small fraction of the rows ingested, hot user included."""
    import datetime

    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.streaming.live import (
        apply_watermark,
        click_attribution,
    )

    base = datetime.datetime(2026, 1, 1)
    n_slices, rows = 12, []
    for s in range(n_slices):
        t0 = base + datetime.timedelta(hours=s)
        # Hot user 0: 200 clicks/slice; users 1-5: 2 clicks each (100×).
        for i in range(200):
            rows.append((s * 10_000 + i, t0 + datetime.timedelta(
                seconds=18 * i), 0, "click"))
        for u in range(1, 6):
            for i in range(2):
                rows.append((s * 10_000 + 500 + u * 10 + i,
                             t0 + datetime.timedelta(minutes=20 * i + u),
                             u, "click"))
        # One purchase per user per slice, late enough in the hour that
        # its 30-min lookback stays inside the slice for determinism.
        for u in range(6):
            rows.append((s * 10_000 + 900 + u,
                         t0 + datetime.timedelta(minutes=50, seconds=u),
                         u, "purchase"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    src = str(tmp_path / "ev")
    # One parquet file per hour-slice, written in time order → the file
    # stream (maxFilesPerTrigger=1) replays them as 12 micro-batches
    # with a monotonically advancing watermark.
    for s in range(n_slices):
        ev.filter(
            (F.col("event_id") >= s * 10_000)
            & (F.col("event_id") < (s + 1) * 10_000)
        ).coalesce(1).write.parquet(f"{src}/slice={s:02d}")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/slice=*")
    )
    s1 = apply_watermark(stream.filter(F.col("event_type") == "purchase"))
    s2 = apply_watermark(stream.filter(F.col("event_type") == "click"))
    name = f"s_hotuser_{uuid.uuid4().hex[:8]}"
    q = (
        click_attribution(s1, s2)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    progress = q.recentProgress
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in progress
        if p.get("stateOperators")
    ]
    total_rows = len(rows)
    # Eviction, not accumulation: final state is bounded by ~the last
    # watermark horizon (clicks survive watermark + 30 min lookback ≈
    # one slice), far below the 2.5k rows ingested. Without eviction the
    # hot user alone would hold 2400 click rows at the end.
    assert state_rows, "no stateOperators progress recorded"
    assert state_rows[-1] < total_rows / 4, (state_rows[-1], total_rows)
    # And the peak never approaches full accumulation either.
    assert max(state_rows) < total_rows * 0.6, (max(state_rows), total_rows)
    # Correctness: in-order arrival loses nothing vs the batch twin.
    batch = click_attribution(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )
    assert _rows(spark.sql(f"SELECT * FROM {name}")) == _rows(batch)
