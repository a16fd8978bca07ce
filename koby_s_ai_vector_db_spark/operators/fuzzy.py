"""Edit-distance (Levenshtein) near-duplicate join — PassJoin-style
pigeonhole blocking, DataFrame algebra end to end.

The reference's dedup surface is hash/containment based (its nearest
analogue is the token-overlap scorer, core/supabase_utils.py:280-312);
character-level fuzzy dedup is the entity-resolution tier a training-data
pipeline needs for OCR noise, whitespace drift, and single-token edits
that survive exact and shingle hashing.  Semantics: all unordered pairs
(a, b) with levenshtein(text_a, text_b) <= t.  Texts longer than t chars
are blocked via the pigeonhole scheme below; texts of length <= t (which
can't be split into t+1 nonempty segments) go through a length-bounded
brute tier inside fuzzy_edit_pairs.

Scale design (the PassJoin pigeonhole, Li et al., VLDB 2011 — public
algorithm, re-derived here as DataFrame algebra):

  * INDEX side: each text of length l1 is split into K = t+1 contiguous
    segments (floor boundaries).  If edit(s1, s2) <= t with l1 <= l2, the
    <= t edit operations can touch at most t of the t+1 segments, so at
    least ONE segment of s1 appears verbatim in s2, start-shifted by at
    most t.  Each doc emits exactly K index rows (gram, start, l1, id).
  * PROBE side: each text of length l2 emits every substring whose length
    could be a segment length of some l1 in [l2-t, l2] — segment lengths
    are floor(l1/K) or floor(l1/K)+1, so only ~2-3 distinct lengths, i.e.
    O(3*l2) probe rows, map-side generated and projected down to
    (gram, pos, l2, id) before the shuffle (texts never fan out).
  * Candidates: equi-join on xxhash64 of the gram content (fixed-width
    int64 shuffle keys; a collision only adds a candidate the verify
    discards) with post-filters l1 <= l2 <= l1+t and
    |pos - seg_start| <= t, distinct normalized pairs, then ONE exact
    levenshtein per candidate pair (texts re-joined by id — never
    carried through the explode).

Everything before the verify is a single equi-join shuffle on short gram
keys; the verify set is bounded by the blocking.  Losslessness of the
blocking (candidates ⊇ true pairs) is checked empirically against a
brute-force oracle at sf0.001 in tests/test_fuzzy_edit.py, and the DuckDB
oracle mirrors the identical candidate generation so the driver check
validates the full pipeline, not just the idea.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default edit-distance threshold: catches the fixture's planted
# single-word-substitution near-dups (char distance ~4-8) while keeping
# the candidate set sparse on natural text.
EDIT_T = 8


def _k(t: int) -> int:
    return t + 1


def segment_rows(d: DataFrame, t: int = EDIT_T) -> DataFrame:
    """K=t+1 index rows per doc: (gh=xxhash64(gram), seg_start, l1, id1).

    Expects columns (id, txt, l); floor-boundary segments — segment k
    covers [k*l div K, (k+1)*l div K) (0-based), emitted 1-based for
    substring().
    """
    k_ = _k(t)
    seg = (
        f"transform(sequence(0, {t}), k -> named_struct("
        f" 'seg_start', CAST(k * l DIV {k_} AS INT) + 1,"
        f" 'gram', substring(txt, CAST(k * l DIV {k_} AS INT) + 1,"
        f"   CAST((k + 1) * l DIV {k_} AS INT) - CAST(k * l DIV {k_} AS INT))))"
    )
    return (
        d.select(
            F.col("id").alias("id1"),
            F.col("l").alias("l1"),
            F.explode(F.expr(seg)).alias("s"),
        )
        .select(
            "id1",
            "l1",
            F.col("s.seg_start").alias("seg_start"),
            F.xxhash64("s.gram").alias("gh"),
        )
    )


def probe_rows(d: DataFrame, t: int = EDIT_T) -> DataFrame:
    """Probe rows per doc: every substring whose length could be a segment
    length of some shorter partner l1 in [l2-t, l2] — lengths in
    [max(1, (l2-t) div K), l2 div K + 1], ~3 values.  Output
    (gram, pos, l2, id2); the text column is dropped before any shuffle.
    """
    k_ = _k(t)
    return (
        d.select(
            F.col("id").alias("id2"),
            F.col("l").alias("l2"),
            F.col("txt"),
            F.explode(
                F.expr(f"sequence(greatest(1, (l - {t}) DIV {k_}), l DIV {k_} + 1)")
            ).alias("gl"),
        )
        .where(F.col("gl") <= F.col("l2"))
        .select(
            "id2",
            "l2",
            "gl",
            "txt",
            F.explode(F.expr("sequence(1, l2 - gl + 1)")).alias("pos"),
        )
        .select(
            "id2",
            "l2",
            "pos",
            F.xxhash64(F.expr("substring(txt, pos, gl)")).alias("gh"),
        )
    )


def fuzzy_edit_pairs(
    docs: DataFrame,
    t: int = EDIT_T,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All unordered near-dup pairs with levenshtein <= t.  Returns
    (doc_id_a, doc_id_b, dist) ordered.

    Texts longer than t chars go through the PassJoin pigeonhole
    blocking; texts of length <= t (where t+1 nonempty segments don't
    exist) get a separate brute candidate tier — short x (length <= 2t)
    — so exact duplicates among short strings are reported too (ADVICE
    r06).  Any partner of a short string has length <= 2t (levenshtein
    >= |len diff|), so both sides of the brute tier are length-bounded;
    its short x short slice is inherently ~quadratic because EVERY such
    pair satisfies dist <= max(l1, l2) <= t — the output itself is
    quadratic there, not the algorithm.
    """
    if t < 1:
        raise ValueError(f"edit threshold must be >= 1, got {t}")
    d_all = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        F.length(text_col).alias("l"),
    )
    d = d_all.where(F.col("l") > t)

    segs = segment_rows(d, t)
    probes = probe_rows(d, t)

    # Both join sides are corpus-sized EXPLODES (K rows/doc and ~3*len
    # rows/doc): parquet file-size stats wildly under-estimate them, so
    # left alone Catalyst broadcasts the 38M-row probe side at 10x scale
    # (measured: 534 s at the sf1 probe, single-threaded hash-relation
    # build + heap blowup). Pin the scale-safe strategy instead: one
    # sort-merge shuffle; SMJ spills gracefully where a shuffle-hash
    # build of a crowded gram partition could not. The join key is
    # xxhash64(gram), NOT the gram string — the probe shuffle carries
    # fixed-width int64 keys (measured: the bare string-keyed shuffle
    # alone cost 74 s of the 124 s sf1 run). A hash collision only adds
    # a candidate pair, which the exact levenshtein verify discards, so
    # losslessness is unaffected; the DuckDB oracle joins on the gram
    # string itself and provably reaches the identical final rows.
    cand = (
        segs.hint("merge").join(probes, "gh")
        .where(
            (F.col("l2") >= F.col("l1"))
            & (F.col("l2") <= F.col("l1") + F.lit(t))
            & (F.abs(F.col("pos") - F.col("seg_start")) <= F.lit(t))
            & (F.col("id1") != F.col("id2"))
        )
        .select(
            F.least("id1", "id2").alias("a"),
            F.greatest("id1", "id2").alias("b"),
        )
        .distinct()
    )

    # Short tier: candidates = short x (length <= 2t), disjoint from the
    # blocked tier (which requires BOTH sides > t chars). No join key
    # exists — every short pair is a candidate by construction — so this
    # is a genuine nested-loop over two length-bounded sides; the exact
    # levenshtein verify below filters the short x medium slice.
    short = d_all.where(F.col("l") <= t).select(
        F.col("id").alias("id1"), F.col("l").alias("l1")
    )
    near = d_all.where(F.col("l") <= 2 * t).select(
        F.col("id").alias("id2"), F.col("l").alias("l2")
    )
    short_cand = (
        short.crossJoin(near)
        .where(
            (F.col("id1") != F.col("id2"))
            # free prune: levenshtein >= |len diff|, so partners more
            # than t longer than the short string can never verify
            & (F.abs(F.col("l1") - F.col("l2")) <= t)
        )
        .select(
            F.least("id1", "id2").alias("a"),
            F.greatest("id1", "id2").alias("b"),
        )
        .distinct()
    )
    cand = cand.unionByName(short_cand)

    da = d_all.select(F.col("id").alias("a"), F.col("txt").alias("ta"))
    db = d_all.select(F.col("id").alias("b"), F.col("txt").alias("tb"))
    return (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("doc_id_a"),
            F.col("b").alias("doc_id_b"),
            F.levenshtein("ta", "tb").cast("int").alias("dist"),
        )
        .where(F.col("dist") <= F.lit(t))
        .orderBy("doc_id_a", "doc_id_b")
    )


def fuzzy_edit_oracle_sql(t: int = EDIT_T, table: str = "documents") -> str:
    """DuckDB twin of fuzzy_edit_pairs — identical segment/probe candidate
    generation (// is DuckDB's floor division, DIV is Spark's), identical
    filters, exact levenshtein verify."""
    k_ = _k(t)
    return f"""
WITH d_all AS (
    SELECT doc_id AS id, text AS txt, length(text) AS l FROM {table}
),
d AS (SELECT * FROM d_all WHERE l > {t}),
segs AS (
    SELECT id AS id1, l AS l1,
           CAST((k * l) // {k_} + 1 AS INT) AS seg_start,
           substr(txt, CAST((k * l) // {k_} + 1 AS INT),
                  CAST(((k + 1) * l) // {k_} - (k * l) // {k_} AS INT)) AS gram
    FROM d, generate_series(0, {t}) AS g(k)
),
probes AS (
    SELECT id AS id2, l AS l2, pos,
           substr(txt, CAST(pos AS INT), CAST(gl AS INT)) AS gram
    FROM d,
         LATERAL (SELECT unnest(generate_series(greatest(1, (l - {t}) // {k_}),
                                                l // {k_} + 1)) AS gl) gls,
         LATERAL (SELECT unnest(generate_series(1, l - gl + 1)) AS pos) ps
    WHERE gl <= l
),
cand AS (
    SELECT DISTINCT least(id1, id2) AS a, greatest(id1, id2) AS b
    FROM segs JOIN probes ON segs.gram = probes.gram
    WHERE l2 BETWEEN l1 AND l1 + {t}
      AND abs(pos - seg_start) <= {t}
      AND id1 <> id2
    UNION
    SELECT DISTINCT least(s.id, n.id) AS a, greatest(s.id, n.id) AS b
    FROM d_all s JOIN d_all n
      ON s.l <= {t} AND n.l <= {2 * t} AND s.id <> n.id
     AND abs(s.l - n.l) <= {t}
)
SELECT a AS doc_id_a, b AS doc_id_b,
       CAST(levenshtein(da.txt, db.txt) AS INT) AS dist
FROM cand JOIN d_all da ON da.id = a JOIN d_all db ON db.id = b
WHERE levenshtein(da.txt, db.txt) <= {t}
ORDER BY doc_id_a, doc_id_b
"""


# --- block-pair SimHash blocking: the measured alternative candidate path ----
# PassJoin's candidate keys are SUBSTRING CONTENT, so their entropy is
# whatever the corpus vocabulary gives: on the driver fixture's 31-word
# vocabulary the sf0.1→sf1 probe crowded to 13.3–17.5× on 10× data
# (BASELINE.md), against ~7× on natural text. This variant swaps the
# candidate generator for one whose key entropy comes from the HASH, not
# the text: a 60-bit character-4-gram SimHash per doc, split into 6
# ten-bit blocks, keyed on all C(6,2)=15 ordered block PAIRS (20-bit
# values). Pigeonhole: sketches within Hamming ≤ 4 differ in ≤ 4 blocks,
# so ≥ 2 blocks agree, so the pair shares ≥ 1 block-pair key — the
# hamming≤4 → candidate guarantee is exact (no bucket cap, the
# simhash_near_dup_pairs precedent). The edit→hamming step is the
# approximate one, recall-measured in tests/test_fuzzy_edit.py (0.97 on
# the sf0.1 fixture, strict subset of the exact tier).
#
# MEASURED OUTCOME (round 8, BASELINE.md): on the adversarial fixture
# this does NOT beat PassJoin — 27.5× vs 17.5× at the sf1 probe.
# Same-vocabulary random texts produce CORRELATED sketches, so 20-bit
# block-pair keys crowd exactly like substring keys do, and the bucket
# pair explode pays the quadratic before the hamming prefilter can
# discard it; meanwhile the true-pair count actually SHRINKS at sf1
# (255→80), proving the exact tier's ratio is candidate-crowding, not
# output growth. Conclusion: PassJoin stays the production tier —
# low-entropy CONTENT defeats any content-derived key, hashed or not.
# Kept as a tested, documented alternative for the regime it measurably
# fits (long documents with small edits — OCR-noise dedup — where the
# per-doc sketch is O(chars) once vs PassJoin's O(3·len) probe rows),
# and as the recorded answer to the round-7 watch item.


def char_simhash_expr(text_col: str, bits: int = 60, n: int = 4) -> F.Column:
    """60-bit SimHash over character n-grams (with multiplicity), one
    map-only aggregate expression per doc — the character-level analogue
    of operators/dedup.simhash_expr (word tokens). Lowercased so case
    drift lands near, like the normalized-dedup tier."""
    if bits % 4 or not 0 < bits <= 60:
        raise ValueError(f"bits must be a multiple of 4 in (0, 60], got {bits}")
    grams = (
        f"transform(sequence(1, greatest(1, length({text_col}) - {n - 1})),"
        f" i -> substring(lower({text_col}), i, {n}))"
    )
    th = (
        f"transform({grams}, t -> CAST(conv(substr(md5(t), 1, {bits // 4}),"
        f" 16, 10) AS BIGINT))"
    )
    # Fused per-gram vote (one zip_with, no per-gram temp array) — same
    # round-13 rewrite as operators/dedup.simhash_expr; bit-identical.
    return F.expr(
        f"aggregate({th}, array_repeat(0L, {bits}),"
        f" (acc, h) -> zip_with(acc, sequence(0, {bits - 1}),"
        "   (a, b) -> a + IF(((h >> b) & 1) = 1, 1L, -1L)),"
        f" acc -> aggregate(zip_with(acc, sequence(0, {bits - 1}),"
        "   (s, b) -> IF(s > 0, shiftleft(1L, b), 0L)), 0L, (a, x) -> a + x))"
    )


def fuzzy_edit_pairs_blocked(
    docs: DataFrame,
    t: int = EDIT_T,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
    n_blocks: int = 6,
    gram_n: int = 4,
    max_hamming: int = 10,
) -> DataFrame:
    """Approximate near-dup pairs (levenshtein <= t) via block-pair
    SimHash candidate generation + exact verify. Returns
    (doc_id_a, doc_id_b, dist) ordered, a subset of fuzzy_edit_pairs'
    rows (verify is exact; only candidate RECALL is approximate).

    The hamming prefilter (``max_hamming``) is the FP throttle: on the
    adversarial 31-word fixture, unrelated docs agree on 20-bit block
    pairs often enough to emit ~210k candidate pairs from 5k docs, but
    their sketch hamming concentrates at 16-19 bits while true edit<=8
    pairs measured <=9 (sf0.1, both distributions) — filtering
    bit_count(sha^shb) <= 10 before the text join kills >95% of FPs at
    integer cost, leaving the levenshtein verify output-bound."""
    if bits % n_blocks:
        raise ValueError(f"bits={bits} not divisible into {n_blocks} blocks")
    block_bits = bits // n_blocks
    block_mask = (1 << block_bits) - 1

    from koby_s_ai_vector_db_spark.functions.partitioning import spread

    d_all = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
    )
    # The sketch fold is the CPU-bound map stage (O(chars × bits) per
    # doc) and runs BEFORE any shuffle — a single-file parquet source
    # would pin it to one task without the spread (the topk_cosine
    # precedent; measured: the unspread sf0.1 warm pass sat >10 min on
    # one core).
    sigs = spread(d_all).select(
        "id", char_simhash_expr("txt", bits=bits, n=gram_n).alias("sh")
    )
    # C(n_blocks, 2) pair keys: key_id = i*n_blocks + j (i < j),
    # key_val = (block_i << block_bits) | block_j — 2*block_bits-entropy
    # values regardless of corpus vocabulary.
    pair_keys = (
        f"flatten(transform(sequence(0, {n_blocks - 2}), i ->"
        f" transform(sequence(i + 1, {n_blocks - 1}), j -> named_struct("
        f"   'key_id', i * {n_blocks} + j,"
        f"   'key_val', (((sh >> (i * {block_bits})) & {block_mask}L)"
        f"     << {block_bits}) | ((sh >> (j * {block_bits})) & {block_mask}L)))))"
    )
    keyed = sigs.select(
        "id", "sh", F.explode(F.expr(pair_keys)).alias("k")
    ).select(
        "id", "sh",
        F.col("k.key_id").alias("key_id"),
        F.col("k.key_val").alias("key_val"),
    )
    # Signatures ride through the buckets (the simhash_near_dup_pairs
    # pattern) so the hamming prefilter needs no re-join.
    buckets = (
        keyed.groupBy("key_id", "key_val")
        .agg(F.sort_array(F.collect_list(F.struct("id", "sh"))).alias("m"))
        .filter(F.size("m") > 1)
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(m) - 1),"
                    " i -> transform(slice(m, i + 1, size(m) - i),"
                    " b -> struct(m[i-1].id AS a, b.id AS b,"
                    " m[i-1].sh AS sha, b.sh AS shb))))"
                )
            ).alias("p")
        )
        .where(
            F.bit_count(F.col("p.sha").bitwiseXOR(F.col("p.shb")))
            <= max_hamming
        )
        .select("p.a", "p.b")
        .distinct()
    )
    # cand is hamming-filtered (bounded by true near-dups + residual
    # FPs), so it broadcasts; BOTH text sides are spread (ADVICE r08):
    # the bounded cand⋈da result is small enough that AQE may broadcast
    # it, which would make db the stream side of the second join — and
    # an unspread single-file db would then run the levenshtein verify
    # in one task. Spreading db keeps the verify distributed whichever
    # side AQE picks.
    da = spread(d_all).select(F.col("id").alias("a"), F.col("txt").alias("ta"))
    db = spread(d_all).select(F.col("id").alias("b"), F.col("txt").alias("tb"))
    return (
        F.broadcast(cand)
        .join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("doc_id_a"),
            F.col("b").alias("doc_id_b"),
            F.levenshtein("ta", "tb").cast("int").alias("dist"),
        )
        .where(F.col("dist") <= F.lit(t))
        .orderBy("doc_id_a", "doc_id_b")
    )
