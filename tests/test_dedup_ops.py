"""Dedup-operator scale guards: star-contraction CC and the LSH bucket cap.

These pin the two round-3 scale fixes at the OPERATOR level (the oracle
suite already value-checks the registered queries):

  - `near_dup_groups` must be diameter-independent: a planted chain of
    diameter 40 converges where the retired min-label propagation (bounded
    at 10 rounds) silently returned wrong labels;
  - oversized LSH buckets must emit O(N) chain candidates, not the
    O(N²) all-pairs explode (the "viral bucket": N identical boilerplate
    docs share one MinHash signature).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from koby_s_ai_vector_db_spark.operators.dedup import (
    BUCKET_CAP,
    minhash_near_dup_pairs,
    near_dup_groups,
)


def test_star_contraction_handles_long_chains(spark):
    # Two chain components: 0-1-...-40 (diameter 40) and 100-...-125.
    # Label propagation needed `diameter` rounds and was capped at 10;
    # star contraction converges in O(log n) rounds regardless.
    chain = [(i, i + 1) for i in range(40)] + [(100 + i, 101 + i) for i in range(25)]
    pairs = spark.createDataFrame(chain, "doc_id_a bigint, doc_id_b bigint")
    got = {r.doc_id: r.group_id for r in near_dup_groups(pairs).collect()}
    assert len(got) == 67
    for node, group in got.items():
        assert group == (0 if node <= 40 else 100), (node, group)


def test_star_contraction_raises_instead_of_wrong_groups(spark):
    import pytest

    chain = [(i, i + 1) for i in range(64)]
    pairs = spark.createDataFrame(chain, "doc_id_a bigint, doc_id_b bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_groups(pairs, max_iter=1)


def test_viral_bucket_capped_to_linear_candidates(spark):
    # 200 identical docs: one MinHash signature, every band lands in ONE
    # bucket. Uncapped this explodes into 200*199/2 = 19900 candidate
    # pairs; the chain cap emits 199. All 200 stay one connected group.
    n = 200
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate sentence repeated across the corpus").alias("text"),
    )
    pairs = minhash_near_dup_pairs(docs, threshold=0.5)
    rows = pairs.collect()
    assert len(rows) == n - 1  # chain, not all-pairs
    assert all(abs(r.jaccard - 1.0) < 1e-9 for r in rows)
    groups = near_dup_groups(pairs)
    assert groups.filter(F.col("group_id") == 0).count() == n
    assert groups.count() == n


def test_small_buckets_keep_all_pairs_semantics(spark):
    # A bucket at exactly the cap still produces the full pair set.
    n = BUCKET_CAP
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("another boilerplate sentence shared by a smaller cluster").alias("text"),
    )
    pairs = minhash_near_dup_pairs(docs, threshold=0.5)
    assert pairs.count() == n * (n - 1) // 2


def test_simhash60_finds_exact_copy_and_rejects_bad_bits(spark):
    """60-bit sketch: an exact copy is hamming 0; an unrelated doc is not
    paired; bits must divide into (max_hamming + 1) blocks and fit a
    signed BIGINT."""
    import pytest

    from koby_s_ai_vector_db_spark.operators.dedup import (
        simhash_expr,
        simhash_near_dup_pairs,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    other = " ".join(f"zzz{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, other)], "doc_id long, text string"
    )
    pairs = {
        (r.doc_id_a, r.doc_id_b): r.hamming
        for r in simhash_near_dup_pairs(docs, bits=60).collect()
    }
    assert pairs == {(1, 2): 0}
    with pytest.raises(ValueError):
        simhash_expr("text", bits=64)  # > 60: sign-bit overflow risk
    with pytest.raises(ValueError):
        simhash_near_dup_pairs(docs, bits=58)  # no valid block split


def test_simhash_rep_pairs_fallback_scheme_equals_bruteforce(spark):
    """_simhash_rep_pairs uses single-clean-block keying when
    (max_hamming + 2) does not divide bits (e.g. bits=32, max_hamming=3:
    32 % 5 != 0, 32 % 4 == 0) — the fallback must still emit exactly the
    hamming<=max_hamming sketch pairs (sha <= shb, diagonal included).
    The primary pair-of-blocks scheme is covered at bits=60 by
    tests/test_properties.py::test_simhash_blocked_pairs_equal_bruteforce."""
    from koby_s_ai_vector_db_spark.operators.dedup import _simhash_rep_pairs

    shs = [0b1011, 0b1010, 0b1011 | (1 << 20) | (1 << 30), 0, 1 << 31]
    sigs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(shs)], "_id long, sh long"
    )
    expected = sorted(
        (min(a, b), max(a, b), bin(a ^ b).count("1"))
        for i, a in enumerate(shs)
        for b in shs[i:]
        if bin(a ^ b).count("1") <= 3
    )
    got = sorted(
        (r.sha, r.shb, r.hamming)
        for r in _simhash_rep_pairs(sigs, 3, 32).collect()
    )
    assert got == expected


def test_simhash_table_equals_hof_expr(spark):
    """simhash_table (codegen explode+vote-sum form) must produce the
    exact sketch simhash_expr (HOF aggregate form) produces for every
    non-empty doc — the DataFrame form is a pure performance rewrite.
    Empty-token docs: absent from the table, sh=0 under the expr (the
    documented divergence; the registered query and oracle pre-filter)."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.operators.dedup import (
        simhash_expr,
        simhash_table,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "unrelated words entirely different tokens"),
        (4, "ALPHA  Beta\tgamma   delta epsilon"),  # case/ws normalization
        (5, "single"),
        (6, "   "),  # empty after tokenize
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for bits in (32, 60):
        want = {
            r.doc_id: r.sh
            for r in docs.select(
                "doc_id", simhash_expr("text", bits).alias("sh")
            ).collect()
        }
        got = {
            r._id: r.sh
            for r in simhash_table(docs, bits=bits).collect()
        }
        assert set(got) == {1, 2, 3, 4, 5}, got
        for d, sh in got.items():
            assert sh == want[d], (bits, d, sh, want[d])
        assert want[6] == 0  # the documented HOF-form empty-doc value


def test_simhash_viral_group_stays_rep_bounded(spark):
    """A planted 1000-copy group (the viral-bucket hazard) must stay
    collapsed through the blocking stage: the sketch-level candidate
    stage (_simhash_rep_pairs) sees ONE row per distinct sketch, so its
    pair count is bounded by distinct-sketch combinatorics and never by
    group size — no single-task O(N²) array explode. The final output
    still carries the full quadratic pair set (that IS the contract),
    produced by streaming joins."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.operators.dedup import (
        _simhash_rep_pairs,
        simhash_expr,
        simhash_near_dup_pairs,
    )

    n = 1000
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(39)) + " mutated"
    far = " ".join(f"zzz{i}" for i in range(40))
    docs = (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), F.lit(base).alias("text"))
        .unionByName(
            spark.createDataFrame(
                [(n, near), (n + 1, far)], "doc_id long, text string"
            )
        )
    )
    sigs = docs.select(
        F.col("doc_id").alias("_id"), simhash_expr("text", 60).alias("sh")
    )
    # 3 distinct sketches -> at most C(3,2) off-diagonal + 3 diagonal
    # rep pairs ever reach the hamming filter, regardless of the
    # 1000-member group.
    assert _simhash_rep_pairs(sigs, 3, 60).count() <= 6

    pairs = simhash_near_dup_pairs(docs, bits=60)
    intra = n * (n - 1) // 2
    got = pairs.groupBy("hamming").count().collect()
    by_h = {r["hamming"]: r["count"] for r in got}
    assert by_h[0] == intra, by_h
    # the near-copy pairs with every base member iff its sketch is within
    # hamming 3 (sketch determines this uniformly for the whole group)
    assert sum(by_h.values()) in (intra, intra + n), by_h
    assert (n + 1) not in {
        r.doc_id_b for r in pairs.select("doc_id_b").distinct().collect()
    }


class TestTfidfCosine:
    def test_planted_near_dups_found_and_boilerplate_downweighted(self, spark):
        from koby_s_ai_vector_db_spark.operators.corpus import tfidf_cosine_pairs

        boiler = "standard legal disclaimer footer text repeated verbatim"
        rows = [
            # a/b: same distinctive body + shared boilerplate -> high sim
            (1, "alpha beta gamma delta epsilon zeta " + boiler),
            (2, "alpha beta gamma delta epsilon eta " + boiler),
            # c/d: share ONLY the boilerplate -> the overlap must be
            # down-weighted below threshold (idf of corpus-wide shingles
            # is low; with more distinct content dominating the norms)
            (3, "unrelated topic one discussing completely different things entirely " + boiler),
            (4, "another subject matter covering separate concerns altogether now " + boiler),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.doc_id_a, r.doc_id_b): r.sim
            for r in tfidf_cosine_pairs(df, threshold=0.5).collect()
        }
        assert (1, 2) in got and got[(1, 2)] >= 0.5
        assert (3, 4) not in got

    def test_exact_copy_sim_is_one(self, spark):
        from koby_s_ai_vector_db_spark.operators.corpus import tfidf_cosine_pairs

        t = "one two three four five six seven eight"
        df = spark.createDataFrame(
            [(1, t), (2, t), (3, "nine ten eleven twelve thirteen")],
            "doc_id long, text string",
        )
        got = {(r.doc_id_a, r.doc_id_b): r.sim for r in tfidf_cosine_pairs(df).collect()}
        assert got == {(1, 2): 1.0}

    def test_df_cap_drops_viral_shingles(self, spark):
        """A shingle present in EVERY doc of a >cap corpus contributes
        nothing: two docs sharing only that shingle produce no pair."""
        from koby_s_ai_vector_db_spark.operators.corpus import (
            TFIDF_DF_CAP,
            tfidf_cosine_pairs,
        )

        common = "the common header line"
        rows = [(i, f"{common} unique{i} filler{i} word{i}") for i in range(TFIDF_DF_CAP + 20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = tfidf_cosine_pairs(df, threshold=0.1).collect()
        assert got == []

    def test_hash_gram_key_value_equivalent(self, spark):
        """The hashed self-join key variants (round-13 A/B) must return
        bit-identical pairs to the raw-text key on the fixture corpus —
        the hash only changes the EXCHANGE payload; a divergence would
        mean a collision (probability ~G²/2¹²⁹ for hash128) or a plan
        bug. Runs on the sf0.001 documents table so real shingle
        diversity is exercised, not a toy vocabulary."""
        from koby_s_ai_vector_db_spark.operators.corpus import tfidf_cosine_pairs
        from koby_s_ai_vector_db_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
            "doc_id", "text"
        )
        base = sorted(
            map(tuple, tfidf_cosine_pairs(docs, threshold=0.3).collect())
        )
        assert base, "fixture corpus must yield at least one pair"
        for variant in (True, "hash128"):
            got = sorted(
                map(
                    tuple,
                    tfidf_cosine_pairs(
                        docs, threshold=0.3, hash_gram_key=variant
                    ).collect(),
                )
            )
            assert got == base, f"hash_gram_key={variant!r} diverged"


class TestIncrementalDedup:
    def test_verdicts(self, spark):
        from koby_s_ai_vector_db_spark.operators.dedup import (
            incremental_minhash_dedup,
        )

        base_text = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon"
        )
        base = spark.createDataFrame(
            [(1, base_text), (2, "completely different words here now then")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                # near-dup of base 1 (one word changed)
                (100, base_text.replace("theta", "zzzz")),
                # novel
                (101, "unrelated fresh content nothing shared at all whatsoever"),
            ],
            "doc_id long, text string",
        )
        got = {
            r.new_id: (r.verdict, r.base_id)
            for r in incremental_minhash_dedup(base, new, threshold=0.4).collect()
        }
        assert got[100] == ("duplicate", 1)
        assert got[101] == ("novel", -1)

    def test_exact_copy_is_duplicate_with_jaccard_one(self, spark):
        from koby_s_ai_vector_db_spark.operators.dedup import (
            incremental_minhash_dedup,
        )

        t = "one two three four five six seven eight nine ten"
        base = spark.createDataFrame([(7, t)], "doc_id long, text string")
        new = spark.createDataFrame([(70, t)], "doc_id long, text string")
        rows = incremental_minhash_dedup(base, new).collect()
        assert len(rows) == 1
        assert rows[0].verdict == "duplicate"
        assert rows[0].base_id == 7
        assert rows[0].jaccard == 1.0

    def test_new_by_new_pairs_never_compared(self, spark):
        """Two identical NEW docs against a disjoint base must BOTH come
        back novel — the incremental join never pairs new x new."""
        from koby_s_ai_vector_db_spark.operators.dedup import (
            incremental_minhash_dedup,
        )

        base = spark.createDataFrame(
            [(1, "base corpus words entirely distinct from the batch ones")],
            "doc_id long, text string",
        )
        t = "the very same new document text repeated twice in this batch"
        new = spark.createDataFrame(
            [(100, t), (101, t)], "doc_id long, text string"
        )
        got = {r.new_id: r.verdict for r in incremental_minhash_dedup(base, new).collect()}
        assert got == {100: "novel", 101: "novel"}

    def test_second_batch_does_not_reuse_first_batch_memo(self, spark):
        """ADVICE r12 regression: with a memoized base (cache_key set),
        a SECOND batch in the same session must be signed itself — keyed
        by its own new_key — not served the first batch's grams (which
        reported later batches' true duplicates as 'novel')."""
        from koby_s_ai_vector_db_spark.operators.dedup import (
            incremental_minhash_dedup,
        )

        t = "one two three four five six seven eight nine ten"
        base = spark.createDataFrame([(7, t)], "doc_id long, text string")
        ck = ("inc_batch_identity_test", id(base))
        batch1 = spark.createDataFrame(
            [(100, "totally novel words nothing shared with base at all")],
            "doc_id long, text string",
        )
        got1 = {
            r.new_id: r.verdict
            for r in incremental_minhash_dedup(
                base, batch1, cache_key=ck, new_key="b1"
            ).collect()
        }
        assert got1 == {100: "novel"}
        # batch 2 contains an exact copy of base doc 7 — a stale memo of
        # batch 1's grams would call it novel
        batch2 = spark.createDataFrame([(200, t)], "doc_id long, text string")
        got2 = {
            r.new_id: (r.verdict, r.base_id)
            for r in incremental_minhash_dedup(
                base, batch2, cache_key=ck, new_key="b2"
            ).collect()
        }
        assert got2 == {200: ("duplicate", 7)}

    def test_cache_key_without_new_key_is_loud(self, spark):
        import pytest as _pytest

        from koby_s_ai_vector_db_spark.operators.dedup import (
            incremental_minhash_dedup,
        )

        base = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        new = spark.createDataFrame([(2, "a b c")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="new_key"):
            incremental_minhash_dedup(base, new, cache_key="k_only")
