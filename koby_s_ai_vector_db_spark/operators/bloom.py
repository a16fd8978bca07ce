"""Split-block Bloom-filter semi-join reduction.

The 100 TB join problem this solves: a selective filter on one fact table
(e.g. a priority/date slice of ``orders``) leaves a key set that is far too
large to broadcast (tens of millions of keys = GBs as a hash relation), so
the semi-join against the big probe side (``lineitem``) becomes a full
shuffle of the probe table — almost all of which is then discarded. A Bloom
filter compresses the key set into a fixed-size bitmap that IS
broadcastable, so the probe side is pre-filtered map-side (one broadcast
hash join, no shuffle) and only ``|matches| * (1 + fpp)`` rows reach the
exact join. Spark's own runtime row-group/bloom pushdown covers simpler
cases; this operator makes the pattern explicit, tunable, and usable on any
key expression.

Design: the *split-block* (register-blocked) variant used by Parquet's
bloom filters and Impala — hash #0 picks one 64-bit word, hash #1 supplies
``K_BITS`` bit positions inside that word. One aggregate builds the bitmap
(``group by word -> bit_or(mask)``; at most ``n_words`` rows, i.e. KBs–MBs
regardless of key count), and the probe is ONE broadcast join plus a
single mask compare — not K independent lookups as in a classic Bloom.

No false negatives by construction (both sides derive (word, mask) from the
same key expression with the same hashes), so composing the prefilter with
the exact join afterwards preserves semantics exactly — the oracle is the
plain semi-join SQL and the bloom is invisible to it. False positives only
cost shuffle volume; size ``n_words`` so the target-scale key count keeps
the per-word load at a few bits (rule of thumb: ``n_words >= 0.25 * n_keys``
gives <= ~12 occupied bits per 64-bit word with K_BITS=3; fpp ~ (12/64)^3
~ 0.7 %).

The reference never gets here — its only joins are the positional
FAISS-row <-> metadata join and FK lookups (SURVEY §2.7); this is part of
the relational tier the north star adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bit positions drawn per key inside the selected 64-bit word. 3 disjoint
# 6-bit slices of one xxhash64 draw; more bits lower fpp per word but
# saturate small filters faster.
K_BITS = 3


def _block_and_mask(key_sql: str, n_words: int) -> tuple[Column, Column]:
    """(word index, K_BITS-bit mask) for ``key_sql`` in an ``n_words``-word
    split-block Bloom filter. ``key_sql`` is a SQL expression string (a
    column name in practice) so the dynamic shifts can be built with
    ``F.expr`` — ``F.shiftleft`` only takes a literal Python int for the
    shift distance. Pure JVM expressions; stays inside whole-stage codegen
    on both the build and probe sides."""
    block = F.expr(f"cast(pmod(xxhash64({key_sql}), {n_words}) as int)")
    h1 = f"xxhash64({key_sql}, 1)"
    mask = F.expr(
        " | ".join(
            f"shiftleft(1L, cast(shiftright({h1}, {8 * i}) & 63 as int))"
            for i in range(K_BITS)
        )
    )
    return block, mask


def bloom_build(keys: DataFrame, key_sql: str, n_words: int) -> DataFrame:
    """Build the bitmap table ``(bb_block int, bb_bits long)`` from the key
    set. One partial+final aggregate keyed on the word index; the output is
    at most ``n_words`` rows (8 * n_words bytes of payload) no matter how
    many keys went in — that bound is what makes it broadcastable when the
    key set itself is not."""
    block, mask = _block_and_mask(key_sql, n_words)
    return (
        keys.select(block.alias("bb_block"), mask.alias("bb_mask"))
        .groupBy("bb_block")
        .agg(F.expr("bit_or(bb_mask)").alias("bb_bits"))
    )


def bloom_prefilter(
    probe: DataFrame, key_sql: str, bitmap: DataFrame, n_words: int
) -> DataFrame:
    """Drop probe rows whose key is DEFINITELY not in the filtered set:
    one broadcast inner join on the word index (a probe key whose word has
    no set bits cannot match) plus a single mask-subset compare. Map-side
    only — the probe side does not shuffle here. May keep false positives;
    follow with the exact join."""
    block, mask = _block_and_mask(key_sql, n_words)
    clash = {"__bb_block", "__bb_mask", "bb_block", "bb_bits"} & set(
        probe.columns
    )
    if clash:
        # The scratch/bitmap names would be silently shadowed and dropped.
        raise ValueError(f"probe side already has bloom columns: {clash}")
    return (
        probe.withColumn("__bb_block", block)
        .withColumn("__bb_mask", mask)
        .join(F.broadcast(bitmap), F.col("__bb_block") == F.col("bb_block"))
        .filter(
            F.col("bb_bits").bitwiseAND(F.col("__bb_mask"))
            == F.col("__bb_mask")
        )
        .drop("__bb_block", "__bb_mask", "bb_block", "bb_bits")
    )
