"""Bloom-filter build + probe as DataFrame operators.

The 100 TB join-pruning primitive: build a compact bit-array membership
filter over a (small) key set — e.g. "customers in the target segment" —
then pre-filter a fact table BEFORE its shuffle/join, so rows that
cannot match never leave the scan stage. Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects this
automatically for some join shapes; this operator is the explicit,
engine-surfaced form (reference parity: the reference's dedup-before-
shuffle lookup family, ``hybridbackend/tensorflow/embedding/sharding.py``
— same motivation, membership pruning ahead of the expensive exchange).

Companion to ``operators/joins.py::bloom_filter_join``, which fuses a
throwaway xxhash64 bitmap (driver-collected, inlined as a literal)
into one join and lets the join resolve false positives. This module
instead makes the filter a FIRST-CLASS ARTIFACT: built distributed
(never driver-collected), addressable as rows, shippable between jobs
(write the word table, probe it elsewhere), and — because positions
come from md5 — bit-replayable in any engine, so both the filter
content and its false-positive rate are auditable under the oracle
gate.

Design for exact cross-engine replay (the repo's oracle discipline):

- Hash family: the k probe positions are 60-bit integers from salted
  md5 (``conv(substr(md5(CONCAT('b<i>|', key)), 1, 15), 16, 10)``),
  reduced mod ``m_bits``. md5 is bit-identical in every engine, so the
  filter CONTENT — not just its decisions — is oracle-checkable.
- Storage: the bit array is ``m_bits / 32`` words — 32 payload bits in
  an int64, ``(word_idx, word)`` rows with
  ``word = bit_or(1 << (pos % 32))`` — so no shift ever touches the
  sign bit in any engine. A tiny aggregate (<= m_bits/32 groups)
  regardless of key count.
- Probe: the filter is collapsed to ONE row holding a
  ``map<int, long>`` (``map_from_entries(collect_list(...))``) and
  cross-joined (broadcast of a single row) onto the fact side; the
  k-position membership test is a pure row-local JVM expression
  (``forall`` over the position array) — NO explode, NO shuffle, no
  Python. At 1000 executors the probe cost is a scan.

False positives are inherent (that is the trade); `bloom_probe` returns
the boolean so callers can audit FP rates against exact membership on
small slices (see the ``bloom_probe_orders`` query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["bloom_build", "bloom_probe"]


def _pos(key: Column, i: int, m_bits: int) -> Column:
    """i-th salted 60-bit md5 probe position in [0, m_bits)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"b{i}|"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h % m_bits


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 8192, k: int = 4
) -> DataFrame:
    """Build a Bloom filter over the distinct values of ``key_col``.

    Returns the packed bit array as ``(word_idx int, word long)`` rows
    (only non-zero words are emitted; 32 payload bits per word). ``m_bits``
    must be a multiple of 32. Size rule of thumb: ~10 bits/key for ~1%
    FP at k=4..7.

    One distinct + one tiny aggregate (<= m_bits/32 groups); the filter
    never holds the keys themselves, so it broadcasts at any key count.
    """
    if m_bits % 32:
        raise ValueError("m_bits must be a multiple of 32")
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[_pos(key, i, m_bits) for i in range(k)])
    ).alias("pos")
    return (
        df.select(key).distinct()
        .select(pos)
        .select(
            (F.col("pos") / 32).cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 32 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_probe(
    facts: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 8192,
    k: int = 4,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Append ``out_col``: true iff ``key_col`` passes the Bloom filter
    (definitely-absent keys get false; present keys always pass).

    The filter rows are aggregated into one ``map<int, long>`` row and
    broadcast; the test is a row-local ``forall`` over the k positions —
    the fact side is neither exploded nor shuffled, so this composes
    with any downstream join as a pre-shuffle prune.
    """
    fmap = bloom.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("_bloom_words")
    )
    key = F.col(key_col)
    positions = F.array(*[_pos(key, i, m_bits) for i in range(k)])
    hit = F.forall(
        positions,
        lambda p: F.getbit(
            F.coalesce(
                F.element_at(
                    F.col("_bloom_words"), (p / 32).cast("int")
                ),
                F.lit(0).cast("long"),
            ),
            (p % 32).cast("int"),
        )
        == 1,
    )
    return (
        facts.crossJoin(F.broadcast(fmap))
        .withColumn(out_col, hit)
        .drop("_bloom_words")
    )
