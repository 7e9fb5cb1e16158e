"""Join operators: sharded lookup (embedding join), pooled lookup,
left join with empty-array default, and as-of / time-window clipping.

The reference's central dataflow is a distributed embedding lookup
(``embedding/sharding.py:168-205``): ids -> modulo partition -> all-to-all
-> ``unique`` dedup -> local gather -> route back. Relationally this is a
shuffle equi-join of a high-duplication fact key stream against a huge
hash-partitioned dimension table, with build-side dedup. Catalyst picks the
join strategy; what it does NOT do automatically is the dedup-before-shuffle
(SURVEY §4.3.1), so ``lookup_join`` exposes it explicitly: distinct keys are
joined first, then results re-expanded to the fact rows — at high key
duplication this shrinks the shuffled probe side by the duplication factor.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "lookup_join",
    "pooled_lookup",
    "left_join_with_default",
    "clip_history",
    "asof_join",
    "interval_join",
    "fuzzy_join",
    "point_in_time_join",
    "incremental_join_delta",
    "bloom_filter_join",
]


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    dedup_keys: bool = True,
    broadcast_threshold_rows: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join a (possibly highly duplicated) key stream against a dimension
    table — the relational form of the sharded embedding lookup.

    ``dedup_keys=True`` reproduces the reference's ``unique``-before-exchange
    (``embedding/sharding.py:186-187``): the dim table is probed once per
    DISTINCT key, then results fan back out by joining to the fact. At 100 TB
    with zipfian ids (the recommender case) this cuts the dim-side shuffle
    traffic by the duplication factor; the fact->distinct map-side combine is
    a partial aggregate, so the extra shuffle moves only unique keys.

    With a small dim table, pass ``broadcast_threshold_rows`` to skip all
    shuffles via a broadcast-hash join (two broadcast probes, zero exchange
    of the fact table).
    """
    if not dedup_keys:
        return fact.join(dim, on=key, how=how)
    uniq = fact.select(key).distinct()
    resolved = uniq.join(dim, on=key, how="inner")
    if broadcast_threshold_rows is not None:
        resolved = F.broadcast(resolved)
    return fact.join(resolved, on=key, how=how)


def pooled_lookup(
    fact: DataFrame,
    dim: DataFrame,
    ids_col: str,
    row_id: str,
    vec_col: str,
    combiner: str = "sum",
    dedup_keys: bool = False,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Pooled sparse lookup (``embedding_lookup_sparse`` with sum/mean
    combiner, reference ``docs/tutorial/ranking/data.py:180-193``): each fact
    row carries an ARRAY of ids; look each up in ``dim`` and pool the
    resulting vectors element-wise per row.

    explode(ids) -> join -> groupBy(row_id) element-wise agg. The
    element-wise vector sum is expressed with ``aggregate`` over collected
    vectors (JVM-side); rows with empty id lists yield an empty array.

    Strategy knobs: ``broadcast_dim=True`` (default) hints a broadcast-hash
    join — right for dims that fit in executor memory; zero shuffle of the
    exploded fact. For a huge sharded dim, set ``broadcast_dim=False`` and
    ``dedup_keys=True`` to reproduce the reference's unique-before-exchange
    (probe the dim once per distinct id, worth it at high duplication).
    """
    if combiner not in ("sum", "mean"):
        raise ValueError("combiner must be 'sum' or 'mean'")
    exploded = fact.select(row_id, F.explode_outer(F.col(ids_col)).alias("_lk_id"))
    dim_keyed = dim.withColumnRenamed(dim.columns[0], "_lk_id")
    if dedup_keys:
        joined = lookup_join(exploded, dim_keyed, "_lk_id", how="left")
    else:
        right = F.broadcast(dim_keyed) if broadcast_dim else dim_keyed
        joined = exploded.join(right, on="_lk_id", how="left")
    pooled = (
        joined.groupBy(row_id)
        .agg(F.collect_list(F.col(vec_col)).alias("_vecs"))
        .withColumn(
            vec_col,
            F.when(F.size("_vecs") == 0, F.array().cast(f"array<double>")).otherwise(
                F.aggregate(
                    F.expr("slice(_vecs, 2, size(_vecs) - 1)"),
                    F.transform(F.element_at("_vecs", 1), lambda x: x.cast("double")),
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b.cast("double")),
                )
            ),
        )
    )
    if combiner == "mean":
        pooled = pooled.withColumn(
            vec_col,
            F.transform(F.col(vec_col), lambda x: x / F.size("_vecs")),
        )
    return pooled.drop("_vecs")


def left_join_with_default(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    defaults: dict[str, Column] | None = None,
) -> DataFrame:
    """Left join that fills unmatched right-side columns with defaults
    (reference history-merge pattern, ``prep_3_merge.py:41-48``: missing
    per-user history -> empty list). ``defaults`` maps column -> default
    expression, e.g. ``{"hist": F.array()}``."""
    out = left.join(right, on=on, how="left")
    for col, default in (defaults or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), default))
    return out


def clip_history(
    ts_list: Column | str,
    val_list: Column | str,
    anchor_ts: Column | str,
    duration: Column | int,
) -> Column:
    """Per-row as-of clip of a (timestamp[], value[]) history pair: keep
    values whose ts lies in ``[anchor - duration, anchor)`` (reference
    time-window clipping, ``prep_3_merge.py:51-68``). Returns the clipped
    value array; apply twice to also clip the ts array. Pure expression —
    no shuffle, no UDF."""
    ts = F.col(ts_list) if isinstance(ts_list, str) else ts_list
    vals = F.col(val_list) if isinstance(val_list, str) else val_list
    anchor = F.col(anchor_ts) if isinstance(anchor_ts, str) else anchor_ts
    dur = F.lit(duration) if isinstance(duration, int) else duration
    zipped = F.zip_with(ts, vals, lambda t, v: F.struct(t.alias("t"), v.alias("v")))
    kept = F.filter(zipped, lambda s: (s["t"] >= anchor - dur) & (s["t"] < anchor))
    return F.transform(kept, lambda s: s["v"])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the single right row with the
    latest ``right_ts <= left_ts`` (backward) or earliest ``>=`` (forward)
    within the same ``on`` key, optionally within ``tolerance`` (same units
    as the ts columns).

    Implemented as union + window sort rather than a range cross-join: tag
    both sides, sort within each key by time, and carry the last-seen right
    row forward with ``last(..., ignorenulls=True)``. One shuffle on the key
    — the same cost as the equi-join Spark would need anyway, and immune to
    the quadratic blowup of a naive range join. Skewed keys are handled by
    AQE; at extreme skew pre-salt the key.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = [c for c in left.columns if c != on]
    rcols = [c for c in right.columns if c != on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {sorted(overlap)}")

    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rcols],
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c) for c in rcols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_t").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    filled = unioned.select(
        on,
        "_t",
        "_is_left",
        *lcols,
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in rcols],
        F.last(F.when(F.col("_is_left") == 0, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias("_rt"),
    ).filter(F.col("_is_left") == 1)

    if tolerance is not None:
        gap = (
            (F.col("_t") - F.col("_rt"))
            if direction == "backward"
            else (F.col("_rt") - F.col("_t"))
        )
        keep = F.col("_rt").isNotNull() & (gap <= tolerance)
        for c in rcols:
            filled = filled.withColumn(c, F.when(keep, F.col(c)))
    return filled.withColumnRenamed("_t", left_ts).drop("_is_left", "_rt")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width_s: int,
    extra_on: Column | None = None,
) -> DataFrame:
    """Point-in-interval range join without a cartesian product.

    Naive ``points JOIN intervals ON start <= ts AND ts < end`` has no
    equi-key, so Spark plans a broadcast-nested-loop / cartesian — a
    scale-killer. This operator manufactures the equi-key: time is cut
    into fixed buckets of ``bucket_width_s`` seconds, each interval is
    exploded to every bucket it overlaps (``(end - start) / width + 1``
    rows, so pick the width near the typical interval length), each point
    belongs to exactly one bucket, and the join becomes a hash equi-join
    on bucket id with the range predicate left as a residual filter. A
    point matching an interval shares at least one bucket with it, and
    since the point has exactly one bucket, no match is duplicated.

    Intervals are half-open ``[start, end)``; timestamps compare at
    microsecond precision. ``extra_on`` adds an extra residual predicate.

    Spark-native alternative to the reference's offline pandas interval
    clip (``docs/tutorial/ranking/taobao/data/prep_3_merge.py:51-68``)
    generalized to two distinct tables.
    """
    w_us = int(bucket_width_s) * 1_000_000

    def _us(col: str) -> str:
        # cast handles TIMESTAMP_NTZ (session-TZ reinterpretation is
        # consistent across both inputs, which is all bucketing needs)
        return f"unix_micros(cast(`{col}` as timestamp))"

    p = points.withColumn("_ij_bucket", F.expr(f"{_us(point_ts)} div {w_us}"))
    # drop empty/inverted intervals BEFORE the explode: F.sequence would
    # otherwise generate a DESCENDING bucket list for them (wasted fan-out;
    # the residual filter already makes them matchless)
    iv = intervals.filter(
        F.col(end_col) > F.col(start_col)
    ).withColumn(
        "_ij_bucket",
        F.explode(
            F.sequence(
                F.expr(f"{_us(start_col)} div {w_us}"),
                F.expr(f"({_us(end_col)} - 1) div {w_us}"),
            )
        ),
    )
    cond = (
        (p["_ij_bucket"] == iv["_ij_bucket"])
        & (p[point_ts] >= iv[start_col])
        & (p[point_ts] < iv[end_col])
    )
    if extra_on is not None:
        cond = cond & extra_on
    return p.join(iv, cond).drop("_ij_bucket")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_distance: int = 1,
    left_id: str | None = None,
    right_id: str | None = None,
) -> DataFrame:
    """Entity-resolution fuzzy join: (left, right) pairs whose string
    keys are within ``max_distance`` Levenshtein edits, without the
    |left| x |right| cross product.

    Blocking is the symmetric-delete (SymSpell) scheme: every string
    generates its deletion neighborhood up to depth ``max_distance``
    (all variants obtained by deleting <= d characters, ~len^d variants
    per row); two strings within edit distance d ALWAYS share a common
    variant, so recall is exact — blocking only prunes, verification is
    the built-in JVM ``levenshtein``. Scale shape: each side explodes to
    (variant-hash, id) keys — shuffle volume ~ rows x (len+1)^d small
    pairs, both sides stream through an equi-join on the variant hash,
    nothing broadcasts, and the final verify touches candidate pairs
    only. For d=1 a 20-char key makes 21 variants; d=2 makes ~210 —
    keep d <= 2 and keys short (names, SKUs, emails), which is what
    entity resolution runs on.

    Returns distinct (left columns kept via ``left_id``, ``right_id``)
    + ``distance``. If id columns are omitted the key columns are
    returned.
    """
    if max_distance not in (1, 2):
        raise ValueError("max_distance must be 1 or 2")
    lid = left_id or left_key
    rid = right_id or right_key

    def delete_variants(col: Column) -> Column:
        # depth-1 deletion neighborhood incl. the string itself
        one = F.concat(
            F.array(col),
            F.transform(
                F.sequence(F.lit(1), F.length(col)),
                lambda i: F.concat(
                    F.substring(col, F.lit(1), i - 1),
                    col.substr(i + 1, F.length(col)),
                ),
            ),
        )
        return F.array_distinct(one)

    def blocked(df: DataFrame, key: str, id_: str, out: str) -> DataFrame:
        v = delete_variants(F.col(key))
        if max_distance == 2:
            v = F.array_distinct(
                F.flatten(F.transform(v, lambda s: delete_variants(s)))
            )
        return df.select(
            F.col(id_).alias(f"_{out}_id"),
            F.col(key).alias(f"_{out}_key"),
            F.explode(v).alias("_var"),
        ).withColumn("_var", F.xxhash64("_var")).distinct()

    lb = blocked(left, left_key, lid, "l")
    rb = blocked(right, right_key, rid, "r")
    cands = (
        lb.join(rb, "_var")
        .select("_l_id", "_l_key", "_r_id", "_r_key")
        .distinct()
    )
    return (
        cands.withColumn(
            "distance", F.levenshtein(F.col("_l_key"), F.col("_r_key"))
        )
        .filter(F.col("distance") <= max_distance)
        .select(
            F.col("_l_id").alias(lid if lid != rid else f"{lid}_left"),
            F.col("_r_id").alias(rid if lid != rid else f"{rid}_right"),
            "distance",
        )
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time-correct join of facts against an SCD2 dimension:
    each fact row picks the dimension version whose
    ``[valid_from, valid_to)`` interval contains its timestamp (open
    ``valid_to`` NULL = current). THE feature-store correctness
    primitive — training examples must see the feature value as of the
    event time, never a later one (leakage).

    Because SCD2 intervals are non-overlapping per key, each fact
    matches at most one version. The join is a plain equi-join on the
    key with the interval test as a residual predicate — it shuffles on
    the same key any enrichment would, no cartesian, no explode;
    exactly the shape Catalyst/AQE handles at fact scale. Facts before
    the first interval get nulls under ``how="left"``.
    """
    cond = (
        (facts[key] == dim[key])
        & (facts[fact_ts] >= dim[valid_from])
        & (dim[valid_to].isNull() | (facts[fact_ts] < dim[valid_to]))
    )
    return facts.join(dim, cond, how).drop(dim[key])


def incremental_join_delta(
    old_left: DataFrame,
    old_right: DataFrame,
    delta_left: DataFrame,
    delta_right: DataFrame,
    cond,
) -> DataFrame:
    """Incremental (delta) maintenance of a join view: given the join's
    previous inputs and the newly-arrived rows on each side, the NEW
    result rows are exactly

        old_left x delta_right  UNION ALL
        delta_left x old_right  UNION ALL
        delta_left x delta_right

    (the algebraic delta rule for inner joins). Appending this delta to
    the previous materialized result reproduces the full recompute —
    hash-proven by the ``incremental_join_state`` oracle. At 100 TB this
    is the difference between joining a day's delta against the
    accumulated table and re-joining months of history on every
    refresh. ``cond`` is a function (l, r) -> join Column, so non-equi
    residuals (time windows) work unchanged.
    """
    parts = []
    for l, r in (
        (old_left, delta_right),
        (delta_left, old_right),
        (delta_left, delta_right),
    ):
        la, ra = l.alias("l"), r.alias("r")
        parts.append(la.join(ra, cond(la, ra)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def bloom_filter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """Semi-join reduction via an expression-level Bloom filter: build a
    bitmap from the dimension's join keys, pre-filter the FACT side
    map-side (no shuffle) before the real join runs.

    Why it matters at 100 TB: when the dimension is selective (post-
    filter) but too large or too late-bound for Catalyst's static
    broadcast decision, the fact table would otherwise shuffle ALL its
    rows into the join. The Bloom pre-filter drops most non-matching
    fact rows at the scan side, so shuffle volume becomes proportional
    to (matching rows + false positives) instead of the full fact.
    False positives are harmless: the real join still runs and keeps
    semantics exact (result is identical to the plain join — oracled).

    Mechanics: k positions per key via ``xxhash64(key, seed)`` mod m;
    the bitmap is built with ONE distinct-positions aggregation on the
    dim side, collected to the driver bounded by ``m_bits/64`` longs
    (8 KiB at the default 2^16 bits — a config constant, NEVER
    data-proportional), and inlined into the fact filter as an array
    literal, i.e. evaluated inside whole-stage codegen with zero
    per-row Python. This is the manual analog of Spark's runtime
    row-level filtering (``spark.sql.optimizer.runtimeFilter.*``),
    exposed as an operator so plans can rely on it deterministically.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError("bloom_filter_join supports inner/left_semi")
    if m_bits <= 0 or m_bits % 64:
        raise ValueError("m_bits must be a positive multiple of 64")
    n_words = m_bits // 64
    seeds = list(range(k_hashes))

    def positions(col: Column) -> list[Column]:
        return [F.pmod(F.xxhash64(col, F.lit(s)), F.lit(m_bits)) for s in seeds]

    pos_rows = (
        dim.select(F.explode(F.array(*positions(F.col(dim_key)))).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * n_words
    for r in pos_rows:
        p = int(r["p"])
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed longs for LongType literals; the
    # m_bits/64-element literal array is rendered as ONE parsed SQL
    # expression (round-12 session 4 — 1024 F.lit().cast() calls were
    # ~2k py4j round trips of pure driver time per call; same pattern
    # as the LSH/IVF literal trees). CAST('<n>' AS BIGINT) rather than
    # a bare <n>L literal: Long.MIN_VALUE cannot be written as a SQL
    # long literal (the minus parses as unary negation of an
    # out-of-range positive).
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bitmap = F.expr(
        "array(" + ", ".join(f"CAST('{w}' AS BIGINT)" for w in signed) + ")"
    )

    fk = F.col(fact_key)
    cond = F.lit(True)
    for pos in positions(fk):
        word = F.element_at(bitmap, (pos / 64).cast("int") + 1)
        cond = cond & (
            F.getbit(word, (pos % 64).cast("int")) == 1
        )
    pruned = fact.filter(fk.isNotNull() & cond)
    if how == "left_semi":
        return pruned.join(
            dim.select(F.col(dim_key).alias(fact_key)).distinct(), fact_key, "left_semi"
        ).select(*fact.columns)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")
